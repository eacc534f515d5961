"""Round-6 fixes: bloom-index portability guards, skipping-metadata
carry-forward on every commit, and the longest-path convergence guard
(ADVICE r5 items 1-4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.sources.snapshots import SnapshotTable


def _bloom_table(spark, root):
    t = SnapshotTable.create(str(root))
    df = spark.range(800).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 8).cast("int").alias("shard"),
        (F.col("id") * 7).cast("bigint").alias("v"),
    )
    t.append(df.repartitionByRange(8, "shard"), bloom_cols=["k"], n_files=8)
    return t


def _absent_prune_count(t) -> int:
    """Files surviving bloom pruning for 20 definitely-absent keys."""
    return sum(
        len(t.plan_files(bloom_eq=("k", k))) for k in range(900000, 900020)
    )


def test_bloom_index_survives_append_without_bloom_cols(spark, tmp_path):
    """A commit that doesn't pass bloom_cols must CARRY the previous
    manifest's bloom entries — the old files' filters stay valid (files
    are immutable), so pruning must keep working on them."""
    t = _bloom_table(spark, tmp_path / "bt")
    before = _absent_prune_count(t)
    assert before <= 40  # index works: near-total pruning of absent keys
    t.append(
        spark.range(5).select(
            (F.col("id") + 5000).cast("bigint").alias("k"),
            F.lit(9).cast("int").alias("shard"),
            F.lit(0).cast("bigint").alias("v"),
        )
    )  # no bloom_cols
    after = _absent_prune_count(t)
    # only the new (unindexed) files are added per lookup; the 8 old
    # files still prune
    n_new = len(t.plan_files()) - 8
    assert n_new >= 1
    assert after == before + 20 * n_new
    # and lookups of present keys still find their rows
    assert t.read(spark, bloom_eq=("k", 137)).filter(F.col("k") == 137).count() == 1


def test_bloom_index_survives_delete_restore_and_clone(spark, tmp_path):
    t = _bloom_table(spark, tmp_path / "bt")
    base_count = _absent_prune_count(t)
    v_indexed = t.latest_version()
    # delete touches one file; the other 7 carry their blooms by name
    t.delete_where(spark, F.col("k") == 137)
    m = t._read_manifest(t.latest_version())
    assert len(m.get("blooms", {})) == 7, "untouched files keep bloom entries"
    assert _absent_prune_count(t) <= base_count + 2 * 20  # ≤2 rewritten files unindexed
    # restore back to the indexed version: blooms pinned from the target
    t.restore(v_indexed)
    assert _absent_prune_count(t) == base_count
    # shallow clone carries the index (abs-path keys)
    c = t.clone_shallow(str(tmp_path / "clone"))
    assert len(c._read_manifest(1).get("blooms", {})) == 8
    assert _absent_prune_count(c) == base_count


def test_bloom_cols_reject_nonportable_types(spark, tmp_path):
    """Doubles/booleans/timestamps render differently in Spark's
    CAST-to-string vs the driver-side lookup hash → must be rejected at
    index time, not silently mis-pruned at read time."""
    t = SnapshotTable.create(str(tmp_path / "bad"))
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 1e10).alias("x")
    )
    with pytest.raises(TypeError, match="string or integral"):
        t.append(df, bloom_cols=["x"])


def test_bloom_eq_null_and_bool_lookups(spark, tmp_path):
    t = _bloom_table(spark, tmp_path / "bt")
    # NULLs are never indexed → a NULL lookup cannot prune anything
    assert len(t.plan_files(bloom_eq=("k", None))) == 8
    with pytest.raises(TypeError, match="str/int"):
        t.plan_files(bloom_eq=("k", True))
    with pytest.raises(TypeError, match="str/int"):
        t.plan_files(bloom_eq=("k", 1.5))


def test_bloom_cols_skip_missing_columns_on_schema_evolution(spark, tmp_path):
    """append(merge_schema=True, bloom_cols=[...]) with the bloom column
    absent from the appended frame skips it (files stay conservatively
    unindexed) instead of raising — mirroring _collect_stats."""
    t = _bloom_table(spark, tmp_path / "bt")
    t.append(
        spark.range(3).select(
            (F.col("id") + 9000).cast("bigint").alias("k"),
            F.lit(9).cast("int").alias("shard"),
            F.lit(0).cast("bigint").alias("v"),
            F.lit("n").alias("note"),
        ),
        merge_schema=True,
        bloom_cols=["k", "note", "missing_entirely"],
    )
    # the new (non-empty) files are indexed on k and note; the absent
    # column is skipped everywhere instead of raising
    m = t._read_manifest(t.latest_version())
    new_entries = [b for b in m["blooms"].values() if "note" in b]
    assert len(new_entries) >= 1
    assert all("missing_entirely" not in b for b in m["blooms"].values())
    assert t.read(spark, bloom_eq=("k", 9001)).filter(F.col("k") == 9001).count() == 1


def test_compact_reindexes_packed_files(spark, tmp_path):
    """Compaction recovers the bloom columns from the rewritten files'
    previous entries, so the index never narrows across an OPTIMIZE."""
    t = _bloom_table(spark, tmp_path / "bt")
    base_count = _absent_prune_count(t)
    v = t.compact(spark, target_bytes=1 << 30)  # everything is "small"
    assert v > 1
    m = t._read_manifest(v)
    files = m["files"]
    assert len(files) < 8  # actually packed
    assert set(m["blooms"]) == set(files), "packed files re-indexed"
    # packed files hold more keys so their filters are denser (higher FP),
    # but the index still exists and never loses a present key
    assert _absent_prune_count(t) <= 20 * len(files)
    assert base_count <= 20 * 8
    assert t.read(spark, bloom_eq=("k", 137)).filter(F.col("k") == 137).count() == 1


def test_stats_survive_append_without_stats_cols(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "st"))
    df = spark.range(100).select(F.col("id").alias("k"))
    t.append(df.repartitionByRange(4, "k"), stats_cols=["k"], n_files=4)
    pruned_before = len(t.plan_files(where=("k", 0, 10)))
    assert pruned_before < 4
    t.append(spark.range(5).select((F.col("id") + 1000).alias("k")))
    # old files keep min/max pruning; only the new stat-less files add on
    n_new = len(t.plan_files()) - 4
    assert len(t.plan_files(where=("k", 0, 10))) == pruned_before + n_new


def test_longest_path_layers_raises_on_cycle(spark):
    from mini_etl_project_spark.operators.graph import longest_path_layers

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "u bigint, v bigint"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node bigint")
    with pytest.raises(ValueError, match="did not converge"):
        longest_path_layers(edges, nodes, max_rounds=10)


def test_registry_counts_match_docs():
    """Doc-drift guard (VERDICT r5 #6): the README's declared query and
    oracle counts must equal the live registry's."""
    import os
    import re as _re

    from mini_etl_project_spark.queries import ORACLES, QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(root, "README.md")).read()
    m = _re.search(r"declares (\d+) queries; (\d+) carry DuckDB", readme)
    assert m, "README must state the query/oracle counts"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == len(ORACLES)


def test_rotation_puts_unsampled_queries_first():
    """The registry's iteration order front-loads queries without driver
    evidence (plus this round's _RECHECK), so the driver's ~50/round
    sample always lands on never-proven entries first."""
    import glob
    import json
    import os

    from mini_etl_project_spark.queries import QUERIES
    from mini_etl_project_spark.queries import _RECHECK

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        sampled |= set(json.load(open(f)))
    if not sampled:
        return  # fresh checkout without driver artifacts
    names = list(QUERIES)
    # front = _RECHECK then never-sampled; a recheck entry that is ALSO
    # never-sampled must not be double-counted
    n_front = len([n for n in _RECHECK if n in names]) + sum(
        1 for n in names if n not in sampled and n not in _RECHECK
    )
    for n in names[:n_front]:
        assert n in _RECHECK or n not in sampled, (
            f"{n} has driver evidence but sits in the never-sampled front"
        )
    for n in names[n_front:]:
        assert n in sampled, f"{n} lacks driver evidence but sits in the tail"
