"""Session-3 additions: snapshot DELETE pruning, CIDR join shape,
KS prefix-sum structure, link-prediction invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_snapshot_table_delete_rewrites_only_touched_files(spark, tmp_path):
    """delete_where(): files without a matching row are carried into the
    new manifest BY NAME; the change feed serves the deleted rows as
    'delete' events; time travel still sees the pre-delete state."""
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(str(tmp_path / "d_tbl"))
    base = (
        spark.range(0, 100)
        .withColumn("v", (F.col("id") % 10).cast("int"))
        .repartition(10, "id")
    )
    t.append(base)
    files_v1 = set(t._read_manifest(1)["files"])
    assert len(files_v1) == 10

    # Delete exactly one row: only its file may be rewritten.
    t.delete_where(spark, F.col("id") == 3)

    ids = {r["id"] for r in t.read(spark).collect()}
    assert len(ids) == 99 and 3 not in ids

    files_v2 = set(t._read_manifest(2)["files"])
    assert len(files_v1 & files_v2) == 9  # 9 files untouched

    changes = t.read_changes(spark, since_version=1, to_version=2).collect()
    assert [(r["id"], r["_change_type"]) for r in changes] == [(3, "delete")]

    # Time travel: pre-delete version intact.
    assert len(t.read(spark, version=1).collect()) == 100


def test_delete_where_no_match_is_metadata_only(spark, tmp_path):
    """A predicate matching nothing must not rewrite any data file."""
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(str(tmp_path / "d0_tbl"))
    t.append(spark.range(0, 50).withColumn("v", F.lit(1)).repartition(5))
    files_v1 = set(t._read_manifest(1)["files"])
    t.delete_where(spark, F.col("id") > 10_000)
    assert set(t._read_manifest(2)["files"]) == files_v1


def test_cidr_join_is_broadcast_not_cartesian(spark, sf_dir):
    """The longest-prefix CIDR match must plan as a broadcast hash join
    on the first-octet equi key — never BroadcastNestedLoop/cartesian."""
    from mini_etl_project_spark.queries import QUERIES

    plan = QUERIES["q_join_cidr"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_ks_two_level_prefix_no_global_sort_over_values(spark, sf_dir):
    """q_ml_ks_test's cumulative counts must come from the keyed
    within-bucket window — the only unpartitioned window may sit on the
    bounded bucket table (one partition of ~60 rows, not the full
    distinct-value set)."""
    from mini_etl_project_spark.queries import QUERIES

    df = QUERIES["q_ml_ks_test"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The full-data cumsum window must carry the bucket partition spec:
    # "Window [...], [b#N], [v#M ASC ...]" (3 bracket groups). The
    # bucket-offset window (2 groups, no partition spec) is fine — it
    # runs on the bounded per-bucket aggregate only.
    import re

    windows = re.findall(r"Window \[[^\n]*", plan)
    assert len(windows) == 2
    keyed = [w for w in windows if re.search(r"\], \[b#\d+L\], \[v#", w)]
    assert len(keyed) == 1, f"expected keyed cumsum window, got: {windows}"
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    # D numerator bounded by n1*n2 and ppm in [0, 1e6].
    assert 0 <= r["d_num"] <= r["n1"] * r["n2"]
    assert 0 <= r["d_ppm"] <= 1_000_000


def test_link_prediction_invariants(spark, sf_dir):
    """Scores only for non-adjacent pairs; Jaccard within [0, 1e6];
    common-neighbor count positive; symmetric pair key (u < v)."""
    from mini_etl_project_spark.queries import QUERIES

    rows = QUERIES["q_graph_link_predict"](spark, sf_dir).collect()
    assert rows, "sparsified trade graph should leave open pairs"
    for r in rows:
        assert r["u"] < r["v"]
        assert r["cn"] >= 1
        assert 0 <= r["jaccard_ppm"] <= 1_000_000


def test_item_cf_topk_is_keyed_and_bounded(spark, sf_dir):
    """Top-3 per item, rank dense from 1, scores within ppm bounds."""
    from collections import defaultdict

    from mini_etl_project_spark.queries import QUERIES

    rows = QUERIES["q_ml_item_cf"](spark, sf_dir).collect()
    per_item = defaultdict(list)
    for r in rows:
        per_item[r["item"]].append(r)
        assert 0 <= r["cos2_ppm"] <= 1_000_000
    for item, rs in per_item.items():
        rks = sorted(x["rk"] for x in rs)
        assert rks == list(range(1, len(rks) + 1))
        assert len(rs) <= 3
