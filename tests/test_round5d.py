"""Round-5 session-4 operator tests: soundex parity stress, DBSCAN grid
losslessness, UPDATE CDC invariants, Holt recurrence edge cases,
perceptron first-round identity, and plan-shape asserts for the new
queries."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.queries.text_q import (
    _SDX_MAP,
    _sql_collapse_runs,
)

SF = "/root/testdata/sf0.001"


# -- soundex: built-in vs the oracle's SQL reimplementation ----------------
# The registered query only sees the corpus vocabulary (~50 easy words);
# this stress list hits the hard rule interactions: H/W transparency
# between same-code consonants (Ashcraft → A261, NOT A226), vowel
# separators re-enabling codes (Tymczak → T522), doubled letters,
# leading H/W, and all-vowel tails.

_HARD_WORDS = [
    "robert", "rupert", "ashcraft", "ashcroft", "tymczak", "pfister",
    "honeyman", "jackson", "washington", "lee", "gutierrez", "wheaton",
    "aaa", "hhh", "who", "whale", "czarkowska", "schmidt", "knuth",
    "lloyd", "pneuma", "mcdonald", "oooping", "bbb", "herman",
]


def _duck_soundex(words: list[str]) -> dict[str, str]:
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    sql = f"""
WITH words AS (SELECT w FROM (VALUES {vals}) t(w)),
coded AS (
  SELECT w, translate(upper(w), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                      '{_SDX_MAP}') AS codes
  FROM words),
collapsed AS (
  SELECT w, {_sql_collapse_runs("replace(codes, '7', '')")} AS coll,
         substr(translate(upper(w), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                          '{_SDX_MAP}'), 1, 1) AS first_code
  FROM coded),
digits AS (
  SELECT w, replace(CASE WHEN first_code = '7' THEN coll
                         ELSE substr(coll, 2) END, '0', '') AS ds
  FROM collapsed)
SELECT w, upper(substr(w, 1, 1)) || substr(ds || '000', 1, 3) FROM digits
"""
    return dict(con.sql(sql).fetchall())


def test_soundex_oracle_parity_hard_words(spark):
    df = spark.createDataFrame([(w,) for w in _HARD_WORDS], ["w"])
    got = {
        r["w"]: r["code"]
        for r in df.select("w", F.soundex("w").alias("code")).collect()
    }
    want = _duck_soundex(_HARD_WORDS)
    assert got == want
    # Spot-pin the two classic rule-interaction cases so a regression in
    # EITHER implementation (not just a joint drift) fails loudly.
    assert got["ashcraft"] == "A261"  # H transparent between S and C
    assert got["tymczak"] == "T522"  # vowel separator re-enables code


# -- DBSCAN: the grid candidate join must be lossless ----------------------


def test_dbscan_grid_is_lossless(spark):
    rng = np.random.default_rng(7)
    pts = [
        (int(i), int(x), int(y))
        for i, (x, y) in enumerate(
            rng.integers(-500, 500, size=(300, 2)).tolist()
        )
    ]
    eps = 60
    df = spark.createDataFrame(pts, ["id", "x", "y"])
    cell = lambda c: F.floor(c / F.lit(eps)).cast("long")  # noqa: E731
    build = df.select(
        F.col("id").alias("ib"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cell(F.col("x")).alias("cx"),
        cell(F.col("y")).alias("cy"),
    )
    probe = (
        df.select(
            F.col("id").alias("ia"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dx"),
            cell(F.col("x")).alias("pcx"),
            cell(F.col("y")).alias("pcy"),
        )
        .select(
            "ia", "xa", "ya",
            (F.col("pcx") + F.col("dx")).alias("cx"),
            F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dy"),
            "pcy",
        )
        .select(
            "ia", "xa", "ya", "cx", (F.col("pcy") + F.col("dy")).alias("cy")
        )
    )
    dx, dy = F.col("xa") - F.col("xb"), F.col("ya") - F.col("yb")
    grid_pairs = {
        (r["ia"], r["ib"])
        for r in probe.join(build, ["cx", "cy"])
        .filter(dx * dx + dy * dy <= eps * eps)
        .select("ia", "ib")
        .collect()
    }
    brute = {
        (i, j)
        for i, xi, yi in pts
        for j, xj, yj in pts
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= eps * eps
    }
    assert grid_pairs == brute


# -- UPDATE: pruning + CDC image identities --------------------------------


def test_update_where_prunes_and_feeds(spark, tmp_path):
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(str(tmp_path / "t"))
    df = spark.range(100).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 10).cast("bigint").alias("bucket"),
        (F.col("id") * 2).cast("bigint").alias("v"),
    )
    # partition by bucket → 10 files; predicate hits only bucket 3
    v0 = t.append(df.repartition(10, "bucket"))
    m0 = t._read_manifest(v0)
    v1 = t.update_where(
        spark, F.col("bucket") == 3, {"v": F.col("v") + 1000}
    )
    m1 = t._read_manifest(v1)
    carried = set(m0["files"]) & set(m1["files"])
    # all bucket-3 rows hash to ONE partition file → exactly one file is
    # rewritten; every other (non-empty) file carries by name
    assert len(set(m0["files"]) - carried) == 1, (m0["files"], m1["files"])
    # table state: exactly bucket-3 rows mutated
    out = {r["k"]: r["v"] for r in t.read(spark).collect()}
    for k in range(100):
        want = k * 2 + (1000 if k % 10 == 3 else 0)
        assert out[k] == want
    # CDC: post − pre = 1000 · n_updated, and both images align per key
    feed = t.read_changes(
        spark, since_version=v0, to_version=v1, include_preimages=True
    )
    rows = feed.collect()
    pre = {r["k"]: r["v"] for r in rows if r["_change_type"] == "update_preimage"}
    post = {
        r["k"]: r["v"] for r in rows if r["_change_type"] == "update_postimage"
    }
    assert set(pre) == set(post) == {k for k in range(100) if k % 10 == 3}
    assert all(post[k] - pre[k] == 1000 for k in pre)


# -- Holt recurrence: truncating halving on negative trends ----------------


def test_holt_truncating_halving_matches_duckdb():
    series = [100, 0, 0, 0, 50, -30]
    # Python replay (the applyInPandas kernel's arithmetic)
    half = lambda x: abs(x) // 2 * (1 if x >= 0 else -1)  # noqa: E731
    l, b = series[0], 0
    py = [(l, b)]
    for y in series[1:]:
        l_new = half(y + l + b)
        b = half(b + l_new - l)
        l = l_new
        py.append((l, b))
    con = duckdb.connect()
    vals = ", ".join(f"({i + 1}, {y})" for i, y in enumerate(series))
    got = con.sql(
        f"""
WITH RECURSIVE r(rn, y) AS (SELECT * FROM (VALUES {vals}) t(rn, y)),
h(rn, l, b) AS (
  SELECT 1, y, CAST(0 AS BIGINT) FROM r WHERE rn = 1
  UNION ALL
  SELECT r.rn, (r.y + h.l + h.b) // 2,
         (h.b + ((r.y + h.l + h.b) // 2) - h.l) // 2
  FROM h JOIN r ON r.rn = h.rn + 1)
SELECT l, b FROM h ORDER BY rn
"""
    ).fetchall()
    assert [(int(a), int(c)) for a, c in got] == py
    assert any(b < 0 for _, b in py), "fixture must exercise negative trend"


# -- perceptron: first round touches every point ---------------------------


def test_perceptron_round1_is_full_sum(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_perceptron

    out = {r["round"]: r for r in q_ml_perceptron(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pts = emb.select(
        F.round(F.element_at("embedding", 2).cast("double") * 1000)
        .cast("bigint")
        .alias("x1"),
        (2 * (F.col("label") % 2) - 1).cast("bigint").alias("y"),
    ).agg(
        F.count("*").alias("n"), F.sum(F.col("y") * F.col("x1")).alias("s1")
    ).collect()[0]
    # w=0 → margin 0 for every point → all misclassified in round 1
    assert out[1]["n_miscl"] == pts["n"]
    assert out[1]["w1"] == pts["s1"]


# -- plan shapes -----------------------------------------------------------


def test_bm25_topk_is_take_ordered(spark):
    from mini_etl_project_spark.queries.text_q import q_text_bm25

    plan = q_text_bm25(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_corr_matrix_single_aggregation(spark):
    from mini_etl_project_spark.queries.sampling_q import q_agg_corr_matrix

    plan = (
        q_agg_corr_matrix(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scan, one partial+final agg pair — no join, no extra exchange
    assert plan.count("Scan parquet") == 1, plan[:800]
    assert "Join" not in plan, plan[:800]


def test_point_in_polygon_broadcasts_edges(spark):
    from mini_etl_project_spark.queries.joins import q_join_point_in_polygon

    plan = (
        q_join_point_in_polygon(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_naive_bayes_broadcasts_count_tables(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_naive_bayes

    plan = (
        q_ml_naive_bayes(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan[:1200]


# -- shallow clone + restore -----------------------------------------------


def test_clone_shallow_zero_copy_divergence(spark, tmp_path):
    import os

    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    src = SnapshotTable.create(str(tmp_path / "src"))
    df = spark.range(50).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") * 3).cast("bigint").alias("v"),
    )
    src.append(df)
    clone = src.clone_shallow(str(tmp_path / "clone"))
    # zero copy: clone's data dir holds no files yet
    assert os.listdir(clone.data_dir) == []
    assert clone.read(spark).count() == 50
    # divergence: clone append is invisible to source and vice versa
    clone.append(
        spark.range(5).select(
            (F.col("id") + 1000).cast("bigint").alias("k"),
            F.lit(0).cast("bigint").alias("v"),
        )
    )
    src.append(
        spark.range(7).select(
            (F.col("id") + 2000).cast("bigint").alias("k"),
            F.lit(1).cast("bigint").alias("v"),
        )
    )
    assert clone.read(spark).count() == 55
    assert src.read(spark).count() == 57
    # clone vacuum never touches shared source files
    clone.vacuum(keep_last=1)
    assert src.read(spark, 1).count() == 50


def test_restore_is_forward_rollback(spark, tmp_path):
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(str(tmp_path / "t"))
    base = spark.range(20).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") * 2).cast("bigint").alias("v"),
    )
    v1 = t.append(base)
    t.delete_where(spark, F.col("k") % 2 == 0)
    assert t.read(spark).count() == 10
    v3 = t.restore(v1)
    assert v3 == 3  # history preserved, not rewritten
    assert t.read(spark).count() == 20
    assert t.read(spark, 2).count() == 10  # pre-restore still travelable
    # restore surfaces in the feed as an overwrite
    feed = t.read_changes(spark, since_version=2, to_version=v3)
    assert feed.filter(F.col("_change_type") == "overwrite").count() == 20
