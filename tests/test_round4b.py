"""Round-4 session-2 operators: prefix-filtered set-similarity join
(losslessness + pruning), time-series rollups (OHLC tie-break pinning,
interval coverage on known geometry, TWA hand-integration, streaks).

The DuckDB oracle proves engine parity; these tests pin the *semantics*
against hand-computed answers on tiny inputs, and the pruning claims the
docstrings make (prefix join must touch fewer rows than brute force).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.operators.dedup import (
    jaccard_pairs,
    prefix_filter_pairs,
    shingle_rows,
)


# -- prefix filtering ------------------------------------------------------


def test_prefix_filter_lossless_and_pruning(spark, sf_dir):
    """Candidates from the prefix join must (a) contain every true pair at
    the threshold (lossless) and (b) be generated from strictly fewer join
    rows than the raw shingle self-join would use (pruning)."""
    from mini_etl_project_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    corpus = d.select(F.col("doc_id").alias("id"), "text").unionByName(
        d.select(
            (F.col("doc_id") + 5000).alias("id"),
            F.substring("text", 15, 1 << 30).alias("text"),
        )
    )
    sh = shingle_rows(corpus, "id", "text", k=5)
    t = 0.5
    truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(sh, candidates=None, threshold=t).collect()
    }
    cand = prefix_filter_pairs(sh, threshold=t)
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert truth <= cand_set, "prefix filter dropped a true pair"
    verified = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(sh, candidates=cand, threshold=t).collect()
    }
    assert verified == truth

    # Pruning: the prefix projection must keep < 70% of shingle rows at
    # t=0.5 (theory: ~(1-t) plus the +1 per doc).
    n_sh = sh.count()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    doc_freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    n_prefix = (
        sh.join(doc_freq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, "id")
        .filter(F.col("pos") <= F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1)
        .count()
    )
    assert n_prefix < 0.7 * n_sh, (n_prefix, n_sh)


# -- hand-computed time-series fixtures ------------------------------------


@pytest.fixture()
def tiny_events(spark):
    # (event_id, ts, user_id, value): crafted so every operator has a
    # hand-checkable answer. user 1: overlapping + disjoint intervals;
    # user 2: a tie on ts resolved by event_id.
    rows = [
        (1, "2024-01-01 00:00:00", 1, 10.0),  # [0, 600s]
        (2, "2024-01-01 00:05:00", 1, 10.0),  # [300, 900] overlaps 1
        (3, "2024-01-01 01:00:00", 1, 1.0),  # [3600, 3660] island 2
        (4, "2024-01-01 00:00:00", 2, 4.0),  # tie on ts with id 5
        (5, "2024-01-01 00:00:00", 2, 8.0),
        (6, "2024-01-01 00:10:00", 2, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    )
    return df.select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id",
        "value", F.lit("x").alias("event_type"),
    )


def _run_on(df, fn, spark, monkeypatch):
    import mini_etl_project_spark.queries.timeseries_q as tsq

    monkeypatch.setattr(tsq, "load_table", lambda s, d, t: df)
    return fn(spark, "unused")


def test_interval_coverage_hand_checked(spark, tiny_events, monkeypatch):
    from mini_etl_project_spark.queries.timeseries_q import (
        q_ts_interval_coverage,
    )

    out = {
        r["user_id"]: (r["n_intervals"], r["n_islands"], r["covered_us"])
        for r in _run_on(tiny_events, q_ts_interval_coverage, spark, monkeypatch).collect()
    }
    # user 1: [0,600]+[300,900] merge -> 900s; [3600,3660] -> 60s
    assert out[1] == (3, 2, 960 * 1_000_000)
    # user 2: [0,240]+[0,480] merge -> 480s; [600,720] -> 120s
    assert out[2] == (3, 2, 600 * 1_000_000)


def test_twa_hand_checked(spark, tiny_events, monkeypatch):
    from mini_etl_project_spark.queries.timeseries_q import q_ts_twa

    out = {
        r["user_id"]: r for r in _run_on(tiny_events, q_ts_twa, spark, monkeypatch).collect()
    }
    # user 1: 10 for 300s, 10 for 3300s, last value excluded; span 3600s
    assert out[1]["twa"] == pytest.approx((10 * 300 + 10 * 3300) / 3600)
    # user 2: ties ordered by event_id -> 4 holds 0s, 8 holds 600s
    assert out[2]["twa"] == pytest.approx(8.0)
    assert out[2]["span_us"] == 600 * 1_000_000


def test_ohlc_tiebreak_pinned(spark, tiny_events, monkeypatch):
    from mini_etl_project_spark.queries.timeseries_q import q_ts_ohlc

    rows = _run_on(tiny_events, q_ts_ohlc, spark, monkeypatch).collect()
    by_bucket = {(r["event_type"], str(r["bucket"])): r for r in rows}
    r = by_bucket[("x", "2024-01-01 00:00:00")]
    # open: ts tie at 00:00 between ids 1/4/5 -> smallest event_id (1)
    assert r["open"] == 10.0 and r["close"] == 2.0
    assert r["high"] == 10.0 and r["low"] == 2.0 and r["n_events"] == 5


def test_streak_hand_checked(spark, monkeypatch):
    import mini_etl_project_spark.queries.timeseries_q as tsq
    from mini_etl_project_spark.queries.timeseries_q import q_ts_streak

    rows = [
        (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
        (1, "2024-01-10"),
        (2, "2024-02-01"), (2, "2024-02-01"),  # dup day counts once
    ]
    df = spark.createDataFrame(rows, "o_custkey long, d string").select(
        "o_custkey", F.col("d").cast("timestamp").alias("o_orderdate")
    )
    monkeypatch.setattr(tsq, "load_table", lambda s, dd, t: df)
    out = {
        r["o_custkey"]: (r["n_days"], r["longest_streak"])
        for r in q_ts_streak(spark, "unused").collect()
    }
    assert out[1] == (4, 3)
    assert out[2] == (1, 1)


# -- fixed-point k-means ---------------------------------------------------


def test_kmeans_invariants(spark, sf_dir):
    """Partitions the corpus, inertia decreases across iterations, and the
    result is invariant to input repartitioning (the fixed-point design's
    whole purpose)."""
    from mini_etl_project_spark.operators.kmeans import lloyd_fixed_point
    from mini_etl_project_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_total = emb.count()

    a1, _ = lloyd_fixed_point(emb, "vec_id", "embedding", k=4, iters=1)
    a2, _ = lloyd_fixed_point(emb, "vec_id", "embedding", k=4, iters=2)
    i1 = a1.agg(F.sum("dist")).collect()[0][0]
    i2 = a2.agg(F.sum("dist")).collect()[0][0]
    assert a2.count() == n_total
    assert i2 <= i1, (i1, i2)

    a2r, _ = lloyd_fixed_point(
        emb.repartition(7), "vec_id", "embedding", k=4, iters=2
    )
    got = {(r["id"], r["cid"], r["dist"]) for r in a2.collect()}
    got_r = {(r["id"], r["cid"], r["dist"]) for r in a2r.collect()}
    assert got == got_r, "assignment depends on partitioning"


# -- plan posture of the session's new operators ---------------------------


def _plan(spark, name, sf="/root/testdata/sf0.001"):
    from mini_etl_project_spark.queries import QUERIES

    return QUERIES[name](spark, sf)._jdf.queryExecution().executedPlan().toString()


def test_timeseries_ops_single_shuffle(spark):
    """OHLC / anomaly / TWA / interval coverage each claim ONE keyed
    shuffle: the windows and the final aggregate reuse the same hash
    partitioning, so exactly one Exchange may appear in the plan."""
    for name in ("q_ts_ohlc", "q_ts_anomaly", "q_ts_twa", "q_ts_interval_coverage"):
        n = _plan(spark, name).count("Exchange")
        assert n == 1, f"{name}: {n} exchanges"


def test_broadcast_posture_of_new_ops(spark):
    """Tiny sides must broadcast: transition-matrix denominators, target-
    encoding category totals, bloom position sets, k-means centroids."""
    for name in ("q_ts_transition_matrix", "q_ml_target_encode",
                 "q_join_bloom_portable", "q_ml_kmeans"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, name


def test_cooccurrence_no_cartesian(spark):
    """The basket self-join must stay keyed on the basket id — a cartesian
    (or broadcast nested loop over the whole fact table) means the join
    key was lost and the plan would explode at scale."""
    plan = _plan(spark, "q_join_cooccurrence")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


# -- property tests: random inputs vs in-Python brute force ----------------


def _coverage_brute(intervals):
    """Union length of [s, e] intervals, overlap-or-touch merged."""
    total, islands = 0, 0
    cur_s = cur_e = None
    for s, e in sorted(intervals):
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
            islands += 1
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total, islands


def test_interval_coverage_matches_brute_force(spark, monkeypatch):
    """Random interval geometries: the distributed sweep must equal the
    sequential merge for every user."""
    import random

    import mini_etl_project_spark.queries.timeseries_q as tsq
    from mini_etl_project_spark.queries.timeseries_q import (
        q_ts_interval_coverage,
    )

    rng = random.Random(42)
    rows, truth = [], {}
    eid = 0
    for user in range(6):
        ivs = []
        for _ in range(rng.randint(1, 25)):
            start_s = rng.randint(0, 5000)
            dur_min = rng.randint(0, 40)  # value is minutes in the operator
            ivs.append((start_s * 1_000_000, start_s * 1_000_000 + dur_min * 60_000_000))
            rows.append((eid, f"2024-01-01 00:00:{0:02d}", user, float(dur_min), start_s))
            eid += 1
        truth[user] = _coverage_brute(ivs)
    df = spark.createDataFrame(
        rows, "event_id long, base string, user_id long, value double, off long"
    ).select(
        "event_id",
        (F.col("base").cast("timestamp") + F.make_dt_interval(secs=F.col("off"))).alias("ts"),
        "user_id",
        "value",
    )
    monkeypatch.setattr(tsq, "load_table", lambda s, d, t: df)
    out = {
        r["user_id"]: (r["covered_us"], r["n_islands"])
        for r in q_ts_interval_coverage(spark, "unused").collect()
    }
    for user, (cov, isl) in truth.items():
        assert out[user] == (cov, isl), (user, out[user], (cov, isl))


def test_prefix_filter_lossless_on_random_corpus(spark):
    """Adversarial random corpus (tiny alphabet → heavy shingle sharing):
    prefix-filtered pairs must equal unfiltered brute force at several
    thresholds."""
    import random

    rng = random.Random(7)
    docs = []
    for i in range(40):
        base = "".join(rng.choice("abcd") for _ in range(rng.randint(6, 30)))
        docs.append((i, base))
        if rng.random() < 0.5:  # planted near-dup
            docs.append((1000 + i, base[rng.randint(0, 3):] + rng.choice("abcd")))
    df = spark.createDataFrame(docs, "id long, text string")
    sh = shingle_rows(df, "id", "text", k=3)
    for t in (0.4, 0.7):
        truth = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs(sh, candidates=None, threshold=t).collect()
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs(
                sh, candidates=prefix_filter_pairs(sh, threshold=t), threshold=t
            ).collect()
        }
        assert got == truth, f"t={t}: {truth ^ got}"


def test_prefix_filter_lossless_at_rounding_hostile_threshold(spark, sf_dir):
    """ADVICE r4: thresholds where n*t is mathematically integral but the
    double product rounds up (t=0.56, n=25 -> ceil(14.000000000000002))
    used to shrink the prefix by one element. The epsilon-guarded cutoff
    must stay lossless there too."""
    from mini_etl_project_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    corpus = d.select(F.col("doc_id").alias("id"), "text").unionByName(
        d.select(
            (F.col("doc_id") + 5000).alias("id"),
            F.substring("text", 12, 1 << 30).alias("text"),
        )
    )
    sh = shingle_rows(corpus, "id", "text", k=5)
    t = 0.56
    # sanity: the hostile rounding actually occurs in doubles
    import math

    assert math.ceil(25 * t) == 15 and 25 * t > 14
    truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(sh, candidates=None, threshold=t).collect()
    }
    cand = prefix_filter_pairs(sh, threshold=t)
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert truth <= cand_set, "prefix filter dropped a true pair at t=0.56"


# -- streaming outer-join watermark contract (ADVICE r4 #5) ----------------


def test_outer_join_final_watermark_matches_oracle_contract(spark, sf_dir):
    """The q_stream_join_outer oracle hard-codes the runtime's watermark
    behavior: the final committed watermark of the bounded replay must be
    min(max_click_ts, max_purchase_ts) - 10 min. If a Spark upgrade
    changes the freeze point (SPARK-42376 lag, file-source ordering), this
    assert fails loudly at the assumption instead of at the driver's hash
    gate."""
    import uuid

    import pyspark.sql.functions as F

    from mini_etl_project_spark.session import load_table
    from mini_etl_project_spark.streaming.ops import (
        click_purchase_outer,
        flush_split_stream,
    )

    joined = click_purchase_outer(flush_split_stream(spark, sf_dir))
    name = f"wm_probe_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final_wm = None
    for p in q.recentProgress:
        wm = (p["eventTime"] or {}).get("watermark")
        if wm:
            final_wm = wm
    assert final_wm is not None, "no watermark reported in progress"

    ev = load_table(spark, sf_dir, "events")
    expected = (
        ev.agg(
            F.least(
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            ).alias("m")
        )
        .select(
            F.date_format(
                (F.col("m").cast("long") - 600).cast("timestamp"),
                "yyyy-MM-dd'T'HH:mm:ss",
            ).alias("s")
        )
        .collect()[0]["s"]
    )
    assert final_wm.startswith(expected), (final_wm, expected)


# -- snapshot tags (round 5) ------------------------------------------------


def test_snapshot_tags_pin_versions_and_survive_vacuum(spark, tmp_path):
    """Tags are immutable named refs; vacuum must keep a tagged version's
    files alive even past the retention horizon, and read_tag must return
    the tagged snapshot exactly."""
    import pytest as _pytest

    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(str(tmp_path / "tbl"))
    t.append(spark.range(10).selectExpr("id", "id * 2 AS v"))      # v1
    t.tag("baseline")                                              # -> v1
    t.append(spark.range(10, 20).selectExpr("id", "id * 2 AS v"))  # v2
    t.append(spark.range(20, 25).selectExpr("id", "id * 2 AS v"))  # v3
    assert t.tags() == {"baseline": 1}
    # immutability
    with _pytest.raises(ValueError):
        t.tag("baseline", 2)
    # vacuum with retention 1 would normally drop v1's files
    t.vacuum(keep_last=1)
    got = sorted(r["id"] for r in t.read_tag(spark, "baseline").collect())
    assert got == list(range(10))
    # untagged middle version is no longer guaranteed; latest still reads
    assert t.read(spark).count() == 25
    with _pytest.raises(ValueError):
        t.read_tag(spark, "nope")


def test_global_rank_invariant_to_partition_count(spark, sf_dir):
    """global_rank must produce identical ranks no matter how many range
    partitions it uses (the ordering is total+unique, so boundary
    placement cannot matter) — the property that makes it safe at any
    cluster size."""
    import pyspark.sql.functions as F

    from mini_etl_project_spark.operators.rank import global_rank
    from mini_etl_project_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    scored = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("score")
    )
    order = [F.col("score").desc(), F.col("user_id").asc()]
    a = {
        r["user_id"]: r["rank"]
        for r in global_rank(scored, order, num_partitions=3).collect()
    }
    b = {
        r["user_id"]: r["rank"]
        for r in global_rank(scored, order, num_partitions=32).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(1, len(a) + 1))


def test_streaming_checkpoint_resume_no_reprocessing(spark, tmp_path):
    """Exactly-once file-source semantics across RESTARTS: a second
    availableNow run sharing the checkpoint must process ONLY files that
    arrived after the first run — nothing is double-counted. The
    durability contract a production drop-zone pipeline leans on."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.range(10).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    def run_once():
        q = (
            spark.readStream.schema("id bigint, v bigint")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).count()
    assert first == 10
    # second run with NO new data: nothing reprocessed
    run_once()
    assert spark.read.parquet(out).count() == 10
    # drop one more file; only it is processed
    spark.range(100, 105).selectExpr("id", "id * 2 AS v").coalesce(
        1
    ).write.mode("append").parquet(src)
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 15
    assert got.filter(F.col("id") >= 100).count() == 5


def test_native_hll_estimate_within_tolerance(spark, sf_dir):
    """The Datasketches HLL union estimate must land within 5% of the
    exact distinct count (lgK=12 → ~1.6% standard error)."""
    import pyspark.sql.functions as F

    from mini_etl_project_spark.queries import QUERIES
    from mini_etl_project_spark.session import load_table

    row = QUERIES["q_agg_hll_native"](spark, sf_dir).collect()[0]
    # round-8 reshape: the query now emits the exact distinct plus an
    # in-plan bound flag (X39/X103 pattern) instead of the raw estimate
    exact = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count_distinct("text").alias("n"))
        .collect()[0]["n"]
    )
    assert row["exact_distinct"] == exact
    assert row["est_within_3rsd"] == 1
