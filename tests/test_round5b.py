"""Round-5 session-2 operators: overlapping chunking, frontier BFS,
leakage-safe splits, grid spatial join, k-NN, BPE merge learning,
histogram quantiles, rollup cascade.

The DuckDB oracle proves cross-engine parity; these tests pin the
SEMANTICS against hand-computed answers on tiny inputs and the scale
claims the docstrings make (BFS partition invariance, spatial-join
losslessness vs brute force, histogram-estimate error bound).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_etl_project_spark.operators.graph import bfs_distances


# -- frontier BFS ----------------------------------------------------------


def _mk_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "u bigint, v bigint")
    return df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v")))


def test_bfs_hand_graph(spark):
    """Path 1-2-3-4 plus a detached 9: distances 0,1,2,3 and no row for 9."""
    e = _mk_edges(spark, [(1, 2), (2, 3), (3, 4), (9, 9)])
    src = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["d"] for r in bfs_distances(e, src, max_hops=5).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 9 unreachable → absent


def test_bfs_shortest_wins_over_longer_path(spark):
    """Diamond 1-2-4 and 1-3-4 plus long tail 1-5-6-4: node 4 at d=2."""
    e = _mk_edges(spark, [(1, 2), (2, 4), (1, 3), (3, 4), (1, 5), (5, 6), (6, 4)])
    src = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["d"] for r in bfs_distances(e, src, max_hops=4).collect()}
    assert got[4] == 2 and got[6] == 2


def test_bfs_hop_cap_truncates(spark):
    e = _mk_edges(spark, [(1, 2), (2, 3), (3, 4)])
    src = spark.createDataFrame([(1,)], "node bigint")
    got = {r["node"]: r["d"] for r in bfs_distances(e, src, max_hops=2).collect()}
    assert 4 not in got and got[3] == 2


def test_bfs_partition_invariance(spark):
    """Same distances whether the edge list arrives in 1 or 13 partitions."""
    pairs = [(i, i + 1) for i in range(1, 40)] + [(1, 20)]
    e1 = _mk_edges(spark, pairs).coalesce(1)
    e2 = _mk_edges(spark, pairs).repartition(13)
    src = spark.createDataFrame([(1,)], "node bigint")
    d1 = sorted(map(tuple, bfs_distances(e1, src, max_hops=8).collect()))
    d2 = sorted(map(tuple, bfs_distances(e2, src, max_hops=8).collect()))
    assert d1 == d2


# -- overlapping chunking --------------------------------------------------


def test_chunk_overlap_counts(spark, sf_dir):
    """n_chunks = floor((n-1)/stride)+1 and token accounting reconstructs:
    every token index in [0, n) is covered; overlap tokens counted once per
    covering chunk."""
    from mini_etl_project_spark.queries.corpus_q import q_corpus_chunk_overlap

    rows = q_corpus_chunk_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, k = r["n_tokens"], r["n_chunks"]
        assert k == (n - 1) // 16 + 1
        # sum over chunks of min(24, n - 16*i), i in [0, k)
        expect = sum(min(24, n - 16 * i) for i in range(k))
        assert r["sum_chunk_tokens"] == expect


# -- leakage-safe split ----------------------------------------------------


def test_leakage_safe_split_invariant(spark, sf_dir):
    from mini_etl_project_spark.queries.sampling_q import q_split_leakage_safe

    rows = q_split_leakage_safe(spark, sf_dir).collect()
    assert {r["split"] for r in rows} <= {"train", "validation", "test"}
    assert all(r["n_leaky_clusters"] == 0 for r in rows)
    # planted copies mean docs > clusters somewhere
    assert sum(r["n_docs"] for r in rows) > sum(r["n_clusters"] for r in rows)


# -- grid spatial join -----------------------------------------------------


def test_spatial_grid_lossless_vs_brute_force(spark, sf_dir):
    """The 9-cell candidate join must reproduce the brute-force pair set
    exactly (radius < cell edge makes the pruning provably lossless):
    total pair count AND total squared distance match a python O(n^2)."""
    from mini_etl_project_spark.queries.joins import q_join_spatial_grid
    from mini_etl_project_spark.session import load_table

    c = load_table(spark, sf_dir, "customer")
    pts = [
        (
            r["c_custkey"],
            (r["c_custkey"] * 7919) % 2000001,
            (r["c_custkey"] * 104729) % 2000001,
        )
        for r in c.collect()
    ]
    r2 = 80_000 * 80_000
    brute = [
        (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= r2
    ]
    rows = q_join_spatial_grid(spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in rows) == len(brute)
    assert sum(r["sum_d2"] for r in rows) == sum(brute)


# -- histogram quantile estimate ------------------------------------------


def test_hist_quantile_error_bound(spark, sf_dir):
    """The histogram estimate must land within one bucket width of the
    exact discrete percentile."""
    from mini_etl_project_spark.queries.sampling_q import (
        _HQ_WIDTH,
        q_agg_hist_quantile,
    )
    from mini_etl_project_spark.session import load_table

    est = {r["p"]: r["est_cents"] for r in q_agg_hist_quantile(spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    cents = sorted(
        r["c"]
        for r in l.select(
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
        ).collect()
    )
    n = len(cents)
    for p in (50, 90, 99):
        exact = cents[((n - 1) * p) // 100]
        assert abs(est[p] - exact) <= _HQ_WIDTH, (p, est[p], exact)


# -- rollup cascade --------------------------------------------------------


def test_rollup_cascade_equals_direct(spark, sf_dir):
    """Cascade (min→hour→day) must equal a direct daily aggregation."""
    from mini_etl_project_spark.queries.timeseries_q import q_ts_rollup_cascade
    from mini_etl_project_spark.session import load_table

    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["sum_cents"], r["min_cents"], r["max_cents"])
        for r in q_ts_rollup_cascade(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    direct = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("s"),
        F.min(F.round(F.col("value") * 100).cast("bigint")).alias("mn"),
        F.max(F.round(F.col("value") * 100).cast("bigint")).alias("mx"),
    )
    want = {
        (r["event_type"], r["day"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in direct.collect()
    }
    assert got == want


# -- BPE merges ------------------------------------------------------------


def test_bpe_hand_corpus(spark):
    """Crafted corpus: 'aaab' x3, 'ab' x2.  Pair counts round 1:
    (a,a): 2*3=6 (greedy left-to-right in 'aaa' gives 1 merge... counts
    BEFORE merging: 'a|a|a|b|' has pairs (a,a),(a,a),(a,b) → weighted
    (a,a)=6, (a,b)=5, plus 'a|b|' → (a,b)+2 = 5.  So round 1 merges
    (a,a) with count 6; 'a|a|a|b|' → 'aa|a|b|' (greedy, non-overlapping)."""
    from mini_etl_project_spark.queries.text_q import _BPE_ITERS

    assert _BPE_ITERS == 3
    # replicate the engine's merge primitive on a tiny frame
    df = spark.createDataFrame(
        [("a|a|a|b|", 3), ("a|b|", 2)], "seq string, freq long"
    )
    pairs = (
        df.select(
            "freq",
            F.expr("filter(split(seq, '\\\\|'), x -> x <> '')").alias("syms"),
        )
        .select(
            "freq",
            F.explode(
                F.expr(
                    "zip_with(slice(syms, 1, size(syms) - 1),"
                    " slice(syms, 2, size(syms) - 1),"
                    " (a, b) -> struct(a AS l, b AS r))"
                )
            ).alias("pr"),
        )
        .groupBy("pr.l", "pr.r")
        .agg(F.sum("freq").alias("cnt"))
    )
    got = {(r["l"], r["r"]): r["cnt"] for r in pairs.collect()}
    assert got == {("a", "a"): 6, ("a", "b"): 5}
    merged = df.select(
        F.replace(F.col("seq"), F.lit("a|a|"), F.lit("aa|")).alias("seq")
    ).collect()
    assert {r["seq"] for r in merged} == {"aa|a|b|", "a|b|"}


# -- k-NN ------------------------------------------------------------------


def test_knn_vote_tiebreak(spark, sf_dir):
    """Every query gets exactly one prediction; votes are within [1, k]."""
    from mini_etl_project_spark.queries.ml_q import _KNN_K, _KNN_NQ, q_ml_knn_classify

    rows = q_ml_knn_classify(spark, sf_dir).collect()
    assert len(rows) == _KNN_NQ
    assert all(1 <= r["n_votes"] <= _KNN_K for r in rows)
    assert all(r["min_d2"] >= 0 for r in rows)


# -- Python DataSource write path ------------------------------------------


def test_pyds_sink_two_phase_commit(spark, tmp_path):
    """Every task's part file is listed in the manifest, the manifest row
    total equals the input, and re-reading the part files reconstructs the
    rows exactly."""
    import json
    import os

    from mini_etl_project_spark.sources.pyds import register_sink

    register_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 7).alias("v")
    ).repartition(4)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["total_rows"] == 100
    assert len(manifest["files"]) == 4
    got = []
    for f in manifest["files"]:
        with open(f["path"]) as fh:
            got += [json.loads(line) for line in fh]
    assert sorted((r["id"], r["v"]) for r in got) == [(i, 7 * i) for i in range(100)]
    assert not os.path.exists(os.path.join(out, "_ABORTED"))


# -- dynamic partition pruning ---------------------------------------------


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A hive-partitioned fact joined to a selectively-filtered dim must
    plan a dynamicpruning# subquery on the partition column — the runtime
    partition skip that keeps a 100 TB star join from scanning every
    partition."""
    from mini_etl_project_spark.session import load_table

    fact_dir = str(tmp_path / "fact_part")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        F.month("l_shipdate").alias("ship_month"),
    )
    l.write.partitionBy("ship_month").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # DPP requires a materialized (statistics-bearing) filter side with a
    # non-trivial predicate on a NON-join column — a filtered in-memory
    # range doesn't qualify
    dim_dir = str(tmp_path / "dim")
    spark.range(1, 13).select(
        F.col("id").cast("int").alias("ship_month"),
        (F.col("id") * 10).alias("payload"),
    ).write.parquet(dim_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("payload") == 30)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    joined = fact.join(dim, "ship_month").agg(
        F.count("*").alias("n"), F.sum("l_extendedprice").alias("s")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result is correct vs a plain filter
    direct = fact.filter(F.col("ship_month") == 3).agg(
        F.count("*").alias("n"), F.sum("l_extendedprice").alias("s")
    )
    assert joined.collect() == direct.collect()


# -- partition-spec evolution (hidden partitioning) ------------------------


def test_snapshot_partition_spec_evolution(spark, sf_dir, tmp_path):
    """Gen-1 files clustered by month(ts), gen-2 by day(ts) — the spec
    changed between commits without rewriting gen-1.  A one-day filter
    must (a) skip most files via manifest stats alone, (b) scan fewer
    files than a no-filter read, and (c) return exactly the right rows."""
    import datetime

    from mini_etl_project_spark.session import load_table
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    gen1 = e.filter(F.dayofmonth("ts") <= 15)
    gen2 = e.filter(F.dayofmonth("ts") > 15)
    t = SnapshotTable.create(str(tmp_path / "tbl"))
    v1 = t.append(gen1, stats_cols=["ts"], cluster_by="day(ts)", n_files=6)
    v2 = t.append(gen2, stats_cols=["ts"], cluster_by="month(ts)", n_files=2)
    assert v2 == v1 + 1
    # per-commit specs recorded independently (evolution, not rewrite)
    assert t._read_manifest(v1)["spec"]["cluster_by"] == "day(ts)"
    assert t._read_manifest(v2)["spec"]["cluster_by"] == "month(ts)"
    lo = datetime.datetime(2024, 1, 3, 0, 0, 0)
    hi = datetime.datetime(2024, 1, 3, 23, 59, 59, 999999)
    all_files = t.plan_files(where=None)
    pruned = t.plan_files(where=("ts", lo, hi))
    assert len(pruned) < len(all_files), (len(pruned), len(all_files))
    got = t.read(spark, where=("ts", lo, hi)).filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    want = e.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )


# -- cost-based join reordering --------------------------------------------


def test_cbo_join_reorder_uses_stats(spark, sf_dir):
    """With ANALYZE-computed column stats and CBO on, a query written in
    the worst order (big⋈big first, selective tiny dim last) must be
    reordered so the selective dim joins FIRST — the optimizer decision
    that keeps a 100 TB star join from materializing the big⋈big
    intermediate.  Assert by relation positions in the optimized plan,
    and that CBO-on and CBO-off agree on the answer."""
    from mini_etl_project_spark.session import load_table

    import shutil

    for t in ("cbo_l", "cbo_o", "cbo_n"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    load_table(spark, sf_dir, "lineitem").write.mode("overwrite").saveAsTable("cbo_l")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable("cbo_o")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable("cbo_n")
    for t in ("cbo_l", "cbo_o", "cbo_n"):
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    q = """
    SELECT count(*) AS n
    FROM cbo_l l
    JOIN cbo_o o ON l.l_orderkey = o.o_orderkey
    JOIN cbo_n n ON o.o_custkey % 25 = n.n_nationkey
    WHERE n.n_name = 'FRANCE'
    """
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        on_df = spark.sql(q)
        opt = on_df._jdf.queryExecution().optimizedPlan().toString()
        n_on = on_df.collect()[0]["n"]
        spark.conf.set("spark.sql.cbo.enabled", "false")
        n_off = spark.sql(q).collect()[0]["n"]
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        for t in ("cbo_l", "cbo_o", "cbo_n"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    # reordered: the filtered nation relation must sit INSIDE (before)
    # the lineitem relation in the join tree text
    assert opt.index("default.cbo_n") < opt.index("default.cbo_l"), opt[:1500]
    assert n_on == n_off
