"""Scale-posture tests: salting equivalence, bucketed co-located joins,
plan-shape assertions (pushdown + broadcast) — the 100 TB design claims,
checked mechanically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.operators.skew import salted_aggregate, salted_join
from mini_etl_project_spark.session import load_table


def test_salted_aggregate_equals_direct(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    direct = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["l_quantity_count"], r["l_quantity_sum"])
        for r in salted_aggregate(
            l, ["l_returnflag"], n_salts=16, counts=["l_quantity"], sums=["l_quantity"]
        ).collect()
    }
    assert direct == salted


def test_salted_join_equals_plain(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey").count()
    salted = salted_join(l, o, "l_orderkey", n_salts=8).count()
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key co-locates the join — the plan
    must contain a SortMergeJoin with NO Exchange above either scan."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("b_lineitem")
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("b_orders")
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_flagship_plan_shape(spark, sf_dir):
    """Filter pushed to the parquet scan; only needed columns read."""
    from mini_etl_project_spark.queries import QUERIES

    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]  # pruned


def test_dim_joins_broadcast(spark, sf_dir):
    from mini_etl_project_spark.queries import QUERIES

    df = QUERIES["q05_region_revenue"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ivf_partition_pruning(spark, sf_dir, tmp_path):
    """The cell-partitioned IVF corpus layout: a query's scan must read
    ONLY its probed cells' files (partition pruning, VERDICT r1 item 6)."""
    from mini_etl_project_spark.operators.similarity import IVFIndex

    emb = load_table(spark, sf_dir, "embeddings")
    idx = IVFIndex(n_cells=8, nprobe=2, seed=42).fit(emb, "embedding")
    path = str(tmp_path / "ivf_corpus")
    idx.write_partitioned(emb, path)

    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    queries = [(int(qrow["vec_id"]), list(qrow["embedding"]))]
    out = idx.topk_partitioned(spark, path, queries, k=3)

    import re

    plan = out._jdf.queryExecution().toString()
    pf = re.search(r"PartitionFilters: \[cell#\d+ IN \(([\d,]+)\)", plan)
    assert pf is not None, plan[:2000]
    cells = set(idx.probe_cells_local(queries[0][1]))
    assert {int(c) for c in pf.group(1).split(",")} == cells
    rows = out.collect()
    assert 0 < len(rows) <= 3 and all(r["query_id"] == queries[0][0] for r in rows)


def test_tpch_full_plan_shapes(spark, sf_dir):
    """New TPC-H shapes keep the scale posture: dimension joins broadcast,
    EXISTS/NOT EXISTS compile to semi/anti hash joins on the order key
    (never a cartesian), and the correlated-MIN window stays partitioned."""
    from mini_etl_project_spark.queries import QUERIES

    p9 = QUERIES["q09_product_profit"](spark, sf_dir)
    p9.write.format("noop").mode("overwrite").save()
    plan9 = p9._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan9

    p21 = QUERIES["q21_sole_blame_suppliers"](spark, sf_dir)
    plan21 = p21._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan21
    assert "LeftSemi" in plan21 and "LeftAnti" in plan21

    p2 = QUERIES["q02_min_cost_supplier"](spark, sf_dir)
    plan2 = p2._jdf.queryExecution().toString()
    # correlated MIN compiled to a window partitioned by the part key
    assert "windowspecdefinition(p_partkey" in plan2


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling, demonstrated end-to-end: a join where 90 %
    of fact rows share one key must come out of adaptive planning with the
    skewed side SPLIT (``isSkewJoin=true`` on the SortMergeJoin) instead
    of one straggler reducer — the runtime re-plan this repo relies on for
    residual skew that explicit salting doesn't cover."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        fact = (
            spark.range(0, 120_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(
                    F.col("id") % 1000
                ),
            )
            .withColumn("pad", F.repeat(F.lit("x"), 64))
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = fact.join(dim, "k")
        # Materialize THIS frame's own QueryExecution (count() would build
        # a separate one and leave this plan un-finalized).
        assert len(j.collect()) == 120_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isSkewJoin=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")


def test_zorder_clustering_prunes_both_dimensions(spark, tmp_path):
    """Z-order layout vs linear sort, measured through manifest min/max
    skipping: linear-by-x prunes x-predicates only; the Z-ordered layout
    prunes files for narrow predicates on EITHER clustered column."""
    from mini_etl_project_spark.operators.zorder import cluster_by_zorder
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    n, files = 40_000, 16
    base = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        # independent second dimension (stable hash, not correlated with x)
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
         .cast("bigint") % 200).alias("y"),
        F.col("id").alias("payload"),
    )

    linear = SnapshotTable.create(str(tmp_path / "linear"))
    linear.append(
        base.repartitionByRange(files, "x").sortWithinPartitions("x"),
        stats_cols=["x", "y"],
    )
    zed = SnapshotTable.create(str(tmp_path / "zorder"))
    zed.append(cluster_by_zorder(base, ["x", "y"], n_files=files), stats_cols=["x", "y"])

    def files_read(t, col, lo, hi):
        return len(t.read(spark, where=(col, lo, hi)).inputFiles())

    # Linear layout: x-predicates prune hard, y-predicates read everything.
    assert files_read(linear, "x", 10, 20) <= 2
    assert files_read(linear, "y", 10, 20) == files

    # Z-order: BOTH dimensions prune (each file covers a small rectangle).
    zx, zy = files_read(zed, "x", 10, 20), files_read(zed, "y", 10, 20)
    assert zx < files / 2, f"x-pruning too weak: {zx}/{files}"
    assert zy < files / 2, f"y-pruning too weak: {zy}/{files}"

    # And the data survives intact with predicates applied row-level.
    got = (
        zed.read(spark, where=("y", 10, 20))
        .filter(F.col("y").between(10, 20))
        .count()
    )
    want = base.filter(F.col("y").between(10, 20)).count()
    assert got == want


def test_kmv_sketches_use_takeordered_not_global_window(spark, sf_dir):
    """Round-5 de-scale-kill (VERDICT r4 #4): the KMV sketch builders must
    compile to a distributed TakeOrderedAndProject, never a row_number
    window over the full distinct-key set (single-partition global sort)."""
    from mini_etl_project_spark.queries import QUERIES

    for name in ("q_agg_kmv_intersect", "q_agg_kmv_merge"):
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, name
    # intersect builds both sketches purely via top-k — no window at all
    plan = (
        QUERIES["q_agg_kmv_intersect"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_vocab_coverage_prunes_before_window(spark, sf_dir):
    """VERDICT r4 #5: the rank/cumsum window must sit on the top-N pruned
    vocab (TakeOrdered), not on the full corpus vocabulary."""
    from mini_etl_project_spark.queries import QUERIES

    df = QUERIES["q_corpus_vocab_coverage"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_lift_table_has_no_global_ntile(spark, sf_dir):
    """VERDICT r4 #6: deciles come from range partitions + offset ranks,
    never an unpartitioned ntile window over all users."""
    from mini_etl_project_spark.queries import QUERIES

    df = QUERIES["q_ml_lift_table"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower()
    # the rank window is keyed by the range-partition id (the checkpointed
    # repartitionByRange shows as Scan ExistingRDD), never unpartitioned
    assert "windowspecdefinition(__pid#" in plan
    assert "Scan ExistingRDD" in plan


def test_ntile_from_rank_matches_spark_ntile(spark):
    """Exact-parity proof of the arithmetic NTILE over tricky sizes: n<k,
    n=k, n%k=0, and every remainder class."""
    from pyspark.sql import Window

    from mini_etl_project_spark.queries.ml_q import ntile_from_rank

    for n in [1, 3, 7, 10, 20, 23, 29, 97]:
        df = spark.range(1, n + 1).select(
            F.col("id").alias("rank"), F.lit(n).cast("bigint").alias("n_total")
        )
        got = df.select(
            "rank", ntile_from_rank(10, "rank", "n_total").alias("d")
        )
        want = df.select(
            "rank", F.ntile(10).over(Window.orderBy("rank")).alias("d")
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), n


# -- round-5 session-2 plan shapes -----------------------------------------


def test_spatial_grid_join_is_hash_not_cartesian(spark, sf_dir):
    """The 9-cell candidate join must plan as an equi-join on the cell key
    (hash/broadcast), never a CartesianProduct / BroadcastNestedLoop."""
    from mini_etl_project_spark.queries import QUERIES

    plan = (
        QUERIES["q_join_spatial_grid"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_broadcasts_probe_batch(spark, sf_dir):
    """The bounded query batch must be the broadcast side — the training
    corpus streams map-side."""
    from mini_etl_project_spark.queries import QUERIES

    plan = (
        QUERIES["q_ml_knn_classify"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_salted_join_plans_sort_merge_on_salted_key(spark, sf_dir):
    """The MERGE hint + salt must yield a SortMergeJoin whose keys include
    the salt column — the shape salting exists for."""
    from mini_etl_project_spark.queries import QUERIES

    plan = (
        QUERIES["q_join_salted"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan
    assert "__salt" in plan


def test_bfs_round_is_keyed_join_plus_anti(spark, sf_dir):
    """One BFS round = equi-join on the frontier node key + LEFT ANTI
    against visited; no nested-loop anywhere."""
    from pyspark.sql import functions as F

    from mini_etl_project_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, 2), (2, 3)], "u bigint, v bigint")
    src = spark.createDataFrame([(1,)], "node bigint")
    out = bfs_distances(e, src, max_hops=2)
    # the final visited frame is checkpointed; assert shape on a fresh
    # single round instead
    visited = src.select("node", F.lit(0).alias("d"))
    cand = (
        src.join(e, src["node"] == e["u"])
        .select(F.col("v").alias("node"))
        .distinct()
    )
    new = cand.join(visited, "node", "left_anti")
    plan = new._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert out.count() >= 1


def test_chunking_plan_has_no_shuffle_or_explode(spark, sf_dir):
    """The chunking operator is ONE stateless projection: no Exchange, no
    Generate (explode) anywhere in its plan."""
    from mini_etl_project_spark.queries import QUERIES

    plan = (
        QUERIES["q_corpus_chunk_overlap"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_kmv_builds_are_two_level_never_group_keyed_fact_sort(spark, sf_dir):
    """VERDICT r5 #3: the KMV BUILD side must never sort fact-scale data in
    a window keyed only by a <=5-cardinality group. Both builders go
    two-level: k-smallest per (group, spark_partition_id) first — so the
    only group-keyed window left sits on the bounded survivor set (<= k*P
    rows per group), proven lossless by the flat-sketch oracle."""
    from mini_etl_project_spark.queries import QUERIES

    for name in ("q_agg_kmv_distinct", "q_agg_kmv_merge"):
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # level-1 window is keyed by the physical partition id ...
        assert "__pid" in plan, name
        # ... and prunes to <= K rows per (group, pid) before any
        # group-only window runs
        assert "rn1" in plan, name


def test_percentile_disc_uses_grouped_global_rank(spark, sf_dir):
    """VERDICT r5 #4: grouped discrete percentiles rank via the grouped
    global_rank (range partitions + per-(group,pid) offsets), never a
    row_number window keyed by the 3-value l_returnflag over the full
    lineitem table."""
    from mini_etl_project_spark.queries import QUERIES

    df = QUERIES["q_agg_percentile_disc"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fact-scale rank window is keyed by (group, partition id)
    assert "__pid" in plan
    # the checkpointed range partitioning shows as an RDD scan
    assert "Scan ExistingRDD" in plan
    # no unpartitioned-over-fact window: every window spec that mentions
    # the fact ordering column is also keyed by __pid
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "l_extendedprice" in line:
            assert "__pid" in line, line


def test_grouped_global_rank_matches_window_rank(spark):
    """Exact-parity proof of the grouped global_rank against Spark's own
    per-group row_number on a small frame with duplicate order values
    broken by a unique tiebreak."""
    from pyspark.sql import Window

    from mini_etl_project_spark.operators.rank import global_rank

    rows = [
        (g, v % 7, gi * 1000 + v)
        for gi, g in enumerate(("a", "b", "c"))
        for v in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v int, id bigint")
    got = {
        (r["g"], r["id"]): (r["rk"], r["n"])
        for r in global_rank(
            df,
            order=[F.col("v"), F.col("id")],
            rank_col="rk",
            n_col="n",
            num_partitions=8,
            group=["g"],
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    wn = Window.partitionBy("g")
    want = {
        (r["g"], r["id"]): (r["rk"], r["n"])
        for r in df.select(
            "g",
            "id",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wn).alias("n"),
        ).collect()
    }
    assert got == want


def test_psm_match_uses_scan_fill_not_day_keyed_window(spark, sf_dir):
    """Round-6 sweep finding: a day-keyed running fill funnels the fact
    table through ~30 sort partitions AND Spark's shrinking frames are
    O(n²) per key (measured 71 s at 10×). The fix routes through
    scan_fill: the plan must show the __pid-keyed local windows and the
    checkpointed range partitioning, and every window spec that orders
    by the fact score column must be keyed by __pid."""
    from mini_etl_project_spark.queries import QUERIES

    df = QUERIES["q_ml_psm_match"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__pid" in plan
    assert "Scan ExistingRDD" in plan
    for line in plan.splitlines():
        low = line.lower()
        if "windowspecdefinition" in low and "score" in low:
            assert "__pid" in line, line


def test_no_shrinking_window_frames_in_registered_plans(spark, sf_dir):
    """Frame-discipline audit, pinned mechanically for the operators the
    round-6 fix touched: no optimized plan may contain a
    `currentrow$(), unboundedfollowing$()` or `N, unboundedfollowing$()`
    frame with a non-trivial lower bound — the shrinking shape Spark
    re-evaluates per row. (unboundedpreceding → anything is the
    incremental growing shape and is allowed.)"""
    import re

    from mini_etl_project_spark.queries import QUERIES

    for name in (
        "q_ml_psm_match",
        "q_join_asof_nearest",
        "q_ts_resample_interp",
    ):
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
        for m in re.finditer(r"specifiedwindowframe\(([^)]*)\)", plan):
            spec = m.group(1)
            if "unboundedfollowing" in spec:
                assert "unboundedpreceding" in spec, (name, spec)


def test_quantile_normalize_remap_is_hash_join(spark, sf_dir):
    """The remap join equi-joins on the precomputed pooled index — the
    plan must use a hash/sort-merge join, never BroadcastNestedLoopJoin
    or CartesianProduct (the first draft's mixed-side join expression
    forced exactly that and timed out at sf0.1)."""
    from mini_etl_project_spark.queries import QUERIES

    df = QUERIES["q_ml_quantile_normalize"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the remap join on the pooled index p is a HASH join
    assert any(
        ("HashJoin" in line or "SortMergeJoin" in line) and "[p#" in line
        for line in plan.splitlines()
    ), plan
    # the only nested-loop join allowed is the 1-row scalar cross join
    # (crossJoin(broadcast(pool_n)) — O(n) by construction)
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line


def test_shard_shuffle_and_ttr_rank_through_pid_windows(spark, sf_dir):
    """The grouped global_rank discipline for the two new fact-scale
    ranking queries: shard shuffle (32 shards) and TTR curve (20
    sources) both range-partition and rank per (group, __pid) — a
    group-only keyed window over the token/doc stream would concentrate
    at 100×."""
    from mini_etl_project_spark.queries import QUERIES

    for name in ("q_corpus_shard_shuffle", "q_text_ttr_curve"):
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "__pid" in plan, name
        assert "Scan ExistingRDD" in plan, name
