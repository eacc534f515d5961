"""Round-7 additions: global_prefix_sum operator (X381), weighted
systematic sampling (X382), semantic dedup (X378), ANN recall twins
(X379/X380), plus plan-posture pins for the new prefix-sum paths."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from conftest import half_up
from mini_etl_project_spark.queries.sampling_q import (
    q_agg_global_running_total,
    q_sample_weighted_systematic,
)
from mini_etl_project_spark.queries.similarity_q import (
    _SEMDEDUP_TAU,
    q_dedup_semantic,
    q_sim_ann_recall_ivf,
    q_sim_ann_recall_pq,
)


def test_global_running_total_python_replay(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    seq = sorted(
        ((r["o_orderdate"], r["o_orderkey"], half_up(r["o_totalprice"], 100))
         for r in rows),
    )
    expected, run = {}, 0
    for d, k, c in seq:
        run += c
        expected[k] = (c, run)
    got = {
        r["o_orderkey"]: (r["cents"], r["running_cents"])
        for r in q_agg_global_running_total(spark, sf_dir).collect()
    }
    assert got == expected


def test_prefix_sum_has_no_unpartitioned_fact_window(spark, sf_dir):
    """The only unpartitioned window sits on the bounded per-partition
    offsets table — every windowspec touching fact columns is keyed by
    __pid (the global_rank posture, inherited by global_prefix_sum)."""
    for fn in (q_agg_global_running_total, q_sample_weighted_systematic):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "__pid" in plan
        for line in plan.splitlines():
            if "windowspecdefinition" in line and "o_orderdate" in line:
                assert "__pid" in line, line


def test_weighted_systematic_tick_accounting(spark, sf_dir):
    """Σ n_ticks == W DIV step (every tick multiple lands in exactly one
    row's cumulative interval), and the selection is weight-monotone:
    any row with w >= step is always selected."""
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    weights = {r["o_orderkey"]: half_up(r["o_totalprice"], 100) for r in rows}
    total = sum(weights.values())
    step = max(total // 200, 1)
    got = q_sample_weighted_systematic(spark, sf_dir).collect()
    assert sum(r["n_ticks"] for r in got) == total // step
    picked = {r["o_orderkey"] for r in got}
    for k, w in weights.items():
        if w >= step:
            assert k in picked
    for r in got:
        assert r["w"] == weights[r["o_orderkey"]]
        assert r["n_ticks"] >= 1


def test_semantic_dedup_cluster_invariants(spark, sf_dir):
    """Roots are cluster minima; sizes partition the corpus; exactly one
    keep per cluster; every same-cluster edge pair shares a root (spot
    check via a Python CC replay over the emitted pairs is not possible
    from the output alone, so assert the structural invariants)."""
    rows = q_dedup_semantic(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n
    by_root = defaultdict(list)
    for r in rows:
        assert r["cluster_root"] <= r["vec_id"]
        by_root[r["cluster_root"]].append(r)
    assert sum(len(v) for v in by_root.values()) == n
    for root, members in by_root.items():
        assert all(m["cluster_size"] == len(members) for m in members)
        keeps = [m for m in members if m["keep"] == 1]
        assert len(keeps) == 1 and keeps[0]["vec_id"] == root
    # non-trivial at the shipped tau: at least one multi-member cluster
    assert any(len(v) >= 2 for v in by_root.values()), _SEMDEDUP_TAU


@pytest.mark.parametrize("fn", [q_sim_ann_recall_ivf, q_sim_ann_recall_pq])
def test_ann_recall_surfaces_bounded(spark, sf_dir, fn):
    rows = fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["recall_hits"] <= r["k"] == 5
        assert r["recall_hits"] <= r["n_candidates"] or r["n_candidates"] == 0
    # candidate generation is bucketed/pruned — never the whole corpus
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert all(r["n_candidates"] < n for r in rows)
    # the surfaces are informative, not vacuous: some recall somewhere
    assert sum(r["recall_hits"] for r in rows) > 0


def test_cms_portable_invariants(spark, sf_dir):
    """CMS never underestimates, and estimates equal exact counts when no
    probe key collides (checked per-row via the emitted flag); replay the
    probes' exact counts from raw data."""
    from mini_etl_project_spark.queries.sampling_q import q_agg_cms_portable

    exact = defaultdict(int)
    for r in (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey")
        .collect()
    ):
        exact[r["l_partkey"]] += 1
    rows = q_agg_cms_portable(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["exact_cnt"] == exact[r["l_partkey"]]
        assert r["overestimates"] == 1
        assert r["cms_est"] >= r["exact_cnt"]


def test_bloom_portable_no_false_negatives(spark, sf_dir):
    from mini_etl_project_spark.queries.sampling_q import (
        q_agg_bloom_portable,
    )

    rows = q_agg_bloom_portable(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert r["n_false_neg"] == 0  # Bloom's defining invariant
        assert r["n_bloom_pos"] == r["n_true"] + r["n_false_pos"]
        assert r["n_true"] <= r["n_customers"]


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """X387: both sides written bucketBy(8, key)+sortBy — the join plan
    reads the bucketed scans directly into sort-merge join with NO
    ShuffleExchange anywhere, and values match the plain join."""
    from mini_etl_project_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    write_bucketed(o, "r7_bkt_orders", "k")
    write_bucketed(li, "r7_bkt_lineitem", "k")
    try:
        joined = bucketed_join(spark, "r7_bkt_orders", "r7_bkt_lineitem", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point of the layout
        assert "Bucketed: true" in plan
        got = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("q"),
        ).collect()[0]
        want = o.join(li, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("q"),
        ).collect()[0]
        assert (got["n"], got["q"]) == (want["n"], want["q"])
    finally:
        spark.sql("DROP TABLE IF EXISTS r7_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS r7_bkt_lineitem")


def test_anova_python_replay(spark, sf_dir):
    """Recompute SSB/SSW/F from raw cents with the same fold order."""
    from mini_etl_project_spark.queries.ml_q import q_ml_anova_oneway

    groups = defaultdict(list)
    for r in (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        groups[r["l_returnflag"]].append(half_up(r["l_extendedprice"], 100))
    n_tot = sum(len(v) for v in groups.values())
    s_tot = sum(sum(v) for v in groups.values())
    q_tot = sum(c * c for v in groups.values() for c in v)
    sum_terms = 0.0
    for flag in sorted(groups):  # the ordered fold
        s, n = sum(groups[flag]), len(groups[flag])
        sum_terms += float(s) * float(s) / n
    ssb = sum_terms - float(s_tot) * float(s_tot) / n_tot
    ssw = float(q_tot) - sum_terms
    k = len(groups)
    row = q_ml_anova_oneway(spark, sf_dir).collect()[0]
    assert row["k"] == k and row["n_tot"] == n_tot
    assert row["ssb"] == ssb and row["ssw"] == ssw
    assert row["f_stat"] == ssb / (k - 1) / (ssw / (n_tot - k))
    assert row["f_stat"] > 0


def test_kruskal_wallis_python_replay(spark, sf_dir):
    """Replay H from textbook row-level midranks; the engine's
    value-aggregated + prefix-sum path must agree exactly."""
    from mini_etl_project_spark.queries.sampling_q import (
        q_agg_kruskal_wallis,
    )

    rows = [
        (r["l_returnflag"], half_up(r["l_extendedprice"], 100))
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ]
    vals = sorted(c for _, c in rows)
    first_rank, cnt = {}, defaultdict(int)
    for i, c in enumerate(vals):
        cnt[c] += 1
        first_rank.setdefault(c, i + 1)
    r2 = defaultdict(int)
    n = defaultdict(int)
    for flag, c in rows:
        r2[flag] += 2 * first_rank[c] + cnt[c] - 1
        n[flag] += 1
    N = len(rows)
    sum_terms = 0.0
    for flag in sorted(r2):
        sum_terms += float(r2[flag]) * float(r2[flag]) / (4.0 * n[flag])
    h = 12.0 / (float(N) * (float(N) + 1.0)) * sum_terms - 3.0 * (
        float(N) + 1.0
    )
    tie = sum(t**3 - t for t in cnt.values())
    row = q_agg_kruskal_wallis(spark, sf_dir).collect()[0]
    assert row["n_tot"] == N and row["k"] == len(r2)
    assert row["tie_sum"] == float(tie)
    assert row["h_stat"] == h
    assert row["h_corrected"] == h / (
        1.0 - float(tie) / (float(N) ** 3 - float(N))
    )
    assert row["h_stat"] > 0


def test_jackknife_se_positive_and_sane(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_jackknife_se

    row = q_ml_jackknife_se(spark, sf_dir).collect()[0]
    assert row["g_folds"] == 32
    assert row["jackknife_se"] > 0
    # the jackknife mean-of-LOO-means stays close to the plain mean
    assert abs(row["theta_bar"] - row["mean_c"]) < 0.01 * row["mean_c"]
    # SE of the mean should be far below the mean itself at this n
    assert row["jackknife_se"] < row["mean_c"]


def test_shapley_efficiency_property(spark, sf_dir):
    """Σ shapley == v(all channels) × 24 (exact efficiency), and every
    channel's share is a sane ppm."""
    from mini_etl_project_spark.queries.ml_q import q_ml_shapley_attribution

    rows = q_ml_shapley_attribution(spark, sf_dir).collect()
    assert len(rows) == 4
    total = rows[0]["total_x24"]
    assert all(r["total_x24"] == total for r in rows)
    assert sum(r["shapley_x24"] for r in rows) == total
    for r in rows:
        assert 0 <= r["share_ppm"] <= 1000000


def test_registry_rejects_duplicate_names():
    """The registry raises on duplicate @query names (a second
    registration used to silently shadow the first — how X204 was lost
    behind X313 for six rounds)."""
    from mini_etl_project_spark.queries import QUERIES, query

    name = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):
        query(name)(lambda spark, sf: None)
    # and the original registration is untouched
    assert not QUERIES[name].__name__ == "<lambda>"


def test_both_gini_surfaces_registered():
    from mini_etl_project_spark.queries import ORACLES, QUERIES

    assert "q_agg_gini" in QUERIES and "q_agg_gini_global" in QUERIES
    assert "q_agg_gini" in ORACLES and "q_agg_gini_global" in ORACLES


def test_semantic_audit_invariants(spark, sf_dir):
    from mini_etl_project_spark.queries.similarity_q import (
        q_dedup_semantic_audit,
    )

    rows = q_dedup_semantic_audit(spark, sf_dir).collect()
    assert rows  # at least one multi-member cluster at sf0.001 tau
    for r in rows:
        assert r["cluster_size"] >= 2
        # a cluster of size s has between s-1 (chain/tree) and C(s,2) edges
        s = r["cluster_size"]
        assert s - 1 <= r["n_edges"] <= s * (s - 1) // 2
        assert _SEMDEDUP_TAU <= r["min_edge_cosine"] <= r["max_edge_cosine"]
        assert r["max_edge_cosine"] <= 1.0


def test_consistent_hash_rebalance_invariants(spark, sf_dir):
    """The consistent-hashing contract: growing 8->9 shards moves keys
    ONLY into the new shard (moved_to_old_shard == 0 everywhere), and
    assignment covers every document exactly once."""
    from mini_etl_project_spark.queries.misc_q import (
        q_layout_consistent_hash,
    )

    rows = q_layout_consistent_hash(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_after"] for r in rows) == n_docs
    for r in rows:
        assert r["moved_to_old_shard"] == 0
        if r["shard"] != 8:
            assert r["moved_in"] == 0  # old shards only lose keys
    new = [r for r in rows if r["shard"] == 8]
    assert new and new[0]["moved_in"] == new[0]["n_after"] > 0


def test_emd_drift_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.sampling_q import q_agg_emd_drift

    import datetime

    def _as_dt(d):
        if isinstance(d, datetime.datetime):
            return d
        return datetime.datetime(d.year, d.month, d.day)

    cut = datetime.datetime(1995, 6, 1)
    before, after = [], []
    for r in (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    ):
        (before
         if _as_dt(r["o_orderdate"]) < cut else after).append(
            half_up(r["o_totalprice"], 100)
        )
    support = sorted(set(before) | set(after))
    from collections import Counter

    cb, ca = Counter(before), Counter(after)
    n1, n2 = len(before), len(after)
    c1 = c2 = 0
    emd_scaled = 0
    for v, v_next in zip(support, support[1:]):
        c1 += cb[v]
        c2 += ca[v]
        emd_scaled += abs(c1 * n2 - c2 * n1) * (v_next - v)
    row = q_agg_emd_drift(spark, sf_dir).collect()[0]
    assert (row["n_before"], row["n_after"]) == (n1, n2)
    assert row["emd_cents"] == float(emd_scaled) / (float(n1) * float(n2))


def test_chao1_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.text_q import q_text_chao1_richness

    from collections import Counter

    counts = Counter()
    for r in (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ):
        counts.update(t for t in r["text"].lower().split(" ") if t)
    v = len(counts)
    f1 = sum(1 for c in counts.values() if c == 1)
    f2 = sum(1 for c in counts.values() if c == 2)
    row = q_text_chao1_richness(spark, sf_dir).collect()[0]
    assert (row["v"], row["f1"], row["f2"]) == (v, f1, f2)
    assert row["chao1"] == v + f1 * f1 // (2 * max(f2, 1))
    assert row["chao1_bias_corrected"] == v + f1 * (f1 - 1) // (2 * (f2 + 1))
    assert row["chao1"] >= v


def test_timedecay_shares_sum_to_million(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import (
        q_ml_timedecay_attribution,
    )

    rows = q_ml_timedecay_attribution(spark, sf_dir).collect()
    assert rows
    total_share = sum(r["share_ppm"] for r in rows)
    assert 1000000 - len(rows) <= total_share <= 1000000  # floor rounding
    for r in rows:
        assert r["credit_x2_30"] > 0 and r["n_touches"] > 0
