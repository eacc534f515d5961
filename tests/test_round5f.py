"""Invariant tests for round-5 session-5 operators: FD-violation
accounting, l-diversity partition laws, QUALIFY top-k shape, Cohen's
kappa closed form, and TVD drift bounds/recomputation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_fd_violations_accounting(spark):
    from mini_etl_project_spark.queries.misc_q import q_quality_fd_violations

    rows = {r["fd"]: r for r in q_quality_fd_violations(spark, SF).collect()}
    assert set(rows) == {"part: brand->type", "customer: nation->segment"}
    for r in rows.values():
        # minority rows exist only where an LHS maps to >1 RHS, and each
        # violating LHS contributes at least one minority row.
        assert 0 <= r["n_violating_lhs"] <= r["n_lhs"]
        assert r["n_minority_rows"] >= r["n_violating_lhs"]
        assert r["n_minority_rows"] < r["n_rows"]
    # 25 brands over only 6 part types MUST collide somewhere.
    assert rows["part: brand->type"]["n_violating_lhs"] > 0


def test_l_diversity_partitions_customers(spark):
    from mini_etl_project_spark.queries.misc_q import q_quality_l_diversity
    from mini_etl_project_spark.session import load_table

    c = load_table(spark, SF, "customer")
    out = q_quality_l_diversity(spark, SF).collect()
    n_groups = c.select("c_nationkey", "c_mktsegment").distinct().count()
    # The l-histogram partitions both the QI groups and the rows exactly.
    assert sum(r["n_groups"] for r in out) == n_groups
    assert sum(r["n_rows"] for r in out) == c.count()
    for r in out:
        assert 1 <= r["min_group_size"] <= r["max_group_size"]
        # l can never exceed the group's row count.
        assert r["l"] <= r["max_group_size"]


def test_qualify_topk_shape(spark):
    from mini_etl_project_spark.queries.misc_q import q_sql_qualify

    out = q_sql_qualify(spark, SF)
    per_cust = out.groupBy("o_custkey").agg(
        F.count("*").alias("k"), F.max("rn").alias("max_rn")
    )
    bad = per_cust.filter((F.col("k") > 2) | (F.col("max_rn") > 2)).count()
    assert bad == 0
    # within a customer, rn=1 price >= rn=2 price
    w = out.groupBy("o_custkey").pivot("rn", [1, 2]).sum("o_totalprice")
    viol = w.filter(F.col("2").isNotNull() & (F.col("1") < F.col("2"))).count()
    assert viol == 0


def test_cohens_kappa_closed_form(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_cohens_kappa

    r = q_ml_cohens_kappa(spark, SF).collect()[0]
    n, agree, a1, b1 = r["n"], r["agree"], r["a1"], r["b1"]
    pe_num = a1 * b1 + (n - a1) * (n - b1)
    assert r["po_ppm"] == math.floor(agree * 1_000_000.0 / n)
    assert r["pe_ppm"] == math.floor(pe_num * 1_000_000.0 / (n * n))
    assert r["kappa_ppm"] == math.floor(
        (agree * n - pe_num) * 1_000_000.0 / (n * n - pe_num)
    )
    assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000


def test_drift_tvd_bounds_and_recompute(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_drift_tvd
    from mini_etl_project_spark.session import load_table

    out = {r["event_type"]: r for r in q_ml_drift_tvd(spark, SF).collect()}
    e = load_table(spark, SF, "events")
    binned = (
        e.groupBy(
            "event_type",
            F.least(
                F.floor(F.col("value") / 50.0).cast("bigint"), F.lit(9)
            ).alias("bin"),
            (F.dayofmonth("ts") % 2).alias("period"),
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    agg: dict[str, dict[int, list[int]]] = {}
    for r in binned:
        agg.setdefault(r["event_type"], {}).setdefault(r["bin"], [0, 0])[
            r["period"]
        ] += r["cnt"]
    for et, bins in agg.items():
        t1 = sum(v[0] for v in bins.values())
        t2 = sum(v[1] for v in bins.values())
        raw = sum(abs(v[0] * t2 - v[1] * t1) for v in bins.values())
        want = math.floor(raw * 1_000_000.0 / (2.0 * t1 * t2))
        got = out[et]
        assert (got["n_period0"], got["n_period1"]) == (t1, t2)
        assert got["tvd_ppm"] == want
        assert 0 <= got["tvd_ppm"] <= 1_000_000


def test_sssp_is_relaxation_fixpoint(spark):
    from mini_etl_project_spark.queries.iterative_q import (
        _trade_edges,
        q_graph_sssp,
    )
    from mini_etl_project_spark.queries.sampling_q import hash60

    dist = {r["node"]: r["dist"] for r in q_graph_sssp(spark, SF).collect()}
    edges = (
        _trade_edges(spark, SF)
        .select(
            "src",
            "dst",
            (
                F.lit(1)
                + hash60(F.concat_ws(">", F.col("src"), F.col("dst"))) % 9
            ).alias("w"),
        )
        .collect()
    )
    src0 = min(e["src"] for e in edges)
    assert dist[src0] == 0
    # 6 rounds >= the trade graph's weighted-path hop count, so the output
    # must already be a fixed point of the relaxation step.
    for e in edges:
        if e["src"] in dist:
            assert dist.get(e["dst"], 1 << 60) <= dist[e["src"]] + e["w"]


def test_dtw_matches_full_matrix_dp(spark):
    from mini_etl_project_spark.queries.timeseries_q import (
        _DTW_PATTERN,
        q_ts_dtw,
    )
    from mini_etl_project_spark.session import load_table

    out = {r["user_id"]: r for r in q_ts_dtw(spark, SF).collect()}
    e = load_table(spark, SF, "events")
    daily = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    series: dict[int, list[tuple]] = {}
    for r in daily:
        series.setdefault(r["user_id"], []).append((r["day"], r["x"]))
    inf = float("inf")
    for uid, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        p = _DTW_PATTERN
        n, m = len(xs), len(p)
        D = [[inf] * (m + 1) for _ in range(n + 1)]
        D[0][0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i][j] = abs(xs[i - 1] - p[j - 1]) + min(
                    D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
                )
        assert out[uid]["dtw"] == D[n][m]
        assert out[uid]["n_points"] == n


def test_er_blocking_in_block_typos_all_merge(spark):
    from mini_etl_project_spark.queries.dedup_q import q_er_blocking
    from mini_etl_project_spark.session import load_table

    out = q_er_blocking(spark, SF).collect()
    c = load_table(spark, SF, "customer")
    # A typo at digit offset >= 5 lands OUTSIDE the blocking prefix, so the
    # dirty mention stays in its block and MUST pair with its clean twin
    # (levenshtein == 1) — each such customer contributes a merged mention.
    n_safe = c.filter(F.col("c_custkey") % 8 >= 5).count()
    assert sum(r["n_merged"] for r in out) >= n_safe
    for r in out:
        assert r["n_clusters"] + r["n_merged"] >= r["n_mentions"] // 2
        assert r["n_pairs"] >= r["n_merged"] // 2


def test_isotonic_monotone_and_matches_minimax(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_isotonic_pava
    from mini_etl_project_spark.session import load_table

    out = sorted(
        q_ml_isotonic_pava(spark, SF).collect(), key=lambda r: r["bin"]
    )
    fitted = [r["fitted_ppm"] for r in out]
    assert fitted == sorted(fitted), "isotonic fit must be nondecreasing"
    raws = [r["raw_ppm"] for r in out]
    assert min(raws) <= fitted[0] and fitted[-1] <= max(raws)
    # independent recompute of the floored minimax from the bin table
    ns = [r["n"] for r in out]
    sy = [r["sum_y"] for r in out]
    m = len(out)

    def avg_ppm(j, k):
        return math.floor(
            sum(sy[j : k + 1]) * 1_000_000.0 / sum(ns[j : k + 1])
        )

    for i in range(m):
        want = max(
            min(avg_ppm(j, k) for k in range(i, m)) for j in range(i + 1)
        )
        assert fitted[i] == want


def test_stratified_ate_recompute(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_stratified_ate
    from mini_etl_project_spark.session import load_table

    r = q_ml_stratified_ate(spark, SF).collect()[0]
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    spend = {
        x["o_custkey"]: x["cents"]
        for x in o.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
        .collect()
    }
    strata: dict[int, list] = {}
    for cust in c.collect():
        s = strata.setdefault(cust["c_nationkey"], [0, 0, 0.0, 0.0])
        t = 1 if cust["c_mktsegment"] == "BUILDING" else 0
        y = spend.get(cust["c_custkey"], 0)
        s[t] += 1
        s[2 + t] += y
    total = sum(s[0] + s[1] for s in strata.values())
    terms = []
    for s in strata.values():
        c0, c1 = s[0], s[1]
        if c0 > 0 and c1 > 0:
            terms.append(
                (
                    c0 + c1,
                    math.floor((s[3] / c1 - s[2] / c0) * (c0 + c1)),
                )
            )
    assert r["n_total"] == total
    assert r["n_strata_used"] == len(terms)
    assert r["sum_term"] == sum(t for _, t in terms)
    assert r["ate_cents"] == math.floor(
        sum(t for _, t in terms) / sum(n for n, _ in terms)
    )


def test_mann_kendall_bruteforce(spark):
    from mini_etl_project_spark.queries.timeseries_q import q_ts_mann_kendall
    from mini_etl_project_spark.session import load_table

    out = {r["event_type"]: r for r in q_ts_mann_kendall(spark, SF).collect()}
    e = load_table(spark, SF, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    for et, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        tie = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(xs).values()
            if t > 1
        )
        got = out[et]
        assert got["n_days"] == n
        assert got["s_stat"] == s
        assert got["var18"] == n * (n - 1) * (2 * n + 5) - tie


def test_passage_dedup_accounting_and_first_doc_keeps_all(spark):
    from mini_etl_project_spark.queries.corpus_q import (
        q_corpus_passage_dedup,
    )

    out = q_corpus_passage_dedup(spark, SF).collect()
    by_id = {r["doc_id"]: r for r in out}
    for r in out:
        assert r["n_kept"] + r["n_dropped"] == r["n_segs"]
        assert r["n_kept"] >= 0 and r["n_segs"] >= 1
    # Some duplication must actually fire on the fixture corpus.
    assert sum(r["n_dropped"] for r in out) > 0
    # doc 0 is the globally first document: its first passage can never
    # be dropped (doc_id*1000+seg = 0 is the global minimum for its text).
    assert by_id[0]["n_kept"] >= 1


def test_haar_energy_conservation(spark):
    from mini_etl_project_spark.queries.timeseries_q import q_ts_wavelet_haar
    from mini_etl_project_spark.session import load_table

    out = q_ts_wavelet_haar(spark, SF).collect()
    e = load_table(spark, SF, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
            .cast("bigint")
            .alias("i"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "cents"
            )
        )
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in daily:
        series.setdefault(r["event_type"], [0] * 32)[r["i"]] = r["cents"]
    # Unnormalized Haar (a=l+r, d=l-r) scales energy by 2 per level:
    # sum(a^2)+sum(d^2) at level k+1 equals 2*sum(a^2) at level k. So
    # E0 + sum_k 2^-(L-k+1)... — check directly per level instead.
    got: dict[tuple, int] = {
        (r["event_type"], r["level"]): r["energy"] for r in out
    }
    for et, xs in series.items():
        a = list(xs)
        for lv in range(1, 6):
            d = [a[2 * i] - a[2 * i + 1] for i in range(len(a) // 2)]
            a = [a[2 * i] + a[2 * i + 1] for i in range(len(a) // 2)]
            assert got[(et, lv)] == sum(v * v for v in d)
        assert got[(et, 0)] == sum(v * v for v in a)


def test_filter_clause_partitions_counts(spark):
    from mini_etl_project_spark.queries.misc_q import q_sql_filter_clause

    for r in q_sql_filter_clause(spark, SF).collect():
        assert r["n_f"] + r["n_o"] <= r["n_orders"]
        assert r["n_orders"] > 0


def test_textrank_mass_and_positivity(spark):
    from mini_etl_project_spark.queries.text_q import q_text_textrank

    out = q_text_textrank(spark, SF).collect()
    assert len(out) > 5
    for r in out:
        assert r["rank"] > 0
    # With the symmetric edge set every node has out-edges, so no mass
    # leaks: total rank stays ~1 after every iteration.
    assert abs(sum(r["rank"] for r in out) - 1.0) < 1e-6


def test_rolling_regression_slope_recompute(spark):
    from mini_etl_project_spark.queries.windows import (
        q_window_rolling_regression,
    )

    rows = q_window_rolling_regression(spark, SF).collect()
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r)
    for et, rs in series.items():
        rs.sort(key=lambda r: r["x"])
        for idx, r in enumerate(rs):
            frame = rs[max(0, idx - 6) : idx + 1]
            n = len(frame)
            sx = sum(f["x"] for f in frame)
            sy = sum(f["y"] for f in frame)
            sxy = sum(f["x"] * f["y"] for f in frame)
            sxx = sum(f["x"] * f["x"] for f in frame)
            den = n * sxx - sx * sx
            want = (
                None
                if den == 0
                else math.floor((n * sxy - sx * sy) * 1000.0 / den)
            )
            assert r["n"] == n
            assert r["slope_pm"] == want


def test_interval_weighted_overlap_bounds(spark):
    from mini_etl_project_spark.queries.joins import q_join_interval_weighted

    out = q_join_interval_weighted(spark, SF).collect()
    eight_hours_us = 8 * 3600 * 1_000_000
    for r in out:
        assert 0 <= r["n_overlapping"] <= r["n_days"]
        # Per day the overlap cannot exceed the promo window length.
        assert r["total_overlap_us"] <= r["n_days"] * eight_hours_us
    assert sum(r["total_overlap_us"] for r in out) > 0


def test_ema_crossover_sign_consistency(spark):
    from mini_etl_project_spark.queries.timeseries_q import (
        q_ts_ema_crossover,
    )

    rows = q_ts_ema_crossover(spark, SF).collect()
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r)
    n_crossings = 0
    for et, rs in series.items():
        rs.sort(key=lambda r: r["day"])
        for prev, cur in zip(rs, rs[1:]):
            want = 1 if prev["sign"] != cur["sign"] else 0
            assert cur["crossed"] == want
            n_crossings += want
        assert rs[0]["crossed"] == 0  # first emitted row can't cross
    assert n_crossings == sum(r["crossed"] for r in rows)


def test_reconcile_classes_account_for_all_keys(spark):
    from mini_etl_project_spark.queries.etl_q import q_etl_reconcile
    from mini_etl_project_spark.session import load_table

    out = {r["class"]: r for r in q_etl_reconcile(spark, SF).collect()}
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    keys_a = {
        r["o_orderkey"]
        for r in o.filter(F.col("o_orderkey") % 50 != 0).collect()
    }
    keys_b = {
        r["l_orderkey"]
        for r in li.filter(F.col("l_orderkey") % 77 != 0)
        .select("l_orderkey")
        .distinct()
        .collect()
    }
    assert out["missing_a"]["n"] == len(keys_b - keys_a)
    assert out["missing_b"]["n"] == len(keys_a - keys_b)
    assert sum(r["n"] for r in out.values()) == len(keys_a | keys_b)
    # planted gaps guarantee both missing classes fire
    assert out["missing_a"]["n"] > 0 and out["missing_b"]["n"] > 0


def test_bitemporal_stale_only_in_older_versions(spark):
    from mini_etl_project_spark.queries.joins import q_join_bitemporal

    out = sorted(
        q_join_bitemporal(spark, SF).collect(), key=lambda r: r["version"]
    )
    assert [r["version"] for r in out] == [0, 1]
    # regime 2 starts after the snapshot, so only v0/v1 can be chosen;
    # stale fallbacks exist (late-arriving v1 facts served by v0) and can
    # only appear in the non-latest version.
    assert out[0]["n_stale"] > 0
    assert out[1]["n_stale"] == 0
    for r in out:
        assert r["n_lines"] >= r["n_stale"]
