"""Round-8 additions: permutation test (X447), Jonckheere (X448), Page
trend (X449), Cohen's d (X450), GK gamma (X451), ACF/Ljung-Box
(X452/X453), P/R@k (X454), ROUGE-1/BLEU (X455/X456), Markov transitions
(X457), EWMA (X458) — Python replays and statistical invariants; plus
the round's DECIMAL-transport regression pins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.queries.ml_q import (
    _PERM_B,
    q_ml_cohens_d,
    q_ml_gk_gamma,
    q_ml_jonckheere,
    q_ml_page_trend,
    q_ml_permutation_test,
    q_ml_precision_recall_at_k,
)
from mini_etl_project_spark.queries.text_q import (
    q_text_bleu_precisions,
    q_text_rouge1_pairs,
)
from mini_etl_project_spark.queries.timeseries_q import (
    q_ts_acf,
    q_ts_ewma_daily,
    q_ts_ljung_box,
    q_ts_markov_transitions,
)


def test_permutation_test_bounds(spark, sf_dir):
    r = q_ml_permutation_test(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_perms"] == _PERM_B
    assert 0 <= row["n_exceed"] <= _PERM_B
    assert row["p_ppm"] == row["n_exceed"] * 1_000_000 // _PERM_B


def test_jonckheere_bounds(spark, sf_dir):
    row = q_ml_jonckheere(spark, sf_dir).collect()[0]
    # 0 <= JT2 <= 2 * sum n_a n_b = 2 * e_jt2
    assert 0 <= row["jt2"] <= 2 * row["e_jt2"]
    assert row["jt2_centered"] == row["jt2"] - row["e_jt2"]


def test_page_trend_rank_identity(spark, sf_dir):
    row = q_ml_page_trend(spark, sf_dir).collect()[0]
    k, n = 5, row["n"]
    # 2x-midranks per block sum to k(k+1), so sum_j rr_j = n*k*(k+1)
    assert sum(row[f"rr{j}"] for j in range(k)) == n * k * (k + 1)
    # L2 is within the achievable range [sum j*min..] — loose sanity:
    lo = sum((j + 1) for j in range(k)) * n  # every r2 >= 1
    hi = sum((j + 1) * 2 * k for j in range(k)) * n
    assert lo <= row["l2_stat"] <= hi


def test_cohens_d_python_replay(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).collect()
    g1 = [round(r["value"] * 100) for r in ev if r["event_type"] == "click"]
    g2 = [round(r["value"] * 100) for r in ev if r["event_type"] == "view"]
    n1, n2 = len(g1), len(g2)
    m1, m2 = sum(g1) / n1, sum(g2) / n2
    ss1 = sum(x * x for x in g1) - sum(g1) ** 2 / n1
    ss2 = sum(x * x for x in g2) - sum(g2) ** 2 / n2
    d_ref = (m1 - m2) / math.sqrt((ss1 + ss2) / (n1 + n2 - 2))
    row = q_ml_cohens_d(spark, sf_dir).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["cohens_d"] - d_ref) < 1e-9


def test_gk_gamma_range(spark, sf_dir):
    row = q_ml_gk_gamma(spark, sf_dir).collect()[0]
    assert row["conc"] > 0 and row["disc"] > 0
    assert -1.0 <= row["gk_gamma"] <= 1.0


def test_precision_recall_at_k_bounds(spark, sf_dir):
    rows = q_ml_precision_recall_at_k(spark, sf_dir).collect()
    assert len(rows) == 5  # five priorities
    for r in rows:
        assert 0 <= r["sum_p_ppm"] <= r["n_queries"] * 1_000_000
        assert 0 <= r["sum_r_ppm"] <= r["n_with_rel"] * 1_000_000
        assert r["n_with_rel"] <= r["n_queries"]


def test_acf_lag0_normalization(spark, sf_dir):
    rows = {r["lag"]: r["rho"] for r in q_ts_acf(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 8))
    for rho in rows.values():
        assert -1.0 <= rho <= 1.0


def test_ljung_box_consistency(spark, sf_dir):
    acf = {r["lag"]: r for r in q_ts_acf(spark, sf_dir).collect()}
    row = q_ts_ljung_box(spark, sf_dir).collect()[0]
    n, h = row["n"], row["h"]
    assert h == 7
    q_ref = n * (n + 2) * sum(
        acf[k]["rho"] ** 2 / (n - k) for k in range(1, 8)
    )
    # engine rounds each term to 1e-6 (dsum) before the n(n+2)
    # multiplier (~1e3), so the replay agrees to ~7e-3 worst case
    assert abs(row["q_stat"] - q_ref) < 1e-2 * max(abs(q_ref), 1.0)


def test_markov_rows_normalize(spark, sf_dir):
    rows = q_ts_markov_transitions(spark, sf_dir).collect()
    by_prev = defaultdict(list)
    for r in rows:
        by_prev[r["prev_type"]].append(r)
    assert set(by_prev) == {"click", "view", "purchase", "signup", "error"}
    for prev, rs in by_prev.items():
        total = rs[0]["row_total"]
        assert sum(r["n_trans"] for r in rs) == total
        s = sum(r["p_ppm"] for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000  # floor-div remainder


def test_ewma_python_replay(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.dayofyear("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    ).collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r["day"]] += r["c"]
    xs = [float(daily[d]) for d in sorted(daily)]
    acc = xs[0]
    for x in xs[1:]:
        acc = 0.3 * x + 0.7 * acc
    row = q_ts_ewma_daily(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(xs)
    assert row["ewma_03"] == pytest.approx(acc, rel=1e-12)


def test_rouge1_identity_pair_limits(spark, sf_dir):
    rows = q_text_rouge1_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["overlap"] <= min(r["len_c"], r["len_r"])
        assert 0 <= r["p_ppm"] <= 1_000_000
        assert 0 <= r["r_ppm"] <= 1_000_000
        assert 0 <= r["f1_ppm"] <= 1_000_000


def test_bleu_precision_monotone_in_n(spark, sf_dir):
    rows = q_text_bleu_precisions(spark, sf_dir).collect()
    by_pair = defaultdict(dict)
    for r in rows:
        by_pair[r["pair_id"]][r["n"]] = r
    for pid, d in by_pair.items():
        assert set(d) <= {1, 2}
        for n, r in d.items():
            assert 0 <= r["clipped"] <= r["total_c"]
            assert 0 <= r["p_ppm"] <= 1_000_000


def test_decimal_transport_identity(spark, sf_dir):
    """Regression pin for the r7 red-row class: the three reshaped
    queries emit DECIMAL magnitudes as strings whose integer values
    satisfy their defining identities."""
    from mini_etl_project_spark.queries.joins import q_join_pvm_bridge

    rows = q_join_pvm_bridge(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert int(r["price_num"]) + int(r["volume_num"]) == (
            r["rev1"] - r["rev0"]
        ) * r["q0"]
