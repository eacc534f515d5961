"""Invariant tests for round-5 session-7 batch K: Benford digit-law
accounting, Gini coefficient recompute against a brute-force mean
absolute difference, and chi-square contingency laws."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_benford_accounting_laws(spark):
    from mini_etl_project_spark.queries.misc_q import (
        _BENFORD_PPM,
        q_quality_benford,
    )
    from mini_etl_project_spark.session import load_table

    rows = q_quality_benford(spark, SF).collect()
    assert rows, "audit produced no rows"
    # digits are 1..9 and expected_ppm matches the hardcoded law table
    for r in rows:
        assert 1 <= r["digit"] <= 9
        assert r["expected_ppm"] == _BENFORD_PPM[r["digit"]]
        assert r["dev_ppm"] == r["observed_ppm"] - r["expected_ppm"]
        assert 0 < r["n_obs"] <= r["n_total"]
    # per-priority counts add back to the group total
    by_p = defaultdict(int)
    totals = {}
    for r in rows:
        by_p[r["priority"]] += r["n_obs"]
        totals[r["priority"]] = r["n_total"]
    assert by_p == totals
    # independent recompute of the digit histogram for one priority
    orders = load_table(spark, SF, "orders").collect()
    pri = rows[0]["priority"]
    expect = defaultdict(int)
    for o in orders:
        if o["o_orderpriority"] == pri and o["o_totalprice"] > 0:
            expect[int(str(round(o["o_totalprice"] * 100))[0])] += 1
    got = {r["digit"]: r["n_obs"] for r in rows if r["priority"] == pri}
    assert got == dict(expect)


def test_gini_matches_mean_absolute_difference(spark):
    from mini_etl_project_spark.queries.sampling_q import q_agg_gini
    from mini_etl_project_spark.session import load_table

    rows = q_agg_gini(spark, SF).collect()
    assert rows
    custs = load_table(spark, SF, "customer").collect()
    groups = defaultdict(list)
    for c in custs:
        if c["c_acctbal"] >= 0:
            groups[(c["c_nationkey"], c["c_mktsegment"])].append(
                round(c["c_acctbal"] * 100)
            )
    for r in rows:
        xs = groups[(r["nation"], r["segment"])]
        n, s = len(xs), sum(xs)
        assert r["n"] == n and r["total_cents"] == s
        # G = sum_ij |x_i - x_j| / (2 n^2 mu) = mad_num / (2 n s); with
        # gini_den = n*s the rank formula equals it exactly iff
        # 2 * gini_num == mad_num
        mad_num = sum(abs(a - b) for a in xs for b in xs)
        assert 2 * r["gini_num"] == mad_num
        # bounds: 0 <= G < 1 for non-negative data
        assert 0 <= r["gini_num"] < r["gini_den"]
        assert 0 <= r["gini_ppm"] < 1000000


def test_chi_square_contingency_laws(spark):
    from mini_etl_project_spark.queries.misc_q import q_quality_chi_square

    rows = q_quality_chi_square(spark, SF).collect()
    assert rows
    n_total = rows[0]["n_total"]
    assert all(r["n_total"] == n_total for r in rows)
    # marginals re-add: row totals sum over each status's cells, and the
    # grand total is the sum of all cells
    assert sum(r["n_obs"] for r in rows) == n_total
    by_status = defaultdict(int)
    by_pri = defaultdict(int)
    for r in rows:
        by_status[r["status"]] += r["n_obs"]
        by_pri[r["priority"]] += r["n_obs"]
    for r in rows:
        assert by_status[r["status"]] == r["row_total"]
        assert by_pri[r["priority"]] == r["col_total"]
        # term recompute in python floats (same IEEE ops)
        d = float(r["n_obs"] * n_total - r["row_total"] * r["col_total"])
        e = float(n_total) * float(r["row_total"]) * float(r["col_total"])
        assert r["chi_term"] == d * d / e
        assert r["chi_term"] >= 0.0
