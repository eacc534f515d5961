"""Invariant tests for round-5 session-7 batch M: trade-matrix revenue
conservation vs the one-slice q05 family, fulfillment-lag order
statistics, and a brute-force sweep-line recompute for peak
concurrency."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_trade_matrix_conservation(spark):
    from mini_etl_project_spark.queries.joins import q_join_trade_matrix
    from mini_etl_project_spark.session import load_table

    rows = q_join_trade_matrix(spark, SF).collect()
    assert rows
    # intra flag is consistent with the name pair
    for r in rows:
        assert r["intra_nation"] == (r["supp_nation"] == r["cust_nation"])
    # total lines across the matrix = all lineitems (every line has a
    # valid supplier and customer by construction)
    n_li = load_table(spark, SF, "lineitem").count()
    assert sum(r["n_lines"] for r in rows) == n_li
    # revenue conservation against an independent single-group recompute
    li = load_table(spark, SF, "lineitem").collect()
    expect_rev = sum(
        round(x["l_extendedprice"] * 100) * (100 - round(x["l_discount"] * 100))
        for x in li
    )
    assert sum(r["revenue"] for r in rows) == expect_rev


def test_fulfillment_lag_order_statistics(spark):
    from mini_etl_project_spark.queries.joins import q_join_fulfillment_lag
    from mini_etl_project_spark.session import load_table

    rows = q_join_fulfillment_lag(spark, SF).collect()
    assert rows
    orders = {
        o["o_orderkey"]: (o["o_orderdate"], o["o_orderpriority"])
        for o in load_table(spark, SF, "orders").collect()
    }
    lags = defaultdict(list)
    for x in load_table(spark, SF, "lineitem").collect():
        od, pri = orders[x["l_orderkey"]]
        shipd = x["l_shipdate"]
        lags[pri].append((shipd.date() - od.date()).days)
    import math

    for r in rows:
        xs = sorted(lags[r["priority"]])
        n = len(xs)
        assert r["n"] == n
        for p, col in [(0.25, "p25_days"), (0.5, "p50_days"),
                       (0.75, "p75_days"), (0.9, "p90_days")]:
            assert r[col] == xs[math.ceil(p * n) - 1]
        assert r["mean_millidays"] == (1000 * sum(xs)) // n
        # percentiles are monotone
        assert r["p25_days"] <= r["p50_days"] <= r["p75_days"] <= r["p90_days"]


def test_max_concurrency_brute_force(spark):
    from mini_etl_project_spark.queries.timeseries_q import q_ts_max_concurrency
    from mini_etl_project_spark.session import load_table

    rows = {r["user_id"]: r for r in q_ts_max_concurrency(spark, SF).collect()}
    assert rows
    by_user = defaultdict(list)
    for e in load_table(spark, SF, "events").collect():
        us = int(e["ts"].timestamp() * 1_000_000)
        by_user[e["user_id"]].append((us, us + 300_000_000))
    assert set(rows) == set(by_user)
    for uid, ivs in by_user.items():
        assert rows[uid]["n_intervals"] == len(ivs)
        # brute force: concurrency only changes at starts; count intervals
        # covering each start instant under the half-open convention
        best = max(
            sum(1 for s2, e2 in ivs if s2 <= s < e2) for s, _ in ivs
        )
        assert rows[uid]["max_concurrent"] == best
