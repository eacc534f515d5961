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
