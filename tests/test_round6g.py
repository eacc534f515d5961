"""Round-6 batch 6: X368-X371 — harmonic closeness on the nation trade
graph, McNemar paired-classifier test, Hoover inequality index,
Wald-Wolfowitz runs test."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.queries.iterative_q import (
    q_graph_harmonic_closeness,
)
from mini_etl_project_spark.queries.ml_q import q_ml_mcnemar
from mini_etl_project_spark.queries.sampling_q import q_agg_hoover
from mini_etl_project_spark.queries.timeseries_q import q_ts_runs_test


def half_up_cents(v: float) -> int:
    """Mirror Spark F.round(value*100) — HALF_UP on the shortest decimal
    repr of the double (BigDecimal.valueOf), NOT Python round()'s
    banker's half-to-even, which diverges on .xx5 values."""
    return int(
        Decimal(repr(v * 100)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def test_harmonic_closeness_python_bfs(spark, sf_dir):
    """Rebuild the thresholded nation graph and replay BFS in Python."""
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/supplier.parquet"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            )
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("a", "b")
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )
    np_, tc = len(rows), sum(r["cents"] for r in rows)
    adj = defaultdict(set)
    for r in rows:
        if r["cents"] * np_ > tc:
            adj[r["a"]].add(r["b"])
            adj[r["b"]].add(r["a"])
    names = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    expected = {}
    for src in adj:
        dist = {src: 0}
        frontier = {src}
        for d in range(1, 7):
            frontier = {
                v
                for u in frontier
                for v in adj[u]
                if v not in dist
            }
            for v in frontier:
                dist[v] = d
        del dist[src]
        if dist:
            expected[names[src]] = (
                len(dist),
                max(dist.values()),
                sum(1000000 // d for d in dist.values()),
            )
    got = {
        r["nation"]: (r["n_reached"], r["ecc"], r["harmonic_ppm"])
        for r in q_graph_harmonic_closeness(spark, sf_dir).collect()
    }
    assert got == expected


def test_harmonic_closeness_symmetric_distances(spark, sf_dir):
    """The graph is undirected, so d(u,v)=d(v,u) ⇒ the reached-count
    multiset is consistent: Σ n_reached is even only if pairs are
    mutual. Stronger: every nation that appears reaches at least one
    other nation and ecc ≥ 1."""
    rows = q_graph_harmonic_closeness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_reached"] >= 1
        assert 1 <= r["ecc"] <= 6
        assert r["harmonic_ppm"] <= 1000000 * r["n_reached"]


def test_mcnemar_counts_partition(spark, sf_dir):
    """The four cells partition the order count, and the statistic
    matches the closed form recomputed in Python."""
    r = q_ml_mcnemar(spark, sf_dir).collect()[0]
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert (
        r["both_right"] + r["both_wrong"] + r["b_disc"] + r["c_disc"]
        == total
    )
    b, c = r["b_disc"], r["c_disc"]
    assert r["mcnemar_ppm"] == (b - c) * (b - c) * 1000000 // (b + c)
    assert (
        r["mcnemar_cc_ppm"]
        == max(abs(b - c) - 1, 0) ** 2 * 1000000 // (b + c)
    )


def test_hoover_bounds_and_exactness(spark, sf_dir):
    """Hoover ∈ [0, 1); zero iff all values equal. Replay one flag's
    numerator in Python from raw cents."""
    rows = {r["flag"]: r for r in q_agg_hoover(spark, sf_dir).collect()}
    assert set(rows) == {"A", "N", "R"}
    for r in rows.values():
        assert 0 <= r["hoover_ppm"] < 1000000
    cents = [
        half_up_cents(x["l_extendedprice"])
        for x in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select("l_extendedprice")
        .collect()
    ]
    n, s = len(cents), sum(cents)
    assert rows["R"]["n"] == n and rows["R"]["sum_cents"] == s
    assert rows["R"]["abs_dev"] == sum(abs(c * n - s) for c in cents)


def test_runs_test_python_replay(spark, sf_dir):
    """Replay the per-user run counting sequentially."""
    ev = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"],
             half_up_cents(r["value"]))
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", "ts", "event_id", "value")
            .collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    per_user = defaultdict(list)
    for u, ts, eid, cents in ev:
        per_user[u].append(cents)
    expected = {}
    for u, vals in per_user.items():
        n, s = len(vals), sum(vals)
        above = [1 if c * n > s else 0 for c in vals]
        runs = 1 + sum(
            1 for i in range(1, len(above)) if above[i] != above[i - 1]
        )
        n1 = sum(above)
        expected[u] = (
            n, n1, n - n1, runs,
            1000000 + (2 * n1 * (n - n1) * 1000000) // n,
        )
    got = {
        r["user_id"]: (
            r["n"], r["n_above"], r["n_below"], r["runs"],
            r["expected_runs_ppm"],
        )
        for r in q_ts_runs_test(spark, sf_dir).collect()
    }
    assert got == expected


def test_runs_test_windows_are_keyed(spark, sf_dir):
    """Plan posture: every window in the runs-test plan is partitioned
    by user_id — no unpartitioned fact-scale sort."""
    plan = q_ts_runs_test(spark, sf_dir)._jdf.queryExecution().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in spec, spec
