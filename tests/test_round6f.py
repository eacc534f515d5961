"""Round-6 batch 5: X365-X367 — Holt-Winters additive seasonal,
GROUPING()/grouping_id disambiguation, join-skew diagnosis."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.queries.misc_q import q_quality_skew_diagnosis
from mini_etl_project_spark.queries.setops import q_sql_grouping_id
from mini_etl_project_spark.queries.timeseries_q import q_ts_holt_winters


def test_holt_winters_python_replay(spark, sf_dir):
    """Replay the triple recurrence (level/trend/7-day season vector)
    independently from the daily aggregate and compare every state."""
    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
            .cast("bigint")
            .alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], r["cents"]))

    def half(x: int) -> int:
        return abs(x) // 2 * (1 if x >= 0 else -1)

    expected = {}
    for et, pts in series.items():
        pts.sort()
        l = b = s = 0
        vec = [0] * 7
        for i, (day, y) in enumerate(pts):
            if i == 0:
                l, b, s = y, 0, 0
            else:
                s_old = vec[0]
                l_new = half(y - s_old + l + b)
                b = half(b + l_new - l)
                s = half(y - l_new + s_old)
                l = l_new
                vec = vec[1:] + [s]
            expected[(et, day)] = (l, b, s, l + b + vec[0])
    got = {
        (r["event_type"], r["day"]): (
            r["level"],
            r["trend"],
            r["season"],
            r["forecast_next"],
        )
        for r in q_ts_holt_winters(spark, sf_dir).collect()
    }
    assert got == expected


def test_holt_winters_seasonality_is_learned(spark, sf_dir):
    """After the first season the seasonal state must be non-zero for at
    least some days (otherwise the recurrence degenerated to Holt
    linear and the vector plumbing is dead code)."""
    rows = q_ts_holt_winters(spark, sf_dir).collect()
    late = [r for r in rows if r["day"] >= 7]
    assert any(r["season"] != 0 for r in late)


def test_grouping_id_separates_data_nulls_from_subtotals(spark, sf_dir):
    rows = q_sql_grouping_id(spark, sf_dir).collect()
    # data-null rows: prio IS NULL but g_prio = 0
    data_nulls = [
        r for r in rows if r["prio"] is None and r["g_prio"] == 0
    ]
    subtotals = [r for r in rows if r["g_prio"] == 1 and r["g_status"] == 0]
    grand = [r for r in rows if r["gid"] == 3]
    assert data_nulls, "planted NULL priorities must appear as data"
    assert subtotals and len(grand) == 1
    # the grand total equals the sum over the finest level
    fine = [r for r in rows if r["gid"] == 0]
    assert grand[0]["n"] == sum(r["n"] for r in fine)
    assert grand[0]["cents"] == sum(r["cents"] for r in fine)
    # gid is the packed flags
    for r in rows:
        assert r["gid"] == r["g_status"] * 2 + r["g_prio"]


def test_skew_diagnosis_math(spark, sf_dir):
    rows = q_quality_skew_diagnosis(spark, sf_dir).collect()
    assert len(rows) == 20
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = o.count()
    counts = {
        r["o_custkey"]: r["n"]
        for r in o.groupBy("o_custkey").agg(F.count("*").alias("n")).collect()
    }
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["key"], r["cnt"]) for r in rows] == top
    for r in rows:
        assert r["share_ppm"] == r["cnt"] * 1000000 // total
        assert r["salt_parts"] == max(
            1, math.ceil(float(r["cnt"]) * 200 / total)
        )
