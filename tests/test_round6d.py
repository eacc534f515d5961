"""Round-6 batch 3: X353-X358 + the scan_fill operator and the
window-frame-discipline fixes (shrinking frames are O(n²) per key in
Spark's window exec; all running fills now use growing frames)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import half_up

from mini_etl_project_spark.operators.fill import scan_fill
from mini_etl_project_spark.queries.dedup_q import q_er_fellegi_patterns
from mini_etl_project_spark.queries.joins import q_join_pvm_bridge
from mini_etl_project_spark.queries.ml_q import q_ml_robust_refit
from mini_etl_project_spark.queries.setops import q_setop_percent_of_parent
from mini_etl_project_spark.queries.text_q import q_text_ttr_curve
from mini_etl_project_spark.queries.timeseries_q import q_ts_stockout_episodes


# -- scan_fill operator ----------------------------------------------------


def test_scan_fill_equals_single_window_reference(spark):
    """The distributed fill must equal the naive single-window
    formulation row for row, across group boundaries and partition
    splits (8 range partitions over 3 groups forces carries)."""
    df = spark.range(600).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("o"),
        F.when(F.col("id") % 7 == 0, F.col("id") * 10).alias("v"),
    )
    got = (
        scan_fill(
            df,
            group=["g"],
            order=["o"],
            value=F.col("v"),
            num_partitions=8,
        )
        .select("g", "o", "prev_fill", "next_fill")
        .collect()
    )
    w = Window.partitionBy("g").orderBy("o")
    ref = {
        (r["g"], r["o"]): (r["p"], r["n"])
        for r in df.select(
            "g",
            "o",
            F.lag(
                F.last("v", ignorenulls=True).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                1,
            )
            .over(w)
            .alias("p"),
            F.lag(
                F.last("v", ignorenulls=True).over(
                    Window.partitionBy("g")
                    .orderBy(F.desc("o"))
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
                1,
            )
            .over(Window.partitionBy("g").orderBy(F.desc("o")))
            .alias("n"),
        ).collect()
    }
    assert len(got) == 600
    for r in got:
        assert (r["prev_fill"], r["next_fill"]) == ref[(r["g"], r["o"])]


def test_scan_fill_all_null_group(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, None), (2, 1, 5)],
        "g int, o int, v int",
    )
    got = {
        (r["g"], r["o"]): (r["prev_fill"], r["next_fill"])
        for r in scan_fill(
            df, group=["g"], order=["o"], value=F.col("v")
        ).collect()
    }
    assert got[(1, 1)] == (None, None)
    assert got[(1, 2)] == (None, None)
    assert got[(2, 1)] == (None, None)


# -- X353 stockout ---------------------------------------------------------


def test_stockout_pandas_recompute(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_partkey") <= 500)
        .select(
            "l_partkey",
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
        )
        .collect()
    )
    from collections import defaultdict

    per_part = defaultdict(list)
    for r in rows:
        per_part[r["l_partkey"]].append(r)
    expected = {}
    for pk, rs in per_part.items():
        rs.sort(key=lambda r: (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"]))
        b = n_ep = n_neg = 0
        mn = mx = None
        prev = 0
        for r in rs:
            q = half_up(r["l_quantity"])
            b += q if r["l_linenumber"] % 2 == 1 else -q
            if b < 0:
                n_neg += 1
                if prev >= 0:
                    n_ep += 1
            mn = b if mn is None else min(mn, b)
            mx = b if mx is None else max(mx, b)
            prev = b
        expected[pk] = (n_ep, n_neg, mn, mx)
    got = {
        r["p_partkey"]: (
            r["n_stockout_episodes"],
            r["n_neg_points"],
            r["min_balance"],
            r["max_balance"],
        )
        for r in q_ts_stockout_episodes(spark, sf_dir).collect()
    }
    assert got == expected


# -- X354 Fellegi-Sunter ---------------------------------------------------


def test_fellegi_pattern_counts_pandas(spark, sf_dir):
    import itertools

    rows = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") <= 2000)
        .collect()
    )
    from collections import Counter, defaultdict

    def tdiv(a: int, b: int) -> int:
        # Spark DIV and DuckDB integer // both truncate toward zero
        # (python // floors) — verified: -500 DIV 1000 = 0 in both.
        q = abs(a) // b
        return q if a >= 0 else -q

    blocks = defaultdict(list)
    for r in rows:
        bal = half_up(r["c_acctbal"])
        blocks[(r["c_nationkey"], r["c_mktsegment"], tdiv(bal, 1000))].append(
            (r["c_custkey"], r["c_name"][:12], r["c_name"][-3:], bal)
        )
    counts = Counter()
    for blk in blocks.values():
        for a, b in itertools.combinations(
            sorted(blk, key=lambda t: t[0]), 2
        ):
            counts[
                (
                    int(a[1] == b[1]),
                    int(a[2] == b[2]),
                    int(abs(a[3] - b[3]) <= 100),
                )
            ] += 1
    got = {
        (r["agr_name"], r["agr_sfx"], r["agr_bal"]): r["n_pairs"]
        for r in q_er_fellegi_patterns(spark, sf_dir).collect()
    }
    assert got == dict(counts)


def test_fellegi_negative_balances_exercised(spark, sf_dir):
    """The truncate-toward-zero bucketing (Spark DIV == DuckDB //,
    unlike Python //) only matters if negative balances exist — pin
    that they do, so the recompute above genuinely covers the edge."""
    n_neg = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter((F.col("c_custkey") <= 2000) & (F.col("c_acctbal") < 0))
        .count()
    )
    assert n_neg > 0


# -- X355 robust refit -----------------------------------------------------


def test_robust_refit_python_recompute(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    from collections import defaultdict

    pts = defaultdict(list)
    for r in rows:
        pts[r["l_returnflag"]].append(
            (
                half_up(r["l_quantity"]),
                half_up(r["l_extendedprice"], 100),
            )
        )

    def ols(data):
        n = float(len(data))
        sx = float(sum(x for x, _ in data))
        sy = float(sum(y for _, y in data))
        sxy = float(sum(x * y for x, y in data))
        sxx = float(sum(x * x for x, _ in data))
        b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        b0 = (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
        return b1, b0

    expected = {}
    for g, data in pts.items():
        b1, b0 = ols(data)
        inl = [
            (x, y)
            for x, y in data
            if abs(float(y) - (b1 * float(x) + b0)) <= 2_000_000
        ]
        rb1, rb0 = ols(inl)
        expected[g] = (len(data), len(inl), rb1, rb0)
    got = {
        r["l_returnflag"]: (
            r["n_total"],
            r["n_inliers"],
            r["slope_refit"],
            r["intercept_refit"],
        )
        for r in q_ml_robust_refit(spark, sf_dir).collect()
    }
    for g, (nt, ni, b1, b0) in expected.items():
        assert got[g][0] == nt and got[g][1] == ni
        assert got[g][2] == pytest.approx(b1, rel=1e-12)
        assert got[g][3] == pytest.approx(b0, rel=1e-12)


# -- X356 TTR --------------------------------------------------------------


def test_ttr_monotone_and_bounded(spark, sf_dir):
    rows = q_text_ttr_curve(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["types_100"] <= 100
        assert r["types_100"] <= r["types_250"] <= r["types_500"] <= 500
        assert 0 < r["ttr500_ppm"] <= 1000000


# -- X357 percent-of-parent ------------------------------------------------


def test_percent_of_parent_shares_sum(spark, sf_dir):
    rows = q_setop_percent_of_parent(spark, sf_dir).collect()
    from collections import defaultdict

    by_region = defaultdict(list)
    for r in rows:
        by_region[r["region"]].append(r)
    region_shares = {}
    for region, rs in by_region.items():
        s = sum(r["share_of_region_ppm"] for r in rs)
        # floor ppm: sum within (1e6 - #leaves, 1e6]
        assert 1000000 - len(rs) < s <= 1000000
        region_shares[region] = rs[0]["region_share_of_total_ppm"]
    s = sum(region_shares.values())
    assert 1000000 - len(region_shares) < s <= 1000000


# -- X358 PVM bridge -------------------------------------------------------


def test_pvm_bridge_identity(spark, sf_dir):
    rows = q_join_pvm_bridge(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # price_num + volume_num == (rev1 - rev0) * q0 (over denom q0)
        assert int(r["price_num"]) + int(r["volume_num"]) == (
            r["rev1"] - r["rev0"]
        ) * r["q0"]
        assert r["q0"] > 0 and r["q1"] > 0
