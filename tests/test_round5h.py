"""Invariant tests for round-5 session-6 operators, batch H: Kalman
steady-state convergence, skyline dominance laws (brute force), and CEP
pattern counts against Python's re module."""

from __future__ import annotations

import math
import re
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def test_kalman_state_laws(spark):
    from mini_etl_project_spark.queries.timeseries_q import (
        _KALMAN_Q,
        _KALMAN_R,
        q_ts_kalman,
    )

    rows = q_ts_kalman(spark, SF).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["event_type"]].append(r)
    # Closed-form steady state of P' = (P+Q)R/(P+Q+R).
    p_star = (-_KALMAN_Q + math.sqrt(_KALMAN_Q**2 + 4 * _KALMAN_Q * _KALMAN_R)) / 2
    for key, series in by_key.items():
        series.sort(key=lambda r: r["day"])
        first = series[0]
        assert first["x_filtered"] == first["cents"]
        assert first["p_state"] == _KALMAN_R
        prev_x = None
        for r in series:
            assert 0 <= r["p_state"] <= _KALMAN_R
            assert r["innovation"] == r["cents"] - r["x_filtered"]
            if prev_x is not None:
                # Update is a truncated convex combination: the new state
                # lies between the prior state and the measurement.
                lo, hi = sorted((prev_x, r["cents"]))
                assert lo - 1 <= r["x_filtered"] <= hi + 1
            prev_x = r["x_filtered"]
        if len(series) >= 10:
            assert abs(series[-1]["p_state"] - p_star) <= 2, key


def _dominates(a, b) -> bool:
    return (
        a["price_c"] <= b["price_c"]
        and a["size"] >= b["size"]
        and (a["price_c"] < b["price_c"] or a["size"] > b["size"])
    )


def test_skyline_dominance_laws(spark):
    from mini_etl_project_spark.queries.windows import q_window_skyline
    from mini_etl_project_spark.session import load_table
    from pyspark.sql import functions as F

    sky = q_window_skyline(spark, SF).collect()
    assert sky
    pts = (
        load_table(spark, SF, "part")
        .select(
            "p_brand",
            "p_partkey",
            F.round(F.col("p_retailprice") * 100)
            .cast("bigint")
            .alias("price_c"),
            F.col("p_size").cast("bigint").alias("size"),
        )
        .collect()
    )
    by_brand = defaultdict(list)
    for p in pts:
        by_brand[p["p_brand"]].append(p)
    sky_keys = {r["p_partkey"] for r in sky}
    sky_by_brand = defaultdict(list)
    for r in sky:
        sky_by_brand[r["p_brand"]].append(r)
    # (a) no skyline member dominates another
    for brand, members in sky_by_brand.items():
        for a in members:
            for b in members:
                assert not _dominates(a, b), (brand, a, b)
    # (b) every excluded point is dominated by some skyline member
    for brand, all_pts in by_brand.items():
        for p in all_pts:
            if p["p_partkey"] in sky_keys:
                continue
            assert any(_dominates(s, p) for s in sky_by_brand[brand]), p


def test_cep_counts_match_re_module(spark):
    from mini_etl_project_spark.queries.timeseries_q import (
        q_ts_match_recognize,
    )
    from mini_etl_project_spark.session import load_table

    out = {r["user_id"]: r for r in q_ts_match_recognize(spark, SF).collect()}
    ev = load_table(spark, SF, "events").collect()
    seqs = defaultdict(list)
    for e in ev:
        seqs[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"][0]))
    assert set(out) == set(seqs)
    for uid, items in seqs.items():
        seq = "".join(s for _, _, s in sorted(items))
        r = out[uid]
        assert r["seq_len"] == len(seq)
        assert r["n_events"] == len(seq)
        assert r["n_funnels"] == len(re.findall(r"v+p", seq))
        runs = re.findall(r"v+", seq)
        assert r["max_view_run"] == max((len(x) for x in runs), default=0)
        assert r["converted"] == (r["n_funnels"] > 0)
