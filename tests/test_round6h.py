"""Round-6 batch 7: X372-X377 — Matthews correlation, Cochran-Armitage
trend, CUPED variance reduction, Gini-gain feature ranking, named
WINDOW clause, Dickey-Fuller unit-root statistic.

Each test replays the statistic independently in plain Python from the
raw parquet rows — no shared Spark expression trees with the query
under test."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from mini_etl_project_spark.queries.misc_q import q_sql_named_window
from mini_etl_project_spark.queries.ml_q import (
    q_ml_cochran_armitage,
    q_ml_cuped,
    q_ml_gini_gain,
    q_ml_mcc,
)
from mini_etl_project_spark.queries.timeseries_q import q_ts_dickey_fuller


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").collect()


def test_mcc_python_recompute(spark, sf_dir):
    tp = tn = fp = fn = 0
    for r in _orders(spark, sf_dir):
        pred = r["o_totalprice"] > 150000.0
        truth = r["o_orderstatus"] == "F"
        if pred and truth:
            tp += 1
        elif not pred and not truth:
            tn += 1
        elif pred:
            fp += 1
        else:
            fn += 1
    want = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    row = q_ml_mcc(spark, sf_dir).collect()[0]
    assert (row["tp"], row["tn"], row["fp"], row["fn"]) == (tp, tn, fp, fn)
    assert abs(row["mcc"] - want) < 1e-12
    assert -1.0 <= row["mcc"] <= 1.0


def test_cochran_armitage_python_recompute(spark, sf_dir):
    n_i = defaultdict(int)
    a_i = defaultdict(int)
    for r in _orders(spark, sf_dir):
        w = int(r["o_orderpriority"][0])
        n_i[w] += 1
        a_i[w] += 1 if r["o_orderstatus"] == "F" else 0
    n = sum(n_i.values())
    a = sum(a_i.values())
    s1 = sum(w * a_i[w] for w in n_i)
    s2 = sum(w * n_i[w] for w in n_i)
    s3 = sum(w * w * n_i[w] for w in n_i)
    num = n * s1 - a * s2
    want = num * num * (n - 1) / (a * (n - a) * (n * s3 - s2 * s2))
    row = q_ml_cochran_armitage(spark, sf_dir).collect()[0]
    assert (row["n"], row["a"], row["s1"], row["s2"], row["s3"]) == (
        n, a, s1, s2, s3,
    )
    assert abs(row["z2"] - want) / want < 1e-12
    assert row["z2"] >= 0


def test_cuped_python_recompute(spark, sf_dir):
    """theta from pooled moments; adjusted arm means shift by
    -theta*(mean_x_arm - mean_x); the treatment CONTRAST of adjusted
    means must equal mean_y contrast minus theta*mean_x contrast."""
    per_user = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        cents = round(r["value"] * 100)
        idx = 0 if r["ts"].day <= 15 else 1
        per_user[r["user_id"]][idx] += cents
    xs = {u: v[0] for u, v in per_user.items()}
    ys = {u: v[1] for u, v in per_user.items()}
    n = len(per_user)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxx = sum(v * v for v in xs.values())
    sxy = sum(xs[u] * ys[u] for u in per_user)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rows = {r["arm"]: r for r in q_ml_cuped(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    for arm, row in rows.items():
        users = [u for u in per_user if u % 2 == arm]
        na = len(users)
        sxa = sum(xs[u] for u in users)
        sya = sum(ys[u] for u in users)
        assert (row["n_arm"], row["sx_arm"], row["sy_arm"]) == (
            na, sxa, sya,
        )
        assert abs(row["theta"] - theta) < 1e-9 * abs(theta)
        want_adj = (sya - theta * (sxa - na * sx / n)) / na
        assert abs(row["mean_y_adj"] - want_adj) < 1e-6
    # CUPED must not bias the contrast direction: adjusted contrast ==
    # raw contrast - theta * covariate contrast (to fp tolerance).
    raw = rows[1]["mean_y"] - rows[0]["mean_y"]
    covc = (
        rows[1]["sx_arm"] / rows[1]["n_arm"]
        - rows[0]["sx_arm"] / rows[0]["n_arm"]
    )
    adj = rows[1]["mean_y_adj"] - rows[0]["mean_y_adj"]
    assert abs(adj - (raw - rows[1]["theta"] * covc)) < 1e-6


def test_gini_gain_python_recompute(spark, sf_dir):
    feats = {
        "discount_gt_5pct": lambda r: r["l_discount"] > 0.05,
        "quantity_gt_25": lambda r: r["l_quantity"] > 25,
        "tax_gt_4pct": lambda r: r["l_tax"] > 0.04,
        "shipped_h1": lambda r: r["l_shipdate"].month <= 6,
        "linestatus_f": lambda r: r["l_linestatus"] == "F",
    }
    rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    n = len(rows)
    k = sum(1 for r in rows if r["l_returnflag"] == "R")

    def gini(kk, nn):
        if nn == 0:
            return 0.0
        p = kk / nn
        return 2 * p * (1 - p)

    got = {r["feature"]: r for r in q_ml_gini_gain(spark, sf_dir).collect()}
    assert set(got) == set(feats)
    for name, fn in feats.items():
        n1 = sum(1 for r in rows if fn(r))
        k1 = sum(1 for r in rows if fn(r) and r["l_returnflag"] == "R")
        want = (
            gini(k, n)
            - (n1 / n) * gini(k1, n1)
            - ((n - n1) / n) * gini(k - k1, n - n1)
        )
        row = got[name]
        assert (row["n1"], row["k1"], row["n0"], row["k0"]) == (
            n1, k1, n - n1, k - k1,
        )
        assert abs(row["gini_gain"] - want) < 1e-12
        assert row["gini_gain"] >= -1e-15  # split never worsens Gini


def test_named_window_shares_one_sort_per_window(spark, sf_dir):
    out = q_sql_named_window(spark, sf_dir)
    rows = out.collect()
    # independent replay of both named windows
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for t, rs in by_type.items():
        rs_day = sorted(rs, key=lambda r: r["day"])
        run = 0
        for r in rs_day:
            run += r["cents"]
            assert r["running_cents"] == run
        # Tie-aware RANK replay over w1's FULL ordering key (cents DESC,
        # day): equal keys share the rank of the first member, exactly as
        # RANK() defines it — robust to fixture regeneration with ties.
        by_rank = sorted(rs, key=lambda r: (-r["cents"], r["day"]))
        prev_key, prev_rank = None, 0
        for i, r in enumerate(by_rank):
            key = (r["cents"], r["day"])
            rank = prev_rank if key == prev_key else i + 1
            assert r["day_rank"] == rank
            prev_key, prev_rank = key, rank
    # Plan shape, asserted on actual operator nodes of the FINAL plan
    # (not a substring count): exactly two Window operators, each fed by
    # its own Sort, but both downstream of ONE event_type hash exchange —
    # the named WINDOW clause's shared partitioning means one shuffle
    # feeds both windows. The second exchange in the full plan belongs to
    # the daily pre-aggregate, keyed on (event_type, day).
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Window [") == 2
    assert final.count("Sort [") == 2
    window_exchanges = [
        ln for ln in final.splitlines()
        if "Exchange hashpartitioning(event_type#" in ln
        and "_groupingexpression" not in ln and ", day" not in ln
    ]
    assert len(window_exchanges) == 1


def test_dickey_fuller_python_recompute(spark, sf_dir):
    daily = defaultdict(dict)
    for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
        d = daily[r["event_type"]]
        d[r["ts"].day] = d.get(r["ts"].day, 0) + round(r["value"] * 100)
    got = {r["event_type"]: r for r in
           q_ts_dickey_fuller(spark, sf_dir).collect()}
    for t, series in daily.items():
        days = sorted(series)
        pairs = [
            (series[a], series[b] - series[a])
            for a, b in zip(days, days[1:])
        ]
        T = len(pairs)
        sxx = sum(x * x for x, _ in pairs)
        sxy = sum(x * y for x, y in pairs)
        syy = sum(y * y for _, y in pairs)
        row = got[t]
        assert row["n_obs"] == T
        assert abs(row["rho"] - sxy / sxx) < 1e-12
        want_t = sxy * math.sqrt(T - 1) / math.sqrt(sxx * syy - sxy * sxy)
        assert abs(row["df_t"] - want_t) < 1e-9
