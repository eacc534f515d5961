"""Round-9c: independent verification of the X498-X511 waves.

Same contract as test_round9b: the oracle gate proves Spark==DuckDB;
these tests prove both engines equal the MATH (plain-Python ``math``
recomputation from the raw parquet) or the structural invariant the
component's definition promises.
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TOL = 1e-9


def _rows(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF).collect()


def test_psi_matches_libm(spark):
    import duckdb

    ref = duckdb.sql(
        "SELECT LEAST(CAST(FLOOR(o_totalprice / 60000) AS BIGINT), 9),"
        " COUNT(CASE WHEN EXTRACT(MONTH FROM o_orderdate) <= 6 THEN 1 END),"
        " COUNT(CASE WHEN EXTRACT(MONTH FROM o_orderdate) > 6 THEN 1 END)"
        f" FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"
    ).fetchall()
    k = len(ref)
    np_ = sum(r[1] for r in ref)
    nq_ = sum(r[2] for r in ref)
    psi = 0.0
    for _, cp, cq in sorted(ref):
        p = (cp + 1.0) / (np_ + k)
        q = (cq + 1.0) / (nq_ + k)
        psi += (p - q) * (math.log(p) - math.log(q))
    (r,) = _rows(spark, "q_ml_psi")
    assert r["np"] == np_ and r["nq"] == nq_ and r["n_bins"] == k
    assert abs(r["psi_nats"] - psi) <= TOL
    assert r["psi_nats"] >= -1e-12  # PSI = symmetrised KL >= 0


def test_macd_rsi_series_shapes(spark):
    """MACD/RSI invariants: histogram = macd - signal exactly (same
    doubles), RSI in [0, 100], and the emitted day windows are the last
    30/29 days descending."""
    macd = _rows(spark, "q_ts_macd")
    assert len(macd) == 30
    days = [r["day"] for r in macd]
    assert days == sorted(days, reverse=True)
    for r in macd:
        assert r["histogram"] == r["macd"] - r["signal"]
    rsi = _rows(spark, "q_ts_rsi")
    assert 0 < len(rsi) <= 30
    for r in rsi:
        assert -1e-9 <= r["rsi"] <= 100 + 1e-9
        assert r["avg_gain"] >= 0 and r["avg_loss"] >= 0


def test_hurst_in_range(spark):
    """H for any real series lands in (0, 1) up to estimation noise; a
    random-walk-free daily revenue series should be mean-reverting-ish.
    The exact value is oracle-pinned; here we pin the RANGE and the
    scale count."""
    (r,) = _rows(spark, "q_ts_hurst")
    assert r["n_scales"] == 4  # w in {4,6,8,12} all fit the ~30-day series
    assert -0.5 <= r["hurst"] <= 1.5


def test_tukey_hsd_matches_libm(spark):
    import duckdb

    ref = duckdb.sql(
        "SELECT event_type, COUNT(*), SUM(c), SUM(c * c) FROM"
        " (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c"
        f"  FROM read_parquet('{SF}/events.parquet')) GROUP BY 1"
    ).fetchall()
    nt = sum(r[1] for r in ref)
    k = len(ref)
    ssw = sum((n * q - s * s) / n for _, n, s, q in sorted(ref))
    msw = ssw / (nt - k)
    means = {et: s / n for et, n, s, _ in ref}
    ns = {et: n for et, n, _, _ in ref}
    got = {(r["g1"], r["g2"]): r for r in _rows(spark, "q_ml_tukey_hsd")}
    assert len(got) == k * (k - 1) // 2
    for (g1, g2), r in got.items():
        md = means[g1] - means[g2]
        q = abs(md) / math.sqrt(msw / 2 * (1 / ns[g1] + 1 / ns[g2]))
        assert abs(r["mean_diff"] - md / 100.0) <= TOL
        assert abs(r["q_stat"] - q) <= 1e-6


def test_bland_altman_matches_libm(spark):
    import duckdb

    diffs = duckdb.sql(
        "WITH l AS (SELECT l_orderkey AS k,"
        " SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)"
        " * 1000000) AS BIGINT)) AS b FROM"
        f" read_parquet('{SF}/lineitem.parquet') GROUP BY 1)"
        " SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000 - b"
        f" FROM read_parquet('{SF}/orders.parquet') JOIN l ON o_orderkey = k"
    ).fetchall()
    d = [r[0] for r in diffs]
    n = len(d)
    bias = sum(d) / n / 1e6
    var = (n * sum(x * x for x in d) - sum(d) ** 2) / (n * (n - 1))
    sd = math.sqrt(var) / 1e6
    (r,) = _rows(spark, "q_ml_bland_altman")
    assert r["n"] == n
    assert abs(r["bias"] - bias) <= 1e-6 * max(abs(bias), 1.0)
    assert abs(r["sd_diff"] - sd) <= 1e-6 * max(sd, 1.0)
    assert r["loa_lo"] <= r["bias"] <= r["loa_hi"]


def test_poisson_rate_matches_libm(spark):
    import duckdb

    k1, k2, t1, t2 = duckdb.sql(
        "SELECT COUNT(CASE WHEN EXTRACT(DAY FROM ts) <= 15 AND"
        " event_type = 'purchase' THEN 1 END),"
        " COUNT(CASE WHEN EXTRACT(DAY FROM ts) > 15 AND"
        " event_type = 'purchase' THEN 1 END),"
        " COUNT(DISTINCT CASE WHEN EXTRACT(DAY FROM ts) <= 15"
        " THEN CAST(ts AS DATE) END),"
        " COUNT(DISTINCT CASE WHEN EXTRACT(DAY FROM ts) > 15"
        " THEN CAST(ts AS DATE) END)"
        f" FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()
    z = (k1 / t1 - k2 / t2) / math.sqrt(k1 / t1**2 + k2 / t2**2)
    (r,) = _rows(spark, "q_ml_poisson_rate_test")
    assert (r["k1"], r["k2"], r["t1"], r["t2"]) == (k1, k2, t1, t2)
    assert abs(r["z_stat"] - z) <= 1e-9


def test_curriculum_partition_is_total(spark):
    """The three phases partition the scored corpus, difficulty bands
    are disjoint and ordered, and phase sizes differ by at most 1 doc
    from an equal-frequency split."""
    rows = sorted(_rows(spark, "q_corpus_curriculum"), key=lambda r: r["phase"])
    assert [r["phase"] for r in rows] == [0, 1, 2]
    n = sum(r["n_docs"] for r in rows)
    for r in rows:
        assert abs(r["n_docs"] - n / 3) <= 1 + n % 3
    for a, b in zip(rows, rows[1:]):
        assert a["max_difficulty"] <= b["min_difficulty"]


def test_conversation_assembly_matches_python(spark):
    import duckdb
    import hashlib

    ev = duckdb.sql(
        "SELECT user_id, ts, event_id, event_type,"
        " CAST(ROUND(value * 100) AS BIGINT) FROM"
        f" read_parquet('{SF}/events.parquet')"
    ).fetchall()
    conv = defaultdict(list)
    for uid, ts, eid, et, cents in ev:
        role = "user" if et in ("click", "view") else "assistant"
        conv[uid].append((ts, eid, f"{role}:{et}:{cents}"))
    got = {r["user_id"]: r for r in _rows(spark, "q_corpus_conversation_assembly")}
    assert set(got) == set(conv)
    for uid, turns in conv.items():
        turns.sort()
        fp = hashlib.md5(
            "|".join(t[2] for t in turns).encode()
        ).hexdigest()
        r = got[uid]
        assert r["n_turns"] == len(turns)
        assert r["transcript_fp"] == fp
        assert r["n_user_turns"] + r["n_assistant_turns"] == r["n_turns"]


def test_perplexity_filter_survival_consistent(spark):
    """Survival accounting must be internally consistent and the filter
    must actually drop the high-surprisal tail: overall survival is
    strictly between 0 and 1 for a non-degenerate corpus (a mean
    threshold always splits it), and per-group kept <= docs."""
    rows = _rows(spark, "q_corpus_perplexity_filter")
    tot = sum(r["n_docs"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert 0 < kept < tot
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["survival_ppm"] == r["n_kept"] * 1000000 // r["n_docs"]


def test_source_roundtrips_preserve_data(spark):
    """ORC and text round trips must reproduce the parquet-derived
    facts exactly (the in-repo halves of the round-trip oracles)."""
    import duckdb

    ref = dict(
        (et, (n, s))
        for et, n, s in duckdb.sql(
            "SELECT event_type, COUNT(*),"
            " SUM(CAST(ROUND(value * 100) AS BIGINT)) FROM"
            f" read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    got = {r["event_type"]: r for r in _rows(spark, "q_source_orc_roundtrip")}
    assert set(got) == set(ref)
    for et, (n, s) in ref.items():
        assert got[et]["n_events"] == n and got[et]["sum_cents"] == s

    n_docs, total_chars = duckdb.sql(
        "SELECT COUNT(*), SUM(LENGTH(text)) FROM"
        f" read_parquet('{SF}/documents.parquet')"
    ).fetchone()
    (t,) = _rows(spark, "q_source_text_roundtrip")
    assert t["n_docs"] == n_docs and t["total_chars"] == total_chars
    assert len(t["corpus_fp"]) == 32
