"""Round-9b: independent libm verification of the information-theory
wave (X487-X492).

The driver oracle proves Spark==DuckDB; these tests prove both engines
equal the MATH: every statistic is recomputed in plain Python with
``math.log`` from the raw parquet counts and compared within a few
hundred ulp (the pln kernel is <=2 ulp per ln; folds add <=60 ordered
additions). Plus the structural invariants the definitions promise
(Gibbs' inequality, JS <= ln 2, G = 2*N*MI, entropy in [0, ln k]).
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TOL = 1e-9


def _rows(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF).collect()


def _pq(table):
    import duckdb

    return duckdb.sql(
        f"SELECT * FROM read_parquet('{SF}/{table}.parquet')"
    ).fetchall()


def test_entropy_monthly_matches_libm(spark):
    import duckdb

    ref = duckdb.sql(
        "SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT),"
        " o_orderpriority, COUNT(*) FROM"
        f" read_parquet('{SF}/orders.parquet') GROUP BY 1, 2"
    ).fetchall()
    by_m: dict[int, Counter] = {}
    for m, pr, c in ref:
        by_m.setdefault(m, Counter())[pr] = c
    got = {r["m"]: r for r in _rows(spark, "q_ml_entropy_monthly")}
    assert set(got) == set(by_m)
    for m, cnt in by_m.items():
        n = sum(cnt.values())
        h = -sum(c / n * math.log(c / n) for _, c in sorted(cnt.items()))
        r = got[m]
        assert r["n_orders"] == n and r["k_cats"] == len(cnt)
        assert abs(r["entropy_nats"] - h) <= TOL * max(h, 1.0)
        # definition bounds
        assert -1e-12 <= r["entropy_nats"] <= math.log(len(cnt)) + 1e-12
        if len(cnt) > 1:
            assert abs(
                r["entropy_norm"] - h / math.log(len(cnt))
            ) <= TOL
            assert -1e-12 <= r["entropy_norm"] <= 1 + 1e-12


def test_kl_js_matches_libm_and_gibbs(spark):
    import duckdb

    ref = duckdb.sql(
        "SELECT o_orderpriority,"
        " COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END), COUNT(*)"
        f" FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"
    ).fetchall()
    k = len(ref)
    ns, na = sum(r[1] for r in ref), sum(r[2] for r in ref)
    kl_pq = kl_qp = js = 0.0
    for _, cs, ca in sorted(ref):
        p = (cs + 1.0) / (ns + k)
        q = (ca + 1.0) / (na + k)
        m = (p + q) / 2.0
        kl_pq += p * (math.log(p) - math.log(q))
        kl_qp += q * (math.log(q) - math.log(p))
        js += 0.5 * p * (math.log(p) - math.log(m)) + 0.5 * q * (
            math.log(q) - math.log(m)
        )
    (r,) = _rows(spark, "q_ml_kl_divergence")
    assert r["ns"] == ns and r["na"] == na
    assert abs(r["kl_pq_nats"] - kl_pq) <= TOL
    assert abs(r["kl_qp_nats"] - kl_qp) <= TOL
    assert abs(r["js_nats"] - js) <= TOL
    # Gibbs' inequality + JS bound
    assert r["kl_pq_nats"] >= -1e-12 and r["kl_qp_nats"] >= -1e-12
    assert -1e-12 <= r["js_nats"] <= math.log(2.0) + 1e-12


def test_mutual_information_matches_libm(spark):
    import duckdb

    ref = duckdb.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) FROM"
        f" read_parquet('{SF}/lineitem.parquet') GROUP BY 1, 2"
    ).fetchall()
    n = sum(r[2] for r in ref)
    cx = Counter()
    cy = Counter()
    for rf, ls, c in ref:
        cx[rf] += c
        cy[ls] += c
    mi = sum(
        c / n * (math.log(c / n) - math.log(cx[rf] / n) - math.log(cy[ls] / n))
        for rf, ls, c in sorted(ref)
    )
    (r,) = _rows(spark, "q_ml_mutual_information")
    assert r["n"] == n
    assert abs(r["mi_nats"] - mi) <= TOL
    assert r["mi_nats"] >= -1e-12  # MI is non-negative
    # G is exactly 2*N*MI of the SAME double, not a re-derivation
    assert r["g_stat"] == 2.0 * float(n) * r["mi_nats"]


def test_log_loss_matches_libm(spark):
    import duckdb

    ref = duckdb.sql(
        "SELECT CAST(user_id % 16 AS BIGINT),"
        " COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), COUNT(*)"
        f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).fetchall()
    nt = sum(r[2] for r in ref)
    npos = sum(r[1] for r in ref)
    s = 0.0
    for _, cp, n in sorted(ref):
        p = (cp + 1.0) / (n + 2.0)
        s += cp * math.log(p) + (n - cp) * math.log(1.0 - p)
    (r,) = _rows(spark, "q_ml_log_loss")
    assert r["n_events"] == nt and r["n_pos"] == npos
    assert abs(r["log_loss_nats"] - (-s / nt)) <= TOL
    assert r["log_loss_nats"] >= 0.0


def _tokenize(text):
    t = text.strip()
    return [w for w in t.split() if w] if t else []


def test_pmi_collocations_match_libm(spark):
    docs = _pq("documents")
    uni = Counter()
    big = Counter()
    for row in docs:
        tk = _tokenize(row[1])
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
    tu, tb = sum(uni.values()), sum(big.values())
    pmi = {
        (w1, w2): math.log(c / tb)
        - math.log(uni[w1] / tu)
        - math.log(uni[w2] / tu)
        for (w1, w2), c in big.items()
        if c >= 5
    }
    rows = _rows(spark, "q_text_pmi_collocations")
    assert len(rows) == min(20, len(pmi))
    floor = sorted(pmi.values(), reverse=True)[len(rows) - 1]
    for r in rows:
        key = (r["w1"], r["w2"])
        assert key in pmi
        assert abs(r["pmi_nats"] - pmi[key]) <= TOL
        assert r["pair_count"] == big[key]
        assert r["pmi_nats"] >= floor - TOL  # genuinely the top-k


def test_unigram_surprisal_matches_libm(spark):
    docs = _pq("documents")
    uni = Counter()
    toks = {}
    for row in docs:
        tk = _tokenize(row[1])
        if tk:
            toks[row[0]] = tk
            uni.update(tk)
    tu = sum(uni.values())
    surp = {
        d: -sum(math.log(uni[w] / tu) for w in tk) / len(tk)
        for d, tk in toks.items()
    }
    rows = _rows(spark, "q_text_unigram_surprisal")
    assert len(rows) == min(10, len(surp))
    floor = sorted(surp.values(), reverse=True)[len(rows) - 1]
    for r in rows:
        assert abs(r["surprisal_nats"] - surp[r["doc_id"]]) <= TOL
        assert r["n_tokens"] == len(toks[r["doc_id"]])
        assert r["surprisal_nats"] >= floor - TOL
