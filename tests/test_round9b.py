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


# -- qsum: the portable full-precision sum lane (round-9 finding) -------------


def test_decimal38_6_cast_diverges_and_qsum_does_not(spark):
    """Pin the defect that motivated qsum: Spark and DuckDB DISAGREE on
    CAST(double AS DECIMAL(38,6)) for full-precision doubles (Spark
    rounds the exact binary expansion; DuckDB multiplies by 1e6 in
    double first), and the divergence probability grows with the
    magnitude. The three values below diverged live while building
    q_text_unigram_kl_drift. qsum's floor-quantized lane must agree
    exactly on the same inputs."""
    import duckdb as _duck

    from pyspark.sql import functions as F

    from mini_etl_project_spark.queries.helpers import qsum, sql_qsum

    vals = [-993206437.4916865, -979596873.7373894, 3255578541.5489306]
    con = _duck.connect()
    n_div = 0
    for v in vals:
        srow = (
            spark.range(1)
            .select(F.lit(v).cast("decimal(38,6)").cast("string"))
            .collect()[0][0]
        )
        drow = con.sql(
            f"SELECT CAST(CAST('{v!r}' AS DOUBLE) AS DECIMAL(38,6))"
        ).fetchone()[0]
        from decimal import Decimal

        if Decimal(srow) != Decimal(str(drow)):
            n_div += 1
    assert n_div == 3, "expected all three known values to diverge"

    # qsum agrees bit-for-bit on in-domain full-precision inputs (term
    # domain |x| < 1e6 — Spark's BIGINT floor() wraps past 2^63, so the
    # lane is NULL-poisoned outside; the same three mantissas scaled
    # down, signs preserved)
    small = [v / 1e6 for v in vals]
    df = spark.createDataFrame([(v,) for v in small], "x double")
    sgot = df.agg(qsum("x", "s")).collect()[0]["s"]
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"(CAST('{v!r}' AS DOUBLE))" for v in small)
        + ") q(x)"
    )
    dgot = con.sql(f"SELECT {sql_qsum('x', 's')} FROM t").fetchone()[0]
    assert repr(sgot) == repr(dgot)
    ref = sum(float(math.floor(v * 1e12)) for v in small) / 1e12
    assert abs(sgot - ref) < 1e-6 * max(abs(ref), 1.0)

    # a domain escape poisons the sum to NULL in BOTH engines
    df2 = spark.createDataFrame([(small[0],), (vals[0],)], "x double")
    sgot2 = df2.agg(qsum("x", "s")).collect()[0]["s"]
    con.execute(
        "CREATE TABLE t2 AS SELECT * FROM (VALUES "
        f"(CAST('{small[0]!r}' AS DOUBLE)), (CAST('{vals[0]!r}' AS DOUBLE))"
        ") q(x)"
    )
    dgot2 = con.sql(f"SELECT {sql_qsum('x', 's')} FROM t2").fetchone()[0]
    assert sgot2 is None and dgot2 is None


def test_zipf_fit_matches_libm(spark):
    docs = _pq("documents")
    uni = Counter()
    for row in docs:
        uni.update(_tokenize(row[1]))
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    xs = [math.log(r) for r in range(1, len(top) + 1)]
    ys = [math.log(f) for _, f in top]
    k = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    r2 = (k * sxy - sx * sy) ** 2 / ((k * sxx - sx * sx) * (k * syy - sy * sy))
    (r,) = _rows(spark, "q_text_zipf_fit")
    assert r["k_ranks"] == k
    assert abs(r["zipf_slope"] - slope) <= 1e-8
    assert abs(r["zipf_r2"] - r2) <= 1e-8
    assert r["zipf_slope"] < 0  # frequency falls with rank


def test_unigram_kl_drift_matches_libm(spark):
    docs = _pq("documents")
    cp = Counter()
    cq = Counter()
    for row in docs:
        (cp if row[0] % 2 == 0 else cq).update(_tokenize(row[1]))
    vocab = sorted(set(cp) | set(cq))
    v = len(vocab)
    np_, nq_ = sum(cp.values()), sum(cq.values())
    kl = tv = 0.0
    for w in vocab:
        p = (cp[w] + 1.0) / (np_ + v)
        q = (cq[w] + 1.0) / (nq_ + v)
        kl += p * (math.log(p) - math.log(q))
        tv += abs(p - q)
    (r,) = _rows(spark, "q_text_unigram_kl_drift")
    assert r["vocab_union"] == v and r["np"] == np_ and r["nq"] == nq_
    # qsum quantizes at 1e-12/term; vocab-sized corpus keeps it ~1e-9
    assert abs(r["kl_pq_nats"] - kl) <= 1e-6
    assert abs(r["tvd"] - 0.5 * tv) <= 1e-6
    assert r["kl_pq_nats"] >= -1e-12 and 0.0 <= r["tvd"] <= 1.0


def test_aic_bic_matches_libm(spark):
    import duckdb

    n, sx, sy, sxx, sxy, syy = duckdb.sql(
        "SELECT COUNT(*), SUM(x), SUM(y), SUM(x*x), SUM(x*y), SUM(y*y)"
        " FROM (SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,"
        " CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y"
        f" FROM read_parquet('{SF}/lineitem.parquet'))"
    ).fetchone()
    dxx = sxx * n - sx * sx
    dxy = sxy * n - sx * sy
    dyy = syy * n - sy * sy
    mse0 = dyy / n**2
    mse1 = (dxx * dyy - dxy * dxy) / (n**2 * dxx)
    (r,) = _rows(spark, "q_ml_aic_bic")
    assert r["n"] == n
    assert abs(r["mse0"] - mse0) <= 1e-6 * mse0
    assert abs(r["mse1"] - mse1) <= 1e-6 * mse1
    assert abs(r["aic0"] - (n * math.log(mse0) + 2)) <= 1e-6 * abs(r["aic0"])
    assert abs(r["bic1"] - (n * math.log(mse1) + 2 * math.log(n))) <= 1e-6 * abs(
        r["bic1"]
    )
    # the 1-predictor model must fit at least as well as the null
    assert r["mse1"] <= r["mse0"] + 1e-12


def test_odds_ratio_matches_libm(spark):
    import duckdb

    a, b, c2, d = duckdb.sql(
        "SELECT COUNT(CASE WHEN l_quantity > 25 AND l_returnflag = 'R' THEN 1 END),"
        " COUNT(CASE WHEN l_quantity > 25 AND l_returnflag <> 'R' THEN 1 END),"
        " COUNT(CASE WHEN l_quantity <= 25 AND l_returnflag = 'R' THEN 1 END),"
        " COUNT(CASE WHEN l_quantity <= 25 AND l_returnflag <> 'R' THEN 1 END)"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()
    ln_or = (math.log(a) + math.log(d)) - (math.log(b) + math.log(c2))
    se = math.sqrt(1 / a + 1 / b + 1 / c2 + 1 / d)
    (r,) = _rows(spark, "q_ml_odds_ratio")
    assert (r["a"], r["b"], r["c2"], r["d"]) == (a, b, c2, d)
    assert abs(r["ln_or"] - ln_or) <= 1e-9
    assert abs(r["se_ln_or"] - se) <= 1e-12
    assert r["ci_lo_ln"] <= r["ln_or"] <= r["ci_hi_ln"]


def test_info_gain_matches_libm(spark):
    import duckdb

    rows = duckdb.sql(
        "SELECT o_orderpriority, CAST(EXTRACT(MONTH FROM o_orderdate) AS VARCHAR),"
        " o_orderstatus, CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    n = len(rows)

    def H(counter):
        t = sum(counter.values())
        return -sum(c / t * math.log(c / t) for c in counter.values())

    ylab = Counter(r[3] for r in rows)
    hy = H(ylab)
    got = {r["feature"]: r for r in _rows(spark, "q_ml_info_gain_ranking")}
    for fi, feat in ((0, "priority"), (1, "month"), (2, "status")):
        groups: dict = {}
        for r in rows:
            groups.setdefault(r[fi], Counter())[r[3]] += 1
        cond = sum(
            sum(cnt.values()) / n * H(cnt) for cnt in groups.values()
        )
        g = got[feat]
        assert g["n_values"] == len(groups)
        assert abs(g["cond_entropy_nats"] - cond) <= 1e-9
        assert abs(g["info_gain_nats"] - (hy - cond)) <= 1e-9
        assert g["info_gain_nats"] >= -1e-12  # IG is non-negative
