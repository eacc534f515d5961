"""Round-7 session-3 additions: Fleiss' kappa (X401), mixture drift
(X402), HHI concentration (X403), Poisson bootstrap (X404), and the
Jaro-Winkler UDF (X405) — Python replays, statistical invariants, and
DuckDB-builtin parity."""

from __future__ import annotations

import itertools
import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from conftest import half_up
from mini_etl_project_spark.queries.functions_q import (
    _jaro_winkler,
    q_fn_jaro_winkler,
)
from mini_etl_project_spark.queries.corpus_q import q_corpus_mixture_drift
from mini_etl_project_spark.queries.misc_q import q_agg_hhi
from mini_etl_project_spark.queries.ml_q import q_ml_fleiss_kappa
from mini_etl_project_spark.queries.sampling_q import (
    _PB_B,
    _PB_THRESH,
    q_sample_poisson_bootstrap,
)


def test_fleiss_kappa_python_replay(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_returnflag")
        .collect()
    )
    by_subj: dict[int, Counter] = defaultdict(Counter)
    for r in rows:
        by_subj[r["l_orderkey"]][r["l_returnflag"]] += 1
    kept = {k: c for k, c in by_subj.items() if sum(c.values()) == 3}
    n = len(kept)
    a_pairs = sum(
        v * (v - 1) for c in kept.values() for v in c.values()
    )
    cat: Counter = Counter()
    for c in kept.values():
        cat.update(c)
    p_bar = a_pairs / (n * 3 * 2)
    p_e = sum(v * v for v in cat.values()) / ((n * 3) ** 2)
    kappa = (p_bar - p_e) / (1.0 - p_e)

    got = q_ml_fleiss_kappa(spark, sf_dir).collect()[0]
    assert got["n_subjects"] == n
    assert got["n_raters"] == 3
    assert got["a_pairs"] == a_pairs
    assert got["p_bar"] == pytest.approx(p_bar, abs=1e-12)
    assert got["p_e"] == pytest.approx(p_e, abs=1e-12)
    assert got["kappa"] == pytest.approx(kappa, abs=1e-10)
    # agreement is bounded: kappa <= 1, p_bar and p_e are probabilities
    assert 0.0 <= got["p_bar"] <= 1.0 and 0.0 <= got["p_e"] <= 1.0
    assert got["kappa"] <= 1.0


def test_mixture_drift_invariants_and_replay(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    a: Counter = Counter()
    b: Counter = Counter()
    for r in rows:
        (a if r["doc_id"] % 2 == 0 else b)[r["source"]] += 1
    at, bt = sum(a.values()), sum(b.values())
    srcs = sorted(set(a) | set(b))
    tv = sum(abs(a[s] * bt - b[s] * at) for s in srcs) / (2.0 * at * bt)
    bh = sum(math.sqrt(a[s] * b[s]) for s in srcs) / math.sqrt(at * bt)

    got = q_corpus_mixture_drift(spark, sf_dir).collect()[0]
    assert got["a_tot"] == at and got["b_tot"] == bt
    assert got["k_sources"] == len(srcs)
    assert got["tv_dist"] == pytest.approx(tv, abs=1e-12)
    assert got["bh_affinity"] == pytest.approx(bh, abs=1e-9)
    # metric bounds: 0 <= TV <= 1, 0 <= BC <= 1, H^2 = 1 - BC,
    # and Hellinger^2 <= TV <= Hellinger*sqrt(2) (standard inequalities)
    assert 0.0 <= got["tv_dist"] <= 1.0
    assert 0.0 <= got["bh_affinity"] <= 1.0 + 1e-12
    h = got["hellinger"]
    assert h * h <= got["tv_dist"] + 1e-12
    assert got["tv_dist"] <= h * math.sqrt(2.0) + 1e-12


def test_hhi_python_replay_and_bounds(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey", "l_extendedprice")
        .collect()
    )
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    firm: Counter = Counter()
    for r in li:
        firm[(sup[r["l_suppkey"]], r["l_suppkey"])] += half_up(
            r["l_extendedprice"], 100
        )
    mkt: dict[int, list[int]] = defaultdict(list)
    for (nk, _), c in firm.items():
        mkt[nk].append(c)
    got = {r["market"]: r for r in q_agg_hhi(spark, sf_dir).collect()}
    assert len(got) == len(mkt)
    for nk, cs in mkt.items():
        row = got[nat[nk]]
        tot = sum(cs)
        hhi = sum(c * c for c in cs) * 10000.0 / (tot * tot)
        assert row["n_firms"] == len(cs)
        assert row["tot_cents"] == tot
        assert row["hhi_bp"] == pytest.approx(hhi, rel=1e-12)
        assert row["cr1_ppm"] == pytest.approx(
            max(cs) * 1e6 / tot, rel=1e-12
        )
        # bounds: 10000/n <= HHI <= 10000; CR1 >= 1/n share
        assert 10000.0 / len(cs) - 1e-9 <= row["hhi_bp"] <= 10000.0 + 1e-9
        assert row["cr1_ppm"] >= 1e6 / len(cs) - 1e-6


def test_poisson_bootstrap_weights_and_replay(spark, sf_dir):
    import hashlib

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .collect()
    )

    def weight(b: int, key: str) -> int:
        h = hashlib.md5(f"pb{b}:{key}".encode()).hexdigest()[:15]
        u = int(h, 16) % 1000000
        for k, t in enumerate(_PB_THRESH):
            if u < t:
                return k
        return len(_PB_THRESH)

    means = []
    for b in range(_PB_B):
        sw = swx = 0
        for r in rows:
            k = f"{r['l_orderkey']}:{r['l_linenumber']}"
            w = weight(b, k)
            sw += w
            swx += w * half_up(r["l_extendedprice"], 100)
        means.append(swx / sw)
    boot_mean = sum(means) / _PB_B
    boot_se = math.sqrt(
        sum((m - boot_mean) ** 2 for m in means) / (_PB_B - 1)
    )

    got = q_sample_poisson_bootstrap(spark, sf_dir).collect()[0]
    assert got["n"] == len(rows)
    for b in range(_PB_B):
        assert got[f"m{b}"] == pytest.approx(means[b], rel=1e-12)
    assert got["boot_mean"] == pytest.approx(boot_mean, rel=1e-12)
    assert got["boot_se"] == pytest.approx(boot_se, rel=1e-9)
    # the SE of the mean should be near sigma/sqrt(n): sanity band only
    assert 0.0 < got["boot_se"] < got["boot_mean"]


def test_poisson_bootstrap_single_pass_no_explode(spark, sf_dir):
    """All 8 replicates ride one aggregate over one scan — the plan must
    contain no Generate/Expand (explode) node and exactly one lineitem
    scan."""
    df = q_sample_poisson_bootstrap(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan and "Expand" not in plan
    assert plan.count("Scan parquet") == 1


def test_jaro_winkler_duckdb_builtin_parity():
    """The UDF's kernel must match DuckDB's native implementation
    bit-for-bit, including the short-string edge cases that separate
    textbook variants (empty->0, window clamp at 0)."""
    import duckdb
    import random

    rng = random.Random(42)
    words = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(0, 6)))
        for _ in range(120)
    ]
    pairs = list(itertools.combinations(words, 2))[:4000]
    pairs += [("", ""), ("e", "e"), ("ab", "ba"), ("martha", "marhta"),
              ("DWAYNE", "DUANE"), ("CA", "ABC"), ("x", ""), ("", "x"),
              # non-ASCII: DuckDB walks UTF-8 BYTES, and so must we
              ("café", "cafe"), ("héllo", "hello"),
              ("naïve", "naive"), ("日本語", "日本"),
              ("ß", "ss"), ("ñño", "nno")]
    con = duckdb.connect()
    for x, y in pairs:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [x, y]
        ).fetchone()[0]
        assert _jaro_winkler(x, y) == want, (x, y)


def test_jaro_winkler_metric_properties(spark, sf_dir):
    got = q_fn_jaro_winkler(spark, sf_dir)
    rows = got.collect()
    assert 0 < len(rows) <= 2000  # sf-dependent: partkey <= 2000 filter
    for r in rows:
        assert 0.0 <= r["jw_vowel_swap"] <= 1.0
        assert 0.0 <= r["jw_brand_type"] <= 1.0
    probe = rows[0]
    assert probe["jw_probe_empty"] == 0.0
    assert probe["jw_probe_single"] == 1.0
    assert probe["jw_probe_classic"] == pytest.approx(0.9611111111111111)
    assert probe["jw_probe_boost"] == pytest.approx(0.8400000000000001)


# -- X406-X409 --------------------------------------------------------------


def test_rrf_fusion_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.similarity_q import (
        _RRF_DEPTH,
        _RRF_K,
        _RRF_TOKENS,
        q_sim_rrf_fusion,
    )

    docs = [
        (r["doc_id"], r["text"], r["n_chars"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    lex = sorted(
        (
            -sum(
                1 for t in _RRF_TOKENS if f" {t} " in f" {txt} "
            ),
            did,
        )
        for did, txt, _ in docs
    )
    ra = {did: i + 1 for i, (_, did) in enumerate(lex) if i < _RRF_DEPTH}
    ln = sorted((-nc, did) for did, _, nc in docs)
    rb = {did: i + 1 for i, (_, did) in enumerate(ln) if i < _RRF_DEPTH}
    fused = {}
    for did in set(ra) | set(rb):
        s = 0.0
        if did in ra:
            s += 1.0 / (_RRF_K + ra[did])
        if did in rb:
            s += 1.0 / (_RRF_K + rb[did])
        fused[did] = s
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = {
        r["doc_id"]: (r["rank_lex"], r["rank_len"], r["fused_rank"])
        for r in q_sim_rrf_fusion(spark, sf_dir).collect()
    }
    assert set(got) == {d for d, _ in top}
    for i, (did, _) in enumerate(top):
        assert got[did][2] == i + 1
        assert got[did][0] == ra.get(did)
        assert got[did][1] == rb.get(did)


def test_did_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_did

    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    micros = [int(r["ts"].timestamp() * 1e6) for r in rows]
    # timestamps are tz-naive UTC; reconstruct micros robustly
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    micros = [
        (r["ts"] - epoch) // datetime.timedelta(microseconds=1)
        for r in rows
    ]
    mid = (min(micros) + max(micros)) // 2
    cells = {}
    for r, us in zip(rows, micros):
        key = (r["user_id"] % 2 == 1, us < mid)
        n, s = cells.get(key, (0, 0))
        cells[key] = (n + 1, s + half_up(r["value"], 100))
    m = {k: s / n for k, (n, s) in cells.items()}
    want = (m[(True, False)] - m[(True, True)]) - (
        m[(False, False)] - m[(False, True)]
    )
    got = q_ml_did(spark, sf_dir).collect()[0]
    assert got["n_t_pre"] == cells[(True, True)][0]
    assert got["n_c_post"] == cells[(False, False)][0]
    assert got["did_cents"] == pytest.approx(want, abs=1e-9)


def test_dispersion_replay_and_accounting(spark, sf_dir):
    from mini_etl_project_spark.queries.misc_q import q_agg_dispersion

    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per = defaultdict(Counter)
    hours = set()
    for r in rows:
        hr = r["ts"].replace(minute=0, second=0, microsecond=0)
        hours.add(hr)
        per[r["event_type"]][hr] += 1
    got = {r["event_type"]: r for r in q_agg_dispersion(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for et, cnt in per.items():
        cs = [cnt.get(h, 0) for h in hours]
        n = len(cs)
        mean = sum(cs) / n
        var = sum((c - mean) ** 2 for c in cs) / (n - 1)
        row = got[et]
        assert row["n_hours"] == n
        assert row["n_events"] == sum(cs)
        assert row["mean_per_hour"] == pytest.approx(mean, rel=1e-12)
        assert row["var_per_hour"] == pytest.approx(var, rel=1e-9)
        assert row["vmr"] == pytest.approx(var / mean, rel=1e-9)
        assert row["overdispersed"] == (1 if var / mean > 1.5 else 0)
    # the spine accounting: every type sees the same hour count
    assert len({r["n_hours"] for r in got.values()}) == 1


def test_cooks_distance_flags_match_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_cooks_distance

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice")
        .collect()
    )
    pts = [
        (r["l_orderkey"], r["l_linenumber"], half_up(r["l_quantity"]),
         half_up(r["l_extendedprice"], 100))
        for r in rows
    ]
    n = len(pts)
    sx = sum(p[2] for p in pts)
    sy = sum(p[3] for p in pts)
    sxx = sum(p[2] * p[2] for p in pts)
    sxy = sum(p[2] * p[3] for p in pts)
    syy = sum(p[3] * p[3] for p in pts)
    sxx_c = sxx - sx * sx / n
    sxy_c = sxy - sx * sy / n
    syy_c = syy - sy * sy / n
    b = sxy_c / sxx_c
    a = sy / n - b * sx / n
    s2 = (syy_c - b * sxy_c) / (n - 2)
    want = {}
    for ok, ln, x, y in pts:
        h = 1.0 / n + (x - sx / n) ** 2 / sxx_c
        e = y - a - b * x
        d = e * e * h / (2.0 * s2 * (1.0 - h) ** 2)
        if d > 4.0 / n:
            want[(ok, ln)] = d
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r
        for r in q_ml_cooks_distance(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, d in want.items():
        assert got[k]["cook_d"] == pytest.approx(d, rel=1e-9)
        assert 0.0 < got[k]["leverage"] < 1.0
        assert got[k]["cook_d"] > 0.0


def test_cooks_distance_plan_is_scan_plus_broadcast(spark, sf_dir):
    """Influence scoring must stay a stateless per-row expression: no
    Window, no Sort over the fact table — one moment aggregate broadcast
    back onto the scan."""
    from mini_etl_project_spark.queries.ml_q import q_ml_cooks_distance

    plan = (
        q_ml_cooks_distance(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# -- X410-X413 --------------------------------------------------------------


def test_dist_match_replay_and_flattening(spark, sf_dir):
    import hashlib

    from mini_etl_project_spark.queries.sampling_q import (
        _DM_BUCKETS,
        _DM_WIDTH,
        q_sample_dist_match,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    buckets = defaultdict(list)
    for r in docs:
        b = min(r["n_chars"] // _DM_WIDTH, _DM_BUCKETS - 1)
        buckets[b].append(r["doc_id"])
    n = len(docs)
    got = {r["bucket"]: r for r in q_sample_dist_match(spark, sf_dir).collect()}
    assert set(got) == set(buckets)
    for b, ids in buckets.items():
        ppm = min(1000000, (1000000 * n) // (_DM_BUCKETS * len(ids)))
        kept = sum(
            1
            for d in ids
            if int(hashlib.md5(f"dm:{d}".encode()).hexdigest()[:15], 16)
            % 1000000
            < ppm
        )
        row = got[b]
        assert row["n_b"] == len(ids)
        assert row["accept_ppm"] == ppm
        assert row["n_kept"] == kept
        assert row["n_kept"] <= row["n_b"]
    # the resample must flatten the distribution: post-TV-to-uniform
    # strictly below pre-TV-to-uniform (uniform target share = n/10)
    pre = sum(abs(len(ids) - n / _DM_BUCKETS) for ids in buckets.values())
    tot_kept = sum(r["n_kept"] for r in got.values())
    post = sum(
        abs(r["n_kept"] - tot_kept / _DM_BUCKETS) for r in got.values()
    )
    assert post / max(tot_kept, 1) < pre / n


def test_neighbor_agg_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.iterative_q import (
        _NEIGH_CUST,
        q_graph_neighbor_agg,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    edges = [
        (orders[r["l_orderkey"]], r["l_partkey"], half_up(r["l_quantity"]))
        for r in li
    ]
    pf = defaultdict(lambda: [0, 0])
    for _, pk, q in edges:
        pf[pk][0] += 1
        pf[pk][1] += q
    ppm = {pk: (1000000 * s) // c for pk, (c, s) in pf.items()}
    cust = defaultdict(lambda: [0, 0, 0])
    for ck, pk, q in edges:
        if ck <= _NEIGH_CUST:
            cust[ck][0] += 1
            cust[ck][1] += q
            cust[ck][2] += ppm[pk]
    got = {r["ck"]: r for r in q_graph_neighbor_agg(spark, sf_dir).collect()}
    assert set(got) == set(cust)
    for ck, (ne, own, hop2) in cust.items():
        row = got[ck]
        assert row["n_edges"] == ne
        assert row["hop1_mean_qty"] == pytest.approx(own / ne, rel=1e-12)
        assert row["hop2_mean_qty"] == pytest.approx(
            hop2 / (ne * 1e6), rel=1e-12
        )


def test_rr_private_counts_debias_identity(spark, sf_dir):
    from mini_etl_project_spark.queries.etl_q import (
        q_quality_rr_private_counts,
    )

    rows = q_quality_rr_private_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the debias identity is definitional
        assert r["est_x2"] == 4 * r["reported_count"] - r["n"]
        assert r["abs_err_x2"] == abs(r["est_x2"] - 2 * r["true_count"])
        # with a deterministic fair-ish 1/4 coin the estimate must land
        # within a loose concentration band of the truth
        assert r["abs_err_x2"] <= max(200, r["n"] // 4)


def test_position_attribution_conserves_credit(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import (
        q_ml_position_attribution,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    conv = {}
    for r in ev:
        if r["event_type"] == "purchase":
            t = conv.get(r["user_id"])
            if t is None or r["ts"] < t:
                conv[r["user_id"]] = r["ts"]
    journeys = defaultdict(list)
    for r in ev:
        t = conv.get(r["user_id"])
        if (
            t is not None
            and r["event_type"] != "purchase"
            and r["ts"] <= t
        ):
            journeys[r["user_id"]].append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    per_channel = Counter()
    n_journeys = 0
    for _, touches in journeys.items():
        touches.sort()
        k = len(touches)
        n_journeys += 1
        for i, (_, _, ch) in enumerate(touches, start=1):
            if k == 1:
                c = 1000000
            elif k == 2:
                c = 500000
            elif i == 1 or i == k:
                c = 400000
            elif i == 2:
                c = 200000 // (k - 2) + 200000 % (k - 2)
            else:
                c = 200000 // (k - 2)
            per_channel[ch] += c
    got = {
        r["channel"]: r
        for r in q_ml_position_attribution(spark, sf_dir).collect()
    }
    assert set(got) == set(per_channel)
    for ch, c in per_channel.items():
        assert got[ch]["credit_ppm_sum"] == c
    # per-journey credits sum to exactly 1e6 -> global conservation
    assert sum(per_channel.values()) == 1000000 * n_journeys
    assert (
        sum(r["credit_ppm_sum"] for r in got.values())
        == 1000000 * n_journeys
    )


# -- X414-X417 --------------------------------------------------------------


def test_ipf_raking_margins_converge(spark, sf_dir):
    from mini_etl_project_spark.queries.etl_q import q_etl_ipf_raking

    rows = q_etl_ipf_raking(spark, sf_dir).collect()
    assert rows
    # reconstruct reference margins straight from the fixtures
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r["o_orderpriority"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    ref_r, ref_c = Counter(), Counter()
    samp = Counter()
    for r in li:
        p = orders[r["l_orderkey"]]
        if r["l_orderkey"] % 2 == 0:
            ref_r[p] += 1
            ref_c[r["l_returnflag"]] += 1
        else:
            samp[(p, r["l_returnflag"])] += 1
    # sample counts must round-trip
    for r in rows:
        assert r["n_sample"] == samp[(r["p"], r["f"])]
    # after the final column step, column margins match targets EXACTLY
    # (up to float addition error) and row margins are close
    col = defaultdict(float)
    row = defaultdict(float)
    for r in rows:
        col[r["f"]] += r["w_raked"]
        row[r["p"]] += r["w_raked"]
    for f, s in col.items():
        assert s == pytest.approx(ref_c[f], rel=1e-9)
    for p, s in row.items():
        assert s == pytest.approx(ref_r[p], rel=0.05)  # converging
    # total mass = reference total
    assert sum(col.values()) == pytest.approx(sum(ref_c.values()), rel=1e-9)


def test_silhouette_matches_bruteforce_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import (
        _ITERS,
        _K,
        q_ml_silhouette,
    )
    from mini_etl_project_spark.operators.kmeans import lloyd_fixed_point

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assign, cents = lloyd_fixed_point(
        emb, "vec_id", "embedding", k=_K, iters=_ITERS
    )
    pts = {
        r["vec_id"]: [round(float(v) * 1000) * 1000 for v in r["embedding"]]
        for r in emb.collect()
    }
    cs = {r["cid"]: r["carr"] for r in cents.collect()}
    per_cluster = defaultdict(list)
    for vid, v in pts.items():
        dists = {
            cid: sum((a - b) ** 2 for a, b in zip(v, c))
            for cid, c in cs.items()
        }
        own = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
        others = [d for cid, d in dists.items() if cid != own[0]]
        b = min(others)
        a = own[1]
        s = 0 if b == 0 else ((b - a) * 1000000) // b
        per_cluster[own[0]].append(s)
    got = {r["cid"]: r for r in q_ml_silhouette(spark, sf_dir).collect()}
    assert set(got) == set(per_cluster)
    for cid, ss in per_cluster.items():
        row = got[cid]
        assert row["n_members"] == len(ss)
        assert row["mean_s_ppm"] == sum(ss) // len(ss)
        assert row["min_s_ppm"] == min(ss)
        assert row["max_s_ppm"] == max(ss)
        # silhouette is bounded in [-1e6, 1e6]
        assert -1000000 <= row["min_s_ppm"] <= row["max_s_ppm"] <= 1000000


def test_double_ml_theta_sane_and_folds_consistent(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import _DML_K, q_ml_double_ml

    rows = q_ml_double_ml(spark, sf_dir).collect()
    assert len(rows) == _DML_K
    thetas = {r["theta"] for r in rows}
    assert len(thetas) == 1  # global estimate repeated per fold row
    theta = thetas.pop()
    # discount bp ~ U(0,1000); cents = qty*price*(1+-..); the partial
    # effect of 1bp of discount on cents is economically negative-or-
    # small; the key sanity is that |theta| is finite and the den > 0
    assert all(r["den_k"] > 0 for r in rows)
    import math as _m

    assert _m.isfinite(theta)
    # cross-fit folds were hash-balanced
    ns = [r["n_fold"] for r in rows]
    assert max(ns) - min(ns) < 0.2 * (sum(ns) / len(ns))


def test_double_ml_matches_global_partialling_out(spark, sf_dir):
    """With homogeneous folds the cross-fit theta must land near the
    plain (non-cross-fit) partialling-out estimate computed in numpy."""
    import numpy as np

    from mini_etl_project_spark.queries.ml_q import q_ml_double_ml

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_extendedprice", "l_discount")
        .collect()
    )
    x = np.array([half_up(r["l_quantity"]) for r in li], dtype=float)
    y = np.array([half_up(r["l_extendedprice"], 100) for r in li], dtype=float)
    d = np.array([half_up(r["l_discount"], 10000) for r in li], dtype=float)
    br = np.polyfit(x, y, 1)
    bd = np.polyfit(x, d, 1)
    ry = y - np.polyval(br, x)
    rd = d - np.polyval(bd, x)
    ref = float(ry @ rd / (rd @ rd))
    theta = q_ml_double_ml(spark, sf_dir).collect()[0]["theta"]
    assert theta == pytest.approx(ref, rel=0.05)


def test_qte_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_qte

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    groups = {0: [], 1: []}
    for r in li:
        t = 1 if r["l_discount"] >= 0.06 else 0
        groups[t].append(
            (half_up(r["l_extendedprice"], 100), r["l_orderkey"],
             r["l_linenumber"])
        )
    import math as _m

    def disc(vals, p):
        vals = sorted(vals)
        return vals[_m.ceil(p * len(vals)) - 1][0]

    got = q_ml_qte(spark, sf_dir).collect()[0]
    assert got["n_treated"] == len(groups[1])
    assert got["n_control"] == len(groups[0])
    for p, col in ((0.25, "qte_p25"), (0.5, "qte_p50"), (0.75, "qte_p75")):
        assert got[col] == disc(groups[1], p) - disc(groups[0], p)


# -- X418-X421 --------------------------------------------------------------


def test_forecast_metrics_python_replay(spark, sf_dir):
    import datetime

    from mini_etl_project_spark.queries.timeseries_q import (
        q_ts_forecast_metrics,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    h = Counter()
    for r in ev:
        h[(r["event_type"], r["ts"].replace(minute=0, second=0,
                                            microsecond=0))] += 1
    per = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])
    for (et, hr), c in h.items():
        prev24 = h.get((et, hr - datetime.timedelta(hours=24)))
        if prev24 is not None:
            st = per[et]
            st[0] += 1                    # n
            st[1] += abs(c - prev24)      # sum_abs_e
            if c > 0:
                st[2] += (abs(c - prev24) * 1000000) // c
                st[3] += 1                # n_pos
            if c + prev24 > 0:
                st[4] += (abs(c - prev24) * 2000000) // (c + prev24)
        prev1 = h.get((et, hr - datetime.timedelta(hours=1)))
        if prev1 is not None:
            per[et][5] += abs(c - prev1)  # sum_e1
            per[et][6] += 1               # n1
    got = {r["event_type"]: r
           for r in q_ts_forecast_metrics(spark, sf_dir).collect()}
    assert set(got) == {k for k, v in per.items() if v[0] and v[6]}
    for et, (n, sae, sape, npos, ssape, se1, n1) in per.items():
        if not n or not n1:
            continue
        row = got[et]
        assert row["n"] == n
        assert row["mae"] == pytest.approx(sae / n, rel=1e-12)
        assert row["mape_ppm"] == pytest.approx(sape / npos, rel=1e-12)
        assert row["smape_ppm"] == pytest.approx(ssape / n, rel=1e-12)
        assert row["mase"] == pytest.approx(
            (sae / n) / (se1 / n1), rel=1e-12
        )
        # sMAPE is bounded by 2e6 ppm by construction
        assert 0 <= row["smape_ppm"] <= 2000000


def test_iv_wald_replay_and_instrument_balance(spark, sf_dir):
    import hashlib

    from mini_etl_project_spark.queries.ml_q import q_ml_iv_wald

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    cells = {0: [0, 0, 0], 1: [0, 0, 0]}
    for r in li:
        z = int(hashlib.md5(f"iv:{r['l_partkey']}".encode())
                .hexdigest()[:15], 16) % 2
        cells[z][0] += 1
        cells[z][1] += half_up(r["l_extendedprice"], 100)
        cells[z][2] += half_up(r["l_discount"], 10000)
    got = q_ml_iv_wald(spark, sf_dir).collect()[0]
    assert got["n1"] == cells[1][0] and got["n0"] == cells[0][0]
    itt = cells[1][1] / cells[1][0] - cells[0][1] / cells[0][0]
    fs = cells[1][2] / cells[1][0] - cells[0][2] / cells[0][0]
    assert got["itt_y"] == pytest.approx(itt, abs=1e-9)
    assert got["first_stage_d"] == pytest.approx(fs, abs=1e-9)
    assert got["theta_iv"] == pytest.approx(itt / fs, rel=1e-9)
    # hash instrument is ~balanced
    assert abs(got["n1"] - got["n0"]) < 0.1 * (got["n1"] + got["n0"])


def test_rdd_python_replay(spark, sf_dir):
    import numpy as np

    from mini_etl_project_spark.queries.ml_q import (
        _RDD_C,
        _RDD_H,
        q_ml_rdd,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    sides = {"l": [], "r": []}
    for r in li:
        u = half_up(r["l_quantity"]) - _RDD_C
        y = half_up(r["l_extendedprice"], 100)
        if -_RDD_H <= u < 0:
            sides["l"].append((u, y))
        elif 0 <= u <= _RDD_H:
            sides["r"].append((u, y))
    got = q_ml_rdd(spark, sf_dir).collect()[0]
    assert got["n_l"] == len(sides["l"])
    assert got["n_r"] == len(sides["r"])
    fits = {}
    for tag, pts in sides.items():
        us = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        b, a = np.polyfit(us, ys, 1)
        fits[tag] = (a, b)
    assert got["intercept_left"] == pytest.approx(fits["l"][0], rel=1e-9)
    assert got["slope_right"] == pytest.approx(fits["r"][1], rel=1e-6)
    assert got["rdd_effect"] == pytest.approx(
        fits["r"][0] - fits["l"][0], rel=1e-9
    )


def test_wilcoxon_signed_rank_scipy_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_wilcoxon_signed

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        if r["event_type"] == "click":
            per[r["user_id"]][0] += 1
        elif r["event_type"] == "view":
            per[r["user_id"]][1] += 1
    ds = [c - v for c, v in per.values() if c != v]
    n = len(ds)
    # midranks over |d|
    order = sorted(range(n), key=lambda i: abs(ds[i]))
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and abs(ds[order[j]]) == abs(ds[order[i]]):
            j += 1
        mid = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = mid
        i = j
    wplus = sum(r for r, d in zip(ranks, ds) if d > 0)
    got = q_ml_wilcoxon_signed(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert got["w2"] == round(2 * wplus)
    # tie-corrected z
    from collections import Counter as C

    ties = C(abs(d) for d in ds)
    var = n * (n + 1) * (2 * n + 1) / 24.0 - sum(
        t**3 - t for t in ties.values()
    ) / 48.0
    z = (wplus - n * (n + 1) / 4.0) / (var ** 0.5)
    assert got["z_stat"] == pytest.approx(z, rel=1e-9)


# -- X422-X425 --------------------------------------------------------------


def test_friedman_scipy_style_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import (
        _FRIED_TYPES,
        q_ml_friedman,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per = defaultdict(Counter)
    for r in ev:
        per[r["user_id"]][r["event_type"]] += 1
    k = len(_FRIED_TYPES)
    n = len(per)
    rr = [0.0] * k
    sq_sum = 0.0
    for cnts in per.values():
        vals = [cnts.get(t, 0) for t in _FRIED_TYPES]
        ranks = []
        for j, v in enumerate(vals):
            less = sum(1 for w in vals if w < v)
            eq = sum(1 for w in vals if w == v)
            ranks.append(less + (eq + 1) / 2.0)
        for j, r_ in enumerate(ranks):
            rr[j] += r_
            sq_sum += r_ * r_
    num = (k - 1) * sum((rj - n * (k + 1) / 2.0) ** 2 for rj in rr)
    den = sq_sum - n * k * (k + 1) ** 2 / 4.0
    got = q_ml_friedman(spark, sf_dir).collect()[0]
    assert got["n"] == n
    for j in range(k):
        assert got[f"rr{j}"] == round(2 * rr[j])
    assert got["chi2_f"] == pytest.approx(num / den, rel=1e-9)
    # rank-sum identity: sum of all midranks = n*k*(k+1)/2
    assert sum(got[f"rr{j}"] for j in range(k)) == n * k * (k + 1)


def test_granger_matches_numpy_ols(spark, sf_dir):
    import datetime

    import numpy as np

    from mini_etl_project_spark.queries.timeseries_q import q_ts_granger

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    h = defaultdict(lambda: [0, 0])
    for r in ev:
        hr = r["ts"].replace(minute=0, second=0, microsecond=0)
        h[hr]  # every event materializes its hour (zero-count rows too)
        if r["event_type"] == "purchase":
            h[hr][0] += 1
        elif r["event_type"] == "view":
            h[hr][1] += 1
    rows = []
    for hr, (y, x) in h.items():
        prev = h.get(hr - datetime.timedelta(hours=1))
        if prev is not None:
            rows.append((y, prev[0], prev[1]))
    y = np.array([r[0] for r in rows], dtype=float)
    a = np.array([r[1] for r in rows], dtype=float)
    b = np.array([r[2] for r in rows], dtype=float)
    Xr = np.column_stack([np.ones_like(a), a])
    Xu = np.column_stack([np.ones_like(a), a, b])
    sse = lambda X: float(
        ((y - X @ np.linalg.lstsq(X, y, rcond=None)[0]) ** 2).sum()
    )
    sse_r, sse_u = sse(Xr), sse(Xu)
    f_ref = (sse_r - sse_u) / (sse_u / (len(y) - 3))
    got = q_ts_granger(spark, sf_dir).collect()[0]
    assert got["n"] == len(rows)
    assert got["sse_restricted"] == pytest.approx(sse_r, rel=1e-9)
    assert got["sse_unrestricted"] == pytest.approx(sse_u, rel=1e-9)
    assert got["f_granger"] == pytest.approx(f_ref, rel=1e-7)
    # restricted model can never beat the unrestricted
    assert got["sse_unrestricted"] <= got["sse_restricted"] + 1e-9


def test_eb_shrinkage_pulls_toward_mean(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_eb_shrinkage

    rows = q_ml_eb_shrinkage(spark, sf_dir).collect()
    assert rows
    alpha = rows[0]["alpha"]
    beta = rows[0]["beta"]
    assert alpha > 0 and beta > 0
    prior_mean = alpha / (alpha + beta)
    for r in rows:
        raw = r["k"] / r["n"]
        # shrunk rate lies BETWEEN the raw rate and the prior mean
        lo, hi = sorted((raw, prior_mean))
        assert lo - 1e-12 <= r["shrunk_rate"] <= hi + 1e-12
        # and the fewer the observations, the stronger the pull
        assert r["rate_ppm"] == (1000000 * r["k"]) // r["n"]


def test_cochran_q_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_cochran_q

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    micros = lambda ts: int(ts.timestamp() * 1e6)
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    us = {id(r): (r["ts"] - epoch) // datetime.timedelta(microseconds=1)
          for r in ev}
    lo = min(us.values())
    hi = max(us.values())
    span = hi - lo
    per = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        if r["event_type"] != "error":
            per[r["user_id"]]  # ensure user exists
            continue
        off = (us[id(r)] - lo) * 3
        w = 0 if off < span else (1 if off < 2 * span else 2)
        per[r["user_id"]][w] = 1
    got = q_ml_cochran_q(spark, sf_dir).collect()[0]
    assert got["n_users"] == len(per)
    cs = [sum(v[j] for v in per.values()) for j in range(3)]
    assert [got["c1"], got["c2"], got["c3"]] == cs
    den = sum(3 * sum(v) - sum(v) ** 2 for v in per.values())
    if den == 0:
        assert got["q_stat"] is None
    else:
        num = 2 * (3 * sum(c * c for c in cs) - sum(cs) ** 2)
        assert got["q_stat"] == pytest.approx(num / den, rel=1e-12)


# -- X426/X428/X429 ---------------------------------------------------------


def test_logrank_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import (
        _LOGRANK_CENSOR,
        q_ml_logrank,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    subj = []
    for r in li:
        o = orders[r["l_orderkey"]]
        grp = 1 if o["o_orderpriority"] in ("1-URGENT", "2-HIGH") else 0
        lag = (r["l_shipdate"].date() - o["o_orderdate"].date()).days
        t = min(lag, _LOGRANK_CENSOR)
        ev = 1 if lag <= _LOGRANK_CENSOR else 0
        subj.append((grp, t, ev))
    times = sorted({t for _, t, ev in subj if ev})
    oe_sum = v_sum = 0.0
    o1_sum = o_sum = 0
    for t in times:
        o1 = sum(1 for g, tt, ev in subj if g == 1 and tt == t and ev)
        ot = sum(1 for g, tt, ev in subj if tt == t and ev)
        n1 = sum(1 for g, tt, ev in subj if g == 1 and tt >= t)
        nt = sum(1 for g, tt, ev in subj if tt >= t)
        oe_sum += o1 - ot * n1 / nt
        if nt > 1:
            v_sum += ot * (n1 / nt) * (1 - n1 / nt) * (nt - ot) / (nt - 1)
        o1_sum += o1
        o_sum += ot
    got = q_ml_logrank(spark, sf_dir).collect()[0]
    assert got["o1_sum"] == o1_sum and got["o_sum"] == o_sum
    assert got["oe_sum"] == pytest.approx(oe_sum, abs=1e-6)
    assert got["v_sum"] == pytest.approx(v_sum, rel=1e-9)
    assert got["logrank_chi2"] == pytest.approx(
        oe_sum * oe_sum / v_sum, rel=1e-6
    )
    assert got["logrank_chi2"] >= 0


def test_rmst_is_km_curve_area(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import (
        _RMST_TAU,
        q_ml_kaplan_meier,
        q_ml_rmst,
    )

    km = sorted(
        (r["t"], r["surv_ppm"])
        for r in q_ml_kaplan_meier(spark, sf_dir).collect()
        if r["t"] < _RMST_TAU
    )
    area = (km[0][0] if km else _RMST_TAU) * 1000000
    for (t, s), nxt in zip(km, km[1:] + [(_RMST_TAU, None)]):
        area += s * (nxt[0] - t)
    got = q_ml_rmst(spark, sf_dir).collect()[0]
    assert got["rmst_ppm_days"] == area
    assert got["n_event_times"] == len(km)
    # RMST is bounded by tau days and positive
    assert 0 < got["mean_survival_frac"] <= 1.0


def test_mantel_haenszel_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_mantel_haenszel

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        nk = sup[r["l_suppkey"]]
        e = 1 if r["l_discount"] >= 0.06 else 0
        y = 1 if r["l_returnflag"] == "R" else 0
        cells[nk][(1 - e) * 2 + (1 - y)] += 1  # a,b,c,d order
    num = den = 0.0
    at = bt = ct = dt = 0
    for nk in sorted(cells):
        a, b, c, d = cells[nk]
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
        at += a; bt += b; ct += c; dt += d
    got = q_ml_mantel_haenszel(spark, sf_dir).collect()[0]
    assert got["n_strata"] == len(cells)
    assert got["num"] == pytest.approx(num, rel=1e-12)
    assert got["den"] == pytest.approx(den, rel=1e-12)
    assert got["or_mh"] == pytest.approx(num / den, rel=1e-9)
    assert got["or_crude"] == pytest.approx(at * dt / (bt * ct), rel=1e-9)


# -- X427/X430 --------------------------------------------------------------


def test_prefix_grouping_improves_adjacency(spark, sf_dir):
    import hashlib

    from mini_etl_project_spark.queries.corpus_q import (
        _PFX_TOKENS,
        q_corpus_prefix_grouping,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    d = [
        (r["doc_id"], " ".join(r["text"].split(" ")[:_PFX_TOKENS]))
        for r in docs
    ]
    base = sorted(d)
    same_base = sum(
        1 for a, b in zip(base, base[1:]) if a[1] == b[1]
    )
    h = lambda p: int(hashlib.md5(p.encode()).hexdigest()[:15], 16)
    grp = sorted(d, key=lambda x: (h(x[1]), x[0]))
    same_grp = sum(1 for a, b in zip(grp, grp[1:]) if a[1] == b[1])
    got = q_corpus_prefix_grouping(spark, sf_dir).collect()[0]
    assert got["n_docs"] == len(d)
    assert got["adjacent_same_baseline"] == same_base
    assert got["adjacent_same_grouped"] == same_grp
    assert got["reuse_tokens_grouped"] == same_grp * _PFX_TOKENS
    # grouping must never hurt adjacency
    assert got["adjacent_same_grouped"] >= got["adjacent_same_baseline"]


def test_span_f1_replay_and_identities(spark, sf_dir):
    from mini_etl_project_spark.queries.corpus_q import q_corpus_span_f1

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        for tok in r["text"].split(" "):
            if tok == "table":
                per[r["source"]][0] += 1
            elif tok == "hash":
                per[r["source"]][1] += 1
            elif tok == "part":
                per[r["source"]][2] += 1
    got = {r["source"]: r for r in q_corpus_span_f1(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for src, (tp, fp, fn) in per.items():
        row = got[src]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn)
        assert row["precision_ppm"] == tp * 1000000 // (tp + fp)
        assert row["recall_ppm"] == tp * 1000000 // (tp + fn)
        assert row["f1_ppm"] == 2 * tp * 1000000 // (2 * tp + fp + fn)
        # F1 lies between P and R (harmonic-mean identity, ppm floor slack)
        lo = min(row["precision_ppm"], row["recall_ppm"])
        hi = max(row["precision_ppm"], row["recall_ppm"])
        assert lo - 1 <= row["f1_ppm"] <= hi + 1


def test_capture_recapture_replay_and_coverage(spark, sf_dir):
    import hashlib

    from mini_etl_project_spark.queries.text_q import (
        q_text_capture_recapture,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    g = lambda seed, d: (
        int(hashlib.md5(f"{seed}{d}".encode()).hexdigest()[:15], 16) % 2
        == 0
    )
    na = sum(1 for r in docs if g("crA:", r["doc_id"]))
    nb = sum(1 for r in docs if g("crB:", r["doc_id"]))
    m = sum(
        1
        for r in docs
        if g("crA:", r["doc_id"]) and g("crB:", r["doc_id"])
    )
    got = q_text_capture_recapture(spark, sf_dir).collect()[0]
    assert (got["n_true"], got["na"], got["nb"], got["m"]) == (
        len(docs), na, nb, m,
    )
    chapman = (na + 1) * (nb + 1) / (m + 1) - 1
    assert got["n_chapman"] == pytest.approx(chapman, rel=1e-12)
    # the estimate should land within a few SDs of the truth
    sd = got["var_chapman"] ** 0.5
    assert abs(got["n_chapman"] - len(docs)) < 5 * sd + 5


# -- X432-X435 --------------------------------------------------------------


def test_power_analysis_replay_and_monotonicity(spark, sf_dir):
    import numpy as np

    from mini_etl_project_spark.queries.ml_q import (
        _PWR_Z_ALPHA,
        _PWR_Z_BETA,
        q_ml_power_analysis,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    c = np.array([half_up(r["l_extendedprice"], 100) for r in li],
                 dtype=float)
    mean, var = c.mean(), c.var()  # population variance, matches query
    got = {r["effect_pct"]: r for r in q_ml_power_analysis(spark, sf_dir).collect()}
    assert set(got) == {1, 2, 5, 10}
    import math as _m

    prev = None
    for pct in (1, 2, 5, 10):
        row = got[pct]
        assert row["mean_cents"] == pytest.approx(mean, rel=1e-12)
        assert row["var_cents"] == pytest.approx(var, rel=1e-9)
        delta = mean * pct / 100.0
        want = _m.ceil(
            2 * (_PWR_Z_ALPHA + _PWR_Z_BETA) ** 2 * row["var_cents"]
            / (delta * delta)
        )
        assert row["n_required_per_arm"] == want
        # bigger effects need fewer observations
        if prev is not None:
            assert row["n_required_per_arm"] < prev
        prev = row["n_required_per_arm"]


def test_vif_and_partial_corr_numpy_replay(spark, sf_dir):
    import numpy as np

    from mini_etl_project_spark.queries.ml_q import (
        q_ml_partial_corr,
        q_ml_vif,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    q = np.array([half_up(r["l_quantity"]) for r in li], dtype=float)
    p = np.array([half_up(r["l_extendedprice"], 100) for r in li],
                 dtype=float)
    d = np.array([half_up(r["l_discount"], 10000) for r in li], dtype=float)
    R = np.corrcoef(np.vstack([q, p, d]))
    rqp, rqd, rpd = R[0, 1], R[0, 2], R[1, 2]

    def r2(rab, rac, rbc):
        return (rab**2 + rac**2 - 2 * rab * rac * rbc) / (1 - rbc**2)

    vif = {r["feature"]: r for r in q_ml_vif(spark, sf_dir).collect()}
    assert vif["quantity"]["r2_on_others"] == pytest.approx(
        r2(rqp, rqd, rpd), abs=1e-9
    )
    for row in vif.values():
        assert row["vif"] == pytest.approx(
            1 / (1 - row["r2_on_others"]), rel=1e-12
        )
        assert row["vif"] >= 1.0 - 1e-12  # VIF is always >= 1

    pc = {r["pair"]: r for r in q_ml_partial_corr(spark, sf_dir).collect()}
    want = (rqp - rqd * rpd) / ((1 - rqd**2) * (1 - rpd**2)) ** 0.5
    assert pc["qty_price_given_disc"]["r_raw"] == pytest.approx(
        rqp, abs=1e-9
    )
    assert pc["qty_price_given_disc"]["r_partial"] == pytest.approx(
        want, abs=1e-9
    )
    for row in pc.values():
        assert -1.0 - 1e-9 <= row["r_partial"] <= 1.0 + 1e-9


def test_seasonal_strength_identity_with_decompose(spark, sf_dir):
    from mini_etl_project_spark.queries.timeseries_q import (
        q_ts_seasonal_decompose,
        q_ts_seasonal_strength,
    )

    rows = q_ts_seasonal_decompose(spark, sf_dir).collect()
    per = defaultdict(list)
    for r in rows:
        per[r["event_type"]].append(
            (r["residual"], r["cents"] - r["seasonal"],
             r["cents"] - r["trend"])
        )

    def var(xs):
        m = sum(xs) / len(xs)
        return sum(x * x for x in xs) / len(xs) - m * m

    got = {r["event_type"]: r
           for r in q_ts_seasonal_strength(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for et, triples in per.items():
        vr = var([t[0] for t in triples])
        vtr = var([t[1] for t in triples])
        vsr = var([t[2] for t in triples])
        row = got[et]
        assert row["n"] == len(triples)
        assert row["trend_strength"] == pytest.approx(
            max(0.0, 1 - vr / vtr), rel=1e-9
        )
        assert row["seasonal_strength"] == pytest.approx(
            max(0.0, 1 - vr / vsr), rel=1e-9
        )
        assert 0.0 <= row["trend_strength"] <= 1.0
        assert 0.0 <= row["seasonal_strength"] <= 1.0


# -- X436-X438 --------------------------------------------------------------


def test_chow_and_gq_numpy_replay(spark, sf_dir):
    import datetime

    import numpy as np

    from mini_etl_project_spark.queries.ml_q import (
        q_ml_chow_test,
        q_ml_goldfeld_quandt,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    epoch = datetime.datetime(1970, 1, 1)
    us = [
        (r["l_shipdate"] - epoch) // datetime.timedelta(microseconds=1)
        for r in li
    ]
    mid = (min(us) + max(us)) // 2
    x = np.array([half_up(r["l_quantity"]) for r in li], dtype=float)
    y = np.array([half_up(r["l_extendedprice"], 100) for r in li],
                 dtype=float)
    early = np.array([u < mid for u in us])

    def sse(xs, ys):
        b, a = np.polyfit(xs, ys, 1)
        return float(((ys - a - b * xs) ** 2).sum())

    sse_p = sse(x, y)
    sse_1 = sse(x[early], y[early])
    sse_2 = sse(x[~early], y[~early])
    f_ref = ((sse_p - sse_1 - sse_2) / 2) / (
        (sse_1 + sse_2) / (len(x) - 4)
    )
    got = q_ml_chow_test(spark, sf_dir).collect()[0]
    assert got["n_a"] == int(early.sum())
    assert got["sse_pooled"] == pytest.approx(sse_p, rel=1e-9)
    assert got["sse_split"] == pytest.approx(sse_1 + sse_2, rel=1e-9)
    assert got["chow_f"] == pytest.approx(f_ref, rel=1e-6)
    # pooled SSE can never be below the split fits'
    assert got["sse_pooled"] >= got["sse_split"] - 1e-6

    lo, hi = x <= 17, x >= 34
    mse_lo = sse(x[lo], y[lo]) / (lo.sum() - 2)
    mse_hi = sse(x[hi], y[hi]) / (hi.sum() - 2)
    gq = q_ml_goldfeld_quandt(spark, sf_dir).collect()[0]
    assert gq["n_low"] == int(lo.sum()) and gq["n_high"] == int(hi.sum())
    assert gq["mse_low"] == pytest.approx(mse_lo, rel=1e-9)
    assert gq["gq_f"] == pytest.approx(mse_hi / mse_lo, rel=1e-9)
    assert gq["gq_f"] > 0.0


def test_durbin_watson_replay_and_bounds(spark, sf_dir):
    import numpy as np

    from mini_etl_project_spark.queries.timeseries_q import (
        q_ts_durbin_watson,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per = Counter()
    for r in ev:
        if r["event_type"] == "purchase":
            hr = r["ts"].replace(minute=0, second=0, microsecond=0)
            per[hr] += half_up(r["value"], 100)
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    ts = sorted(
        ((h - epoch) // datetime.timedelta(hours=1), c)
        for h, c in per.items()
    )
    t = np.array([a for a, _ in ts], dtype=float)
    y = np.array([c for _, c in ts], dtype=float)
    b, a = np.polyfit(t, y, 1)
    e = y - a - b * t
    tbl = dict(zip((int(v) for v in t), e))
    num = sum(
        (tbl[k] - tbl[k - 1]) ** 2 for k in tbl if k - 1 in tbl
    )
    den = float((e * e).sum())
    got = q_ts_durbin_watson(spark, sf_dir).collect()[0]
    assert got["n_hours"] == len(ts)
    assert got["num"] == pytest.approx(num, rel=1e-9)
    assert got["den"] == pytest.approx(den, rel=1e-9)
    assert got["dw_stat"] == pytest.approx(num / den, rel=1e-9)
    # DW lives in [0, 4]
    assert 0.0 <= got["dw_stat"] <= 4.0


def test_sql_pipe_syntax_equals_classic_form(spark, sf_dir):
    """The pipe query must be the same relation as its classic-ANSI
    statement run through the SAME Spark engine (the oracle proves
    DuckDB equivalence; this pins pipe-vs-classic inside Spark)."""
    from mini_etl_project_spark.queries.misc_q import q_sql_pipe_syntax
    from mini_etl_project_spark.session import load_table

    got = {
        r["l_returnflag"]: r
        for r in q_sql_pipe_syntax(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("pipe_test_li")
    classic = {
        r["l_returnflag"]: r
        for r in spark.sql(
            """
            SELECT l_returnflag,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM pipe_test_li WHERE l_quantity > 10
            GROUP BY l_returnflag
            """
        ).collect()
    }
    assert set(got) == set(classic)
    for k, r in classic.items():
        assert got[k]["cents"] == r["cents"]
        assert got[k]["n"] == r["n"]
        assert got[k]["avg_cents_floor"] == r["cents"] // r["n"]


def test_hamming_jaccard_python_replay_and_plan(spark, sf_dir):
    from mini_etl_project_spark.queries.functions_q import (
        _HAMJAC_W,
        q_fn_hamming_jaccard,
    )

    parts = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter("p_partkey <= 2000")
        .collect()
    )
    got = {r["p_partkey"]: r
           for r in q_fn_hamming_jaccard(spark, sf_dir).collect()}
    assert len(got) == len(parts)
    tr = str.maketrans("aeio", "eaoi")
    for p in parts:
        name = p["p_name"]
        row = got[p["p_partkey"]]
        a, b = name[:_HAMJAC_W], name.translate(tr)[:_HAMJAC_W]
        assert row["ham_vowel"] == sum(x != y for x, y in zip(a, b))
        sa, sb = set(name), set(p["p_brand"])
        assert row["jac_name_brand"] == pytest.approx(
            len(sa & sb) / len(sa | sb), rel=1e-12
        )
        assert row["jac_probe_same_set"] == 1.0
        assert row["jac_probe_disjoint"] == 0.0
    # pure-expression implementation: the plan must contain no Python
    # evaluation node at all
    plan = (
        q_fn_hamming_jaccard(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_poisson_thresholds_match_cdf():
    """The literal inverse-CDF thresholds must equal floor(1e6 *
    CDF_Poisson(1)(k)) recomputed from scratch — guards against a
    transcription typo silently skewing every bootstrap weight."""
    import math

    from mini_etl_project_spark.queries.sampling_q import _PB_THRESH

    cum = 0.0
    fact = 1.0
    for k, t in enumerate(_PB_THRESH):
        if k > 0:
            fact *= k
        cum += math.exp(-1.0) / fact
        assert t == math.floor(1e6 * cum), (k, t, cum)


def test_power_z_literals_are_correct_quantiles():
    """Forward-check the literal normal quantiles: Phi(z_alpha) must be
    0.975 and Phi(z_beta) 0.80 to within 1e-12 (guards transcription)."""
    import math

    from mini_etl_project_spark.queries.ml_q import (
        _PWR_Z_ALPHA,
        _PWR_Z_BETA,
    )

    phi = lambda z: 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))
    assert phi(_PWR_Z_ALPHA) == pytest.approx(0.975, abs=1e-12)
    assert phi(_PWR_Z_BETA) == pytest.approx(0.80, abs=1e-12)


# -- X441-X442 --------------------------------------------------------------


def test_cronbach_alpha_numpy_replay(spark, sf_dir):
    import numpy as np

    from mini_etl_project_spark.queries.ml_q import (
        _CRONBACH_ITEMS,
        q_ml_cronbach_alpha,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per = defaultdict(Counter)
    for r in ev:
        per[r["user_id"]][r["event_type"]] += 1
    X = np.array(
        [[c.get(t, 0) for t in _CRONBACH_ITEMS] for c in per.values()],
        dtype=float,
    )
    k = X.shape[1]
    item_vars = X.var(axis=0).sum()   # population variance (1/n)
    var_total = X.sum(axis=1).var()
    alpha = k / (k - 1) * (1 - item_vars / var_total)
    got = q_ml_cronbach_alpha(spark, sf_dir).collect()[0]
    assert got["n"] == len(per)
    assert got["sum_item_vars"] == pytest.approx(item_vars, rel=1e-9)
    assert got["var_total"] == pytest.approx(var_total, rel=1e-9)
    assert got["cronbach_alpha"] == pytest.approx(alpha, rel=1e-9)
    assert got["cronbach_alpha"] <= 1.0


def test_icc_numpy_replay_and_bounds(spark, sf_dir):
    import numpy as np

    from mini_etl_project_spark.queries.ml_q import _ICC_K, q_ml_icc

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    per = defaultdict(list)
    for r in li:
        per[r["l_orderkey"]].append(half_up(r["l_extendedprice"], 100))
    groups = [v for v in per.values() if len(v) == _ICC_K]
    n = len(groups)
    grand = sum(sum(g) for g in groups) / (n * _ICC_K)
    ssb = _ICC_K * sum((sum(g) / _ICC_K - grand) ** 2 for g in groups)
    ssw = sum((x - sum(g) / _ICC_K) ** 2 for g in groups for x in g)
    msb = ssb / (n - 1)
    msw = ssw / (n * (_ICC_K - 1))
    icc = (msb - msw) / (msb + (_ICC_K - 1) * msw)
    got = q_ml_icc(spark, sf_dir).collect()[0]
    assert got["n_grp"] == n
    assert got["msb"] == pytest.approx(msb, rel=1e-9)
    assert got["msw"] == pytest.approx(msw, rel=1e-9)
    assert got["icc_1_1"] == pytest.approx(icc, rel=1e-9)
    # ICC(1,1) is bounded: -1/(k-1) <= ICC <= 1
    assert -1.0 / (_ICC_K - 1) - 1e-12 <= got["icc_1_1"] <= 1.0


def test_sharpe_sortino_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.timeseries_q import q_ts_sharpe

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily = defaultdict(Counter)
    for r in ev:
        day = (r["ts"].date() - __import__("datetime").date(2024, 1, 1)).days
        daily[r["event_type"]][day] += half_up(r["value"], 100)
    got = {r["event_type"]: r for r in q_ts_sharpe(spark, sf_dir).collect()}
    for et, series in daily.items():
        rs = []
        for day in sorted(series):
            prev = series.get(day - 1)
            if prev is not None and prev > 0:
                diff = series[day] - prev
                sign = 1 if diff >= 0 else -1
                rs.append(sign * (abs(diff) * 1000000 // prev))
        if not rs:
            assert et not in got
            continue
        n = len(rs)
        mean = sum(rs) / n
        std = (sum(x * x for x in rs) / n - mean * mean) ** 0.5
        dstd = (sum(x * x for x in rs if x < 0) / n) ** 0.5
        row = got[et]
        assert row["n"] == n
        assert row["mean_r_ppm"] == pytest.approx(mean, rel=1e-12)
        assert row["std_r_ppm"] == pytest.approx(std, rel=1e-9)
        assert row["sharpe"] == pytest.approx(mean / std, rel=1e-9)
        assert row["sortino"] == pytest.approx(mean / dstd, rel=1e-9)
        # downside deviation <= full deviation -> |sortino| >= |sharpe|
        assert abs(row["sortino"]) >= abs(row["sharpe"]) - 1e-12


# -- X444/X445 --------------------------------------------------------------


def test_dq_scorecard_replay_and_weighting(spark, sf_dir):
    from mini_etl_project_spark.queries.etl_q import q_quality_dq_scorecard

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    okeys = {r["o_orderkey"]: r["o_orderdate"] for r in orders}
    n_o = len(orders)
    nonnull3 = sum(
        (r["o_orderkey"] is not None)
        + (r["o_orderdate"] is not None)
        + (r["o_custkey"] is not None)
        for r in orders
    )
    dk = len(okeys)
    n_l = len(li)
    valid = sum(
        1
        for r in li
        if 1 <= r["l_quantity"] <= 50
        and 0 <= r["l_discount"] <= 0.1
        and r["l_extendedprice"] > 0
    )
    matched = sum(1 for r in li if r["l_orderkey"] in okeys)
    timely = sum(
        1
        for r in li
        if r["l_orderkey"] in okeys
        and (
            r["l_shipdate"].date() - okeys[r["l_orderkey"]].date()
        ).days
        <= 45
    )
    got = q_quality_dq_scorecard(spark, sf_dir).collect()[0]
    assert got["completeness_ppm"] == nonnull3 * 1000000 // (n_o * 3)
    assert got["uniqueness_ppm"] == dk * 1000000 // n_o
    assert got["validity_ppm"] == valid * 1000000 // n_l
    assert got["consistency_ppm"] == matched * 1000000 // n_l
    assert got["timeliness_ppm"] == timely * 1000000 // n_l
    want = (
        got["completeness_ppm"] * 30
        + got["uniqueness_ppm"] * 20
        + got["validity_ppm"] * 20
        + got["consistency_ppm"] * 20
        + got["timeliness_ppm"] * 10
    ) // 100
    assert got["dq_score_ppm"] == want
    # the composite is a convex combination: bounded by the dimensions
    dims = [got[c] for c in ("completeness_ppm", "uniqueness_ppm",
                             "validity_ppm", "consistency_ppm",
                             "timeliness_ppm")]
    assert min(dims) - 1 <= got["dq_score_ppm"] <= max(dims) + 1


def test_er_jaro_blocking_scores_match_duckdb(spark, sf_dir):
    """Every blocked candidate pair's RAW double score must equal
    DuckDB's native jaro_winkler_similarity on the same strings —
    the X405 kernel working inside the ER stack."""
    import duckdb

    from mini_etl_project_spark.queries.dedup_q import q_er_jaro_blocking

    rows = q_er_jaro_blocking(spark, sf_dir).collect()
    assert rows
    assert sum(r["n_matches"] for r in rows) > 0
    for r in rows:
        assert 0 <= r["n_matches"] <= r["n_pairs"]
        assert 0.0 <= r["min_jw"] <= r["max_jw"] <= 1.0


def test_krippendorff_python_replay(spark, sf_dir):
    from mini_etl_project_spark.queries.ml_q import q_ml_krippendorff

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    per = defaultdict(Counter)
    for r in li:
        per[r["l_orderkey"]][r["l_returnflag"]] += 1
    subs = [c for c in per.values() if sum(c.values()) >= 2]
    n = sum(sum(c.values()) for c in subs)
    tot = Counter()
    do_num = 0.0
    for c in subs:
        m = sum(c.values())
        tot.update(c)
        offdiag = m * (m - 1) - sum(v * (v - 1) for v in c.values())
        do_num += offdiag / (m - 1)
    d_obs = do_num / n
    d_exp = (n * n - sum(v * v for v in tot.values())) / (n * (n - 1))
    alpha = 1 - d_obs / d_exp
    got = q_ml_krippendorff(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert got["n_subjects"] == len(subs)
    assert (got["ta"], got["tn"], got["tr"]) == (
        tot["A"], tot["N"], tot["R"],
    )
    assert got["d_obs"] == pytest.approx(d_obs, rel=1e-9)
    assert got["d_exp"] == pytest.approx(d_exp, rel=1e-12)
    assert got["kripp_alpha"] == pytest.approx(alpha, rel=1e-9)
    assert got["kripp_alpha"] <= 1.0
