"""Round-6 batch 2: X347-X352 — FIFO costing, Damerau-Levenshtein,
Brier decomposition, Nelson-Aalen, Observation metrics, deterministic
training-shard shuffle. Independent recomputes and closed-form pins."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from conftest import half_up

from mini_etl_project_spark.queries.functions_q import _damerau_dl, q_fn_damerau
from mini_etl_project_spark.queries.joins import q_join_fifo_costing
from mini_etl_project_spark.queries.llm_q import q_corpus_shard_shuffle
from mini_etl_project_spark.queries.misc_q import q_sql_observe
from mini_etl_project_spark.queries.ml_q import (
    q_ml_brier_decomposition,
    q_ml_nelson_aalen,
)


# -- X347 FIFO -------------------------------------------------------------


def test_fifo_python_simulation(spark, sf_dir):
    """Replay sequence-FIFO (k-th issued unit costed against the k-th
    received unit — backorders covered by later receipts) with an
    imperative two-pointer walk in Python and compare matched
    quantities/costs pair by pair."""
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_partkey") <= 500)
        .select(
            "l_partkey",
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
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
        lots = []  # (lot_qty, ext_cents), in receipt order
        issues = []  # issue_qty, in issue order
        for r in rs:
            qty = half_up(r["l_quantity"])
            cents = half_up(r["l_extendedprice"], 100)
            if r["l_linenumber"] % 2 == 1:
                lots.append((qty, cents))
            else:
                issues.append(qty)
        # two-pointer walk over the unit sequences
        li = ii = 0
        lot_left = lots[0][0] if lots else 0
        iss_left = issues[0] if issues else 0
        n_m = m_qty = m_cost = 0
        while li < len(lots) and ii < len(issues):
            take = min(lot_left, iss_left)
            n_m += 1
            m_qty += take
            m_cost += lots[li][1] * take // lots[li][0]
            lot_left -= take
            iss_left -= take
            if lot_left == 0:
                li += 1
                lot_left = lots[li][0] if li < len(lots) else 0
            if iss_left == 0:
                ii += 1
                iss_left = issues[ii] if ii < len(issues) else 0
        if n_m:
            expected[pk] = (n_m, m_qty, m_cost)
    got = {
        r["p_partkey"]: (
            r["n_matches"],
            r["matched_qty"],
            r["matched_cost_cents"],
        )
        for r in q_join_fifo_costing(spark, sf_dir).collect()
        if r["n_matches"] > 0 and r["matched_qty"] > 0
    }
    assert got == expected


# -- X348 Damerau ----------------------------------------------------------


def test_damerau_textbook_cases():
    cases = {
        ("CA", "ABC"): 2,  # the OSA-vs-true-DL separator (OSA gives 3)
        ("kitten", "sitting"): 3,
        ("ab", "ba"): 1,
        ("", "abc"): 3,
        ("abc", ""): 3,
        ("abc", "abc"): 0,
        ("a cat", "an act"): 2,
        ("abcdef", "abcfed"): 2,
    }
    for (a, b), want in cases.items():
        assert _damerau_dl(a, b) == want, (a, b)
        assert _damerau_dl(b, a) == want, (b, a)  # symmetry


def test_damerau_is_a_metric_on_samples():
    import itertools

    words = ["brand", "brnad", "bran", "board", "brandx", ""]
    for a, b, c in itertools.product(words, repeat=3):
        dab, dbc, dac = (
            _damerau_dl(a, b),
            _damerau_dl(b, c),
            _damerau_dl(a, c),
        )
        assert dac <= dab + dbc  # triangle inequality (true DL is a metric)


# -- X349 Brier ------------------------------------------------------------


def test_brier_decomposition_python_recompute(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type")
        .collect()
    )
    bins = {}
    for r in rows:
        h = int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:15], 16)
        s = h % 1000000
        b = s // 100000
        n, np_, sp = bins.get(b, (0, 0, 0))
        bins[b] = (
            n + 1,
            np_ + (1 if r["event_type"] == "purchase" else 0),
            sp + s,
        )
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["sum_pred_ppm"], int(r["rel_num"]))
        for r in q_ml_brier_decomposition(spark, sf_dir).collect()
    }
    for b, (n, np_, sp) in bins.items():
        assert got[b] == (n, np_, sp, (sp - 1000000 * np_) ** 2)


# -- X350 Nelson-Aalen -----------------------------------------------------


def test_nelson_aalen_vs_kaplan_meier_consistency(spark, sf_dir):
    """NA and KM share the same risk table: at every event time the NA
    at-risk/event counts must equal KM's, and H(t) must be
    non-decreasing with exact per-term floor ppm increments."""
    from mini_etl_project_spark.queries.ml_q import q_ml_kaplan_meier

    na = {
        r["t"]: r
        for r in q_ml_nelson_aalen(spark, sf_dir).collect()
    }
    km = {r["t"]: r for r in q_ml_kaplan_meier(spark, sf_dir).collect()}
    assert set(na) == set(km)
    prev = 0
    for t in sorted(na):
        assert na[t]["n_at_risk"] == km[t]["n_at_risk"]
        assert na[t]["d_events"] == km[t]["d_events"]
        inc = na[t]["cum_hazard_ppm"] - prev
        assert inc == na[t]["d_events"] * 1000000 // na[t]["n_at_risk"]
        prev = na[t]["cum_hazard_ppm"]


# -- X351 observe ----------------------------------------------------------


def test_observe_matches_direct_aggregate(spark, sf_dir):
    got = q_sql_observe(spark, sf_dir).collect()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("u"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "s"
        ),
    ).collect()[0]
    assert (got["n_rows"], got["n_urgent"], got["sum_total_cents"]) == (
        want["n"],
        want["u"],
        want["s"],
    )


# -- X352 shard shuffle ----------------------------------------------------


def test_shard_shuffle_python_recompute(spark, sf_dir):
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    shards = {}
    for did in ids:
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16)
        shards.setdefault(h % 32, []).append((h, did))
    expected = {}
    for s, docs in shards.items():
        docs.sort()
        checksum = sum(
            (i + 1) * (did % 997) for i, (_, did) in enumerate(docs)
        )
        expected[s] = (len(docs), checksum, docs[0][1], docs[-1][1])
    got = {
        r["shard"]: (
            r["n_docs"],
            r["order_checksum"],
            r["first_doc"],
            r["last_doc"],
        )
        for r in q_corpus_shard_shuffle(spark, sf_dir).collect()
    }
    assert got == expected


def test_shard_shuffle_is_partition_count_invariant(spark, sf_dir):
    """Rerunning with a different physical partitioning must give the
    same checksums — the whole point of a deterministic shuffle."""
    a = {
        r["shard"]: r["order_checksum"]
        for r in q_corpus_shard_shuffle(spark, sf_dir).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = {
            r["shard"]: r["order_checksum"]
            for r in q_corpus_shard_shuffle(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
