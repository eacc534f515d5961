"""Round-6 batch: X338-X346 — connected components run to fixpoint,
HITS, quantile normalization, propensity matching, temperature-scaled
mixing, preference pairs, JSONL round-trip, mask(), array v3.4 fns.

Every test is an independent recompute (pandas/pure-Python) or a
closed-form property — never a rerun of the query's own plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.queries.corpus_q import (
    q_corpus_jsonl_roundtrip,
    q_corpus_preference_pairs,
    q_corpus_temperature_mix,
)
from mini_etl_project_spark.queries.functions_q import q_fn_array_v34, q_fn_mask
from mini_etl_project_spark.queries.iterative_q import (
    q_graph_connected_components,
    q_graph_hits,
)
from mini_etl_project_spark.queries.ml_q import (
    q_ml_psm_match,
    q_ml_quantile_normalize,
)


# -- X338 connected components --------------------------------------------


def test_connected_components_tiny_known_graph(spark):
    from mini_etl_project_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "id_a bigint, id_b bigint"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain_converges(spark):
    """A 120-node path is the worst case label propagation exists for:
    without path compression it needs 120 rounds. The operator must
    still reach the true single component."""
    from mini_etl_project_spark.operators.dedup import connected_components

    edges = spark.range(119).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    comp = connected_components(edges)
    rows = comp.agg(
        F.countDistinct("component").alias("k"),
        F.count(F.lit(1)).alias("n"),
        F.min("component").alias("m"),
    ).collect()[0]
    assert (rows["k"], rows["n"], rows["m"]) == (1, 120, 0)


def test_cc_query_components_partition_nodes(spark, sf_dir):
    """Component sizes must partition the planted 60-node graph: sizes
    sum to the number of nodes that have at least one edge, and every
    component label is one of its own members (min-label ⇒ label < 60)."""
    rows = q_graph_connected_components(spark, sf_dir).collect()
    assert sum(r["n_nodes"] for r in rows) == 60  # chain edges touch all 60
    assert all(0 <= r["component"] < 60 for r in rows)
    assert len({r["component"] for r in rows}) == len(rows)


# -- X339 HITS -------------------------------------------------------------


def test_hits_python_recompute(spark, sf_dir):
    """Full independent recompute: pull the distinct trade edge list via
    DuckDB, fold 2 HITS rounds in pure Python, compare per node."""
    import duckdb

    con = duckdb.connect()
    edges = con.sql(
        f"""
        SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{sf_dir}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey <> c.c_nationkey AND l.l_linenumber = 1
        """
    ).fetchall()
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    h = {v: 1.0 for v in nodes}
    a = {}
    for _ in range(2):
        a = {}
        for s, d in edges:
            a[d] = a.get(d, 0.0) + h.get(s, 0.0)
        z = sum(a.values())
        a = {k: v / z for k, v in a.items()}
        h = {}
        for s, d in edges:
            h[s] = h.get(s, 0.0) + a.get(d, 0.0)
        z = sum(h.values())
        h = {k: v / z for k, v in h.items()}
    rows = q_graph_hits(spark, sf_dir).collect()
    assert rows and {r["node"] for r in rows} == set(h) & set(a)
    for r in rows:
        assert abs(r["hub"] - h[r["node"]]) < 1e-9
        assert abs(r["authority"] - a[r["node"]]) < 1e-9
        assert r["hub"] >= 0 and r["authority"] >= 0


def test_hits_hand_graph_two_rounds(spark):
    """Exact 2-round HITS on a 3-node hand graph, recomputed on paper:
    edges 1→3, 2→3, 3→1. Round structure follows the query's own
    update order (a from h, then h from a, L1 each time)."""
    import pandas as pd

    edges = [(1, 3), (2, 3), (3, 1)]
    h = {1: 1.0, 2: 1.0, 3: 1.0}
    for _ in range(2):
        a = {}
        for s, d in edges:
            a[d] = a.get(d, 0.0) + h.get(s, 0.0)
        z = sum(a.values())
        a = {k: v / z for k, v in a.items()}
        h = {}
        for s, d in edges:
            h[s] = h.get(s, 0.0) + a.get(d, 0.0)
        z = sum(h.values())
        h = {k: v / z for k, v in h.items()}
    # round 1: a={3:2/3,1:1/3}, h={1:.4,2:.4,3:.2};
    # round 2: a={3:.8,1:.2}, h={1:4/9,2:4/9,3:1/9}.
    assert abs(h[1] - 4 / 9) < 1e-12 and abs(h[2] - 4 / 9) < 1e-12
    assert abs(h[3] - 1 / 9) < 1e-12
    assert abs(a[3] - 0.8) < 1e-12 and abs(a[1] - 0.2) < 1e-12


# -- X340 quantile normalization ------------------------------------------


def test_quantile_normalize_pandas_recompute(spark, sf_dir):
    import pandas as pd

    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "value")
        .toPandas()
    )
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    pool = pdf.sort_values(["cents", "event_id"]).reset_index(drop=True)
    n = len(pool)
    expected = {}
    for et, g in pdf.groupby("event_type"):
        g = g.sort_values(["cents", "event_id"]).reset_index(drop=True)
        ng = len(g)
        idx = ((g.index + 1) * n + ng - 1) // ng  # 1-based rank r = index+1
        mapped = pool["cents"].iloc[idx - 1]
        expected[et] = (ng, int(g["cents"].sum()), int(mapped.sum()))
    got = {
        r["event_type"]: (r["n"], r["orig_sum_cents"], r["mapped_sum_cents"])
        for r in q_ml_quantile_normalize(spark, sf_dir).collect()
    }
    assert got == expected


# -- X341 propensity matching ---------------------------------------------


def test_psm_match_pandas_recompute(spark, sf_dir):
    import pandas as pd

    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type", "ts", "value")
        .toPandas()
    )
    pdf["day"] = pd.to_datetime(pdf["ts"]).dt.date
    pdf["score"] = (pdf["value"] * 100).round().astype("int64")
    pdf["treat"] = (pdf["event_type"] == "purchase").astype(int)
    expected = {}
    for day, g in pdf.groupby("day"):
        g = g.sort_values(["score", "event_id"]).reset_index(drop=True)
        scores = g["score"].tolist()
        treats = g["treat"].tolist()
        n_t = n_m = s_d = 0
        for i, (sc, tr) in enumerate(zip(scores, treats)):
            if tr != 1:
                continue
            n_t += 1
            prev = next_ = None
            for j in range(i - 1, -1, -1):
                if treats[j] == 0:
                    prev = scores[j]
                    break
            for j in range(i + 1, len(scores)):
                if treats[j] == 0:
                    next_ = scores[j]
                    break
            if prev is None and next_ is None:
                continue
            if prev is None:
                m = next_
            elif next_ is None:
                m = prev
            elif sc - prev <= next_ - sc:
                m = prev
            else:
                m = next_
            if abs(sc - m) <= 50:
                n_m += 1
                s_d += abs(sc - m)
        expected[day] = (n_t, n_m, s_d if n_m else None)
    got = {
        r["day"]: (r["n_treated"], r["n_matched"], r["sum_abs_diff"])
        for r in q_ml_psm_match(spark, sf_dir).collect()
    }
    assert got == expected


# -- X342 temperature mixing ----------------------------------------------


def test_temperature_mix_probs_and_allocation(spark, sf_dir):
    import math

    rows = q_corpus_temperature_mix(spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    z = sum(math.sqrt(r["n"]) for r in rows)
    assert abs(sum(r["sample_prob"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r["sample_prob"] - math.sqrt(r["n"]) / z) < 1e-9
        assert r["target_docs"] == math.floor(
            math.sqrt(r["n"]) / z * total
        )
    # α=0.5 upsamples the tail: smallest source gets prob share > doc share
    small = min(rows, key=lambda r: r["n"])
    big = max(rows, key=lambda r: r["n"])
    if small["n"] < big["n"]:
        assert small["sample_prob"] / (small["n"] / total) > 1.0
        assert big["sample_prob"] / (big["n"] / total) < 1.0


# -- X343 preference pairs -------------------------------------------------


def test_preference_pairs_pandas_recompute(spark, sf_dir):
    import re as _re

    pdf = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "lang", "doc_id", "text")
        .toPandas()
    )

    def score(t):
        toks = [x for x in _re.split(r"[^a-z0-9]+", t.lower()) if x]
        return len(toks) + 2 * len(set(toks))

    pdf["score"] = pdf["text"].map(score)
    expected = {}
    for (src, lang), g in pdf.groupby(["source", "lang"]):
        # chosen: max score, SMALLEST doc_id tie-break (max of (s, -d));
        # rejected: min score, min doc_id
        chosen = g.sort_values(["score", "doc_id"], ascending=[False, True]).iloc[0]
        rej = g.sort_values(["score", "doc_id"]).iloc[0]
        expected[(src, lang)] = (
            len(g),
            chosen["doc_id"],
            chosen["score"],
            rej["doc_id"],
            rej["score"],
        )
    got = {
        (r["source"], r["lang"]): (
            r["n_docs"],
            r["chosen_doc"],
            r["chosen_score"],
            r["rejected_doc"],
            r["rejected_score"],
        )
        for r in q_corpus_preference_pairs(spark, sf_dir).collect()
    }
    assert got == expected
    for v in got.values():
        assert v[2] >= v[4]  # chosen_score >= rejected_score


# -- X344 JSONL round-trip -------------------------------------------------


def test_jsonl_roundtrip_is_lossless(spark, sf_dir):
    rows = q_corpus_jsonl_roundtrip(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_roundtrip_ok"] == r["n_docs"]


def test_jsonl_roundtrip_catches_mutation(spark):
    """The audit must actually detect a lossy writer: mangling the
    parsed-back text flips rows to not-ok."""
    df = spark.createDataFrame(
        [(1, "héllo \"quoted\" \t text", "en", "web")],
        "doc_id bigint, text string, lang string, source string",
    )
    packed = df.select(
        "source",
        "doc_id",
        "text",
        F.to_json(F.struct("doc_id", "text", "lang")).alias("line"),
    )
    parsed = packed.select(
        "*",
        F.from_json("line", "doc_id bigint, text string, lang string").alias(
            "back"
        ),
    )
    ok = parsed.filter(F.col("back.text") == F.col("text")).count()
    bad = parsed.filter(
        F.concat(F.col("back.text"), F.lit("x")) == F.col("text")
    ).count()
    assert (ok, bad) == (1, 0)


# -- X345 mask() -----------------------------------------------------------


def test_mask_matches_python_reference(spark, sf_dir):
    rows = q_fn_mask(spark, sf_dir).limit(50).collect()
    src = {
        r["c_custkey"]: r["c_name"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") <= 500)
        .select("c_custkey", "c_name")
        .collect()
    }
    assert rows
    for r in rows:
        name = src[r["c_custkey"]]

        def _mask(s, up, lo, dig):
            return "".join(
                up if c.isupper() else lo if c.islower()
                else dig if c.isdigit() else c
                for c in s
            )

        want_default = _mask(name, "X", "x", "n")
        want_custom = _mask(name, "*", "*", "#")
        assert r["masked_default"] == want_default
        assert r["masked_custom"] == want_custom


# -- X346 array v3.4 functions --------------------------------------------


def test_array_v34_semantics_one_row(spark, sf_dir):
    r = (
        q_fn_array_v34(spark, sf_dir)
        .filter((F.col("l_orderkey") == 1) & (F.col("l_linenumber") == 1))
        .collect()
    )
    if not r:  # orderkey 1 always exists in TPC-H data, but be explicit
        pytest.skip("orderkey 1 absent at this SF")
    row = r[0]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter((F.col("l_orderkey") == 1) & (F.col("l_linenumber") == 1))
        .select("l_quantity", "l_partkey")
        .collect()[0]
    )
    # Output is the canonical string serialization (NULL → 'N') — the
    # driver's pandas canonicalizer cannot hash list cells, so arrays are
    # flattened in-plan via array_join; semantics replayed on the strings.
    from conftest import half_up

    arr = [half_up(li["l_quantity"]), None, int(li["l_partkey"])]

    def ser(xs):
        return ",".join("N" if x is None else str(x) for x in xs)

    assert row["compacted"] == ser([x for x in arr if x is not None])
    assert row["prepended"] == ser([-1] + arr)
    assert row["appended"] == ser(arr + [99])
    assert row["inserted_at_2"] == ser([arr[0], 7] + arr[1:])
