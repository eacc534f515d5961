"""Round-12: X520 multi-turn preference assembly.

The surface is recomputed from the raw parquet with plain Python
(pyarrow only — no Spark, no DuckDB) and required to agree exactly: the
two-engines-can-both-be-wrong discipline of test_round10b/test_round11.
The single-shuffle plan claim is pinned structurally (the turn-counting
window partitions by user_id and the (user_id, turn) groupBy must ride
that partitioning — a second hash exchange is a regression).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from mini_etl_project_spark.queries import QUERIES

from conftest import half_up

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def turn_prefs_python():
    """Plain-Python rebuild of the X520 surface from raw parquet."""
    t = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )
    rows = list(
        zip(
            t["user_id"].to_pylist(),
            t["ts"].to_pylist(),
            t["event_id"].to_pylist(),
            t["event_type"].to_pylist(),
            t["value"].to_pylist(),
        )
    )
    by_user: dict[int, list] = defaultdict(list)
    for uid, ts, eid, etype, val in rows:
        by_user[uid].append((ts, eid, etype, val))
    groups: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
    for uid, evs in by_user.items():
        # conversation order: (ts NULLS LAST, event_id)
        evs.sort(key=lambda e: (e[0] is None, e[0] or 0, e[1]))
        turn = 0
        for ts, eid, etype, val in evs:
            role = "user" if etype in ("click", "view") else "assistant"
            if role == "user":
                turn += 1
            elif val is not None:
                groups[(uid, turn)].append((half_up(val, 100), eid))
    out = {}
    for (uid, turn), cand in groups.items():
        if len(cand) < 2:
            continue
        chosen = max(cand, key=lambda c: (c[0], -c[1]))
        rejected = min(cand, key=lambda c: (c[0], c[1]))
        gap = chosen[0] - rejected[0]
        if gap >= 1:
            out[(uid, turn)] = (
                len(cand),
                chosen[1],
                chosen[0],
                rejected[1],
                rejected[0],
                gap,
            )
    return out


def test_turn_preferences_match_python(spark, turn_prefs_python):
    got = {
        (r["user_id"], r["turn"]): (
            r["n_candidates"],
            r["chosen_event_id"],
            r["chosen_cents"],
            r["rejected_event_id"],
            r["rejected_cents"],
            r["gap_cents"],
        )
        for r in QUERIES["q_corpus_turn_preferences"](spark, SF).collect()
    }
    assert got == turn_prefs_python


def test_turn_preferences_invariants(spark):
    rows = QUERIES["q_corpus_turn_preferences"](spark, SF).collect()
    assert rows, "vacuous surface — fixture no longer produces turn pairs"
    keys = [(r["user_id"], r["turn"]) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate (conversation, turn) key"
    for r in rows:
        assert r["turn"] >= 0
        assert r["n_candidates"] >= 2
        assert r["gap_cents"] == r["chosen_cents"] - r["rejected_cents"]
        assert r["gap_cents"] >= 1, "non-positive preference gap leaked"
        assert r["chosen_event_id"] != r["rejected_event_id"]


def test_turn_preferences_single_shuffle(spark):
    """The (user_id, turn) groupBy must ride the window's user_id hash
    partitioning — exactly one shuffle exchange in the whole plan."""
    df = QUERIES["q_corpus_turn_preferences"](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    import re

    plan = df._jdf.queryExecution().explainString(mode)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}:\n{plan}"


# -- X521: NULL-convention regression set ------------------------------------
#
# The r12 audit (tools/audit_null_conventions.py) found 32 latent
# cross-engine NULL divergences; the full audit runs offline per round
# (SCALE_VALIDATION.md), and this test keeps a representative member of
# each fixed CLASS green inside every suite run: rank-order flip
# (NULLS FIRST vs LAST), struct-extremum flip, three-valued NOT IN,
# vanished equi-join group, concat_ws-vs-|| serialization, ANSI error on
# a NULL-poisoned frame, Python-UDF crash on None, null-safe equality.

_NULL_REGRESSION_SET = [
    "q_corpus_dpo_pairs",         # the original ADVICE-r11 struct-extremum class
    "q_agg_argminmax",            # NULL group key vanishes at oracle equi-join
    "q_window_rolling_median",    # ANSI element_at(0) on an all-NULL frame
    "q_window_count_distinct",    # rewrite counted NULL as a distinct value
    "q_corpus_conversation_assembly",  # concat_ws vs || serialization
    "q_fn_aes_roundtrip",         # null-safe equality
    "q_ts_holt_linear",           # Python recurrence crash on None cents
    "q_sim_rrf_fusion",           # rank-order flip through the negation trick
    "q_udtf_table_arg",           # UDTF accumulator crash + swallowed NULL key
]


@pytest.fixture(scope="module")
def null_twin(tmp_path_factory):
    from tools.audit_null_conventions import build_twin

    dst = str(tmp_path_factory.mktemp("nulltwin"))
    build_twin(SF, dst)
    return dst


def test_null_convention_regression_set(spark, null_twin):
    import duckdb

    from tools.check_correctness import canon_rows, duck_run, spark_rows

    from mini_etl_project_spark.queries import ORACLES, QUERIES
    from mini_etl_project_spark.session import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{null_twin}/{t}.parquet')"
        )
    bad: list[str] = []
    for name in _NULL_REGRESSION_SET:
        try:
            scols, srows = spark_rows(QUERIES[name](spark, null_twin))
            dcols, drows = duck_run(con, ORACLES[name])
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: engine error on NULL twin: {e}")
            continue
        if sorted(scols) != sorted(dcols) or canon_rows(
            scols, srows
        ) != canon_rows(dcols, drows):
            bad.append(f"{name}: cross-engine divergence on NULL twin")
    assert not bad, "NULL-convention regression:\n" + "\n".join(bad)


# -- ts-NULL sweep regression set (r12, second stage of X521) ----------------
#
# The `--with-ts` audit stage (NULL events.ts — the window order key
# shared by ~100 lanes) found 49 more divergences. One representative
# per fixed CLASS stays green inside every suite run: ASOF NULL-probe
# semantics (DuckDB matches the latest right row, the union+window
# engine matches nothing), event-time streaming drop vs batch NULL
# bucket, per-key ordered-history boundary shift, NULL time-bucket
# mint, ordered array traversal through _daily_cents, session-window
# event time, order-only NULLS LAST pin (row kept), and the Arrow NaT
# crash in a sequential Pandas UDF.

_TS_NULL_REGRESSION_SET = [
    "q_join_asof",              # ASOF NULL-probe semantics
    "q_stream_tumbling",        # event-time stream drop vs NULL bucket
    "q_table_scd2",             # ordered-history boundary shift
    "q_ts_ohlc",                # NULL time-bucket mint
    "q_ts_ewma_daily",          # _daily_cents ordered traversal
    "q_window_session_native",  # session-window event time
    "q_sql_named_window",       # order-only NULLS LAST pin
    "q_udf_debounce",           # Arrow NaT in a sequential UDF
]


@pytest.fixture(scope="module")
def null_twin_ts(tmp_path_factory):
    from tools.audit_null_conventions import build_twin

    dst = str(tmp_path_factory.mktemp("nulltwin_ts"))
    build_twin(SF, dst, with_ts=True)
    return dst


def test_ts_null_convention_regression_set(spark, null_twin_ts):
    import duckdb

    from tools.check_correctness import canon_rows, duck_run, spark_rows

    from mini_etl_project_spark.queries import ORACLES, QUERIES
    from mini_etl_project_spark.session import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{null_twin_ts}/{t}.parquet')"
        )
    bad: list[str] = []
    for name in _TS_NULL_REGRESSION_SET:
        try:
            scols, srows = spark_rows(QUERIES[name](spark, null_twin_ts))
            dcols, drows = duck_run(con, ORACLES[name])
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: engine error on ts-NULL twin: {e}")
            continue
        if sorted(scols) != sorted(dcols) or canon_rows(
            scols, srows
        ) != canon_rows(dcols, drows):
            bad.append(f"{name}: cross-engine divergence on ts-NULL twin")
    assert not bad, "ts-NULL-convention regression:\n" + "\n".join(bad)


# -- X522 context-window packing: plain-Python recompute ---------------------


def _py_tokens(text):
    return [t for t in text.split() if t] if text is not None else []


def test_pack_sequences_python_recompute(spark):
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "source", "text"]
    )
    docs = sorted(
        (
            (r[1], r[2], r[0], len(_py_tokens(r[3])))
            for r in zip(
                t["doc_id"].to_pylist(),
                t["lang"].to_pylist(),
                t["source"].to_pylist(),
                t["text"].to_pylist(),
            )
            if r[1] is not None and r[2] is not None and r[3] is not None
        )
    )
    from mini_etl_project_spark.queries.corpus_q import PACK_BUDGET

    expected = {}
    cur_key, pack_id, running = None, 0, None
    for lang, source, doc_id, n_tok in docs:
        if (lang, source) != cur_key:
            cur_key, pack_id, running = (lang, source), 0, None
        if running is None or running + n_tok > PACK_BUDGET:
            pack_id += 1
            running = n_tok
            expected[(lang, source, pack_id)] = [
                1, n_tok, n_tok * 1000000 // PACK_BUDGET, doc_id, doc_id,
            ]
        else:
            running += n_tok
            row = expected[(lang, source, pack_id)]
            row[0] += 1
            row[1] += n_tok
            row[2] = row[1] * 1000000 // PACK_BUDGET
            row[4] = doc_id
    got = {
        (r["lang"], r["source"], r["pack_id"]): [
            r["n_docs"], r["pack_tokens"], r["fill_ppm"],
            r["first_doc"], r["last_doc"],
        ]
        for r in QUERIES["q_corpus_pack_sequences"](spark, SF).collect()
    }
    assert got == expected
    # structural invariants: no pack except a singleton oversize one
    # exceeds the budget, and pack ids are dense from 1 per shard
    per_shard = defaultdict(list)
    for (lang, source, pid), row in got.items():
        per_shard[(lang, source)].append(pid)
        assert row[1] <= PACK_BUDGET or row[0] == 1
    for pids in per_shard.values():
        assert sorted(pids) == list(range(1, len(pids) + 1))


# -- X523 BPE merge-pair statistics: plain-Python recompute ------------------


def test_bpe_pairs_python_recompute(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    occ = defaultdict(int)
    inwords = defaultdict(set)
    for text in t["text"].to_pylist():
        for w in _py_tokens(text):
            for i in range(len(w) - 1):
                occ[w[i : i + 2]] += 1
                inwords[w[i : i + 2]].add(w)
    # NOTE the vocabulary trick is invisible here on purpose: plain
    # per-occurrence counting must equal the vocab-weighted aggregate.
    ranked = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expected = [
        (pair, n, len(inwords[pair]), i + 1)
        for i, (pair, n) in enumerate(ranked)
    ]
    got = [
        (r["pair"], r["occ"], r["n_words"], r["rnk"])
        for r in QUERIES["q_corpus_bpe_pairs"](spark, SF)
        .orderBy("rnk")
        .collect()
    ]
    assert got == expected


# -- X524 per-turn reward-to-go: plain-Python recompute ----------------------


def test_turn_reward_togo_python_recompute(spark):
    t = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )
    by_user = defaultdict(list)
    for uid, ts, eid, etype, val in zip(
        t["user_id"].to_pylist(), t["ts"].to_pylist(),
        t["event_id"].to_pylist(), t["event_type"].to_pylist(),
        t["value"].to_pylist(),
    ):
        by_user[uid].append((ts, eid, etype, val))
    pooled = defaultdict(lambda: [0, 0])  # (uid, turn) -> [n, cents]
    for uid, evs in by_user.items():
        evs.sort(key=lambda e: (e[0] is None, e[0] or 0, e[1]))
        turn = 0
        for ts, eid, etype, val in evs:
            if etype in ("click", "view"):
                turn += 1
            elif val is not None:
                row = pooled[(uid, turn)]
                row[0] += 1
                row[1] += half_up(val, 100)
    expected = {}
    for uid in {k[0] for k in pooled}:
        turns = sorted(k[1] for k in pooled if k[0] == uid)
        for i, turn in enumerate(turns):
            later = turns[i:]
            expected[(uid, turn)] = (
                pooled[(uid, turn)][0],
                pooled[(uid, turn)][1],
                sum(pooled[(uid, tt)][1] for tt in later),
                len(later) - 1,
            )
    got = {
        (r["user_id"], r["turn"]): (
            r["n_candidates"], r["turn_cents"],
            r["togo_cents"], r["n_turns_after"],
        )
        for r in QUERIES["q_corpus_turn_reward_togo"](spark, SF).collect()
    }
    assert got == expected
    assert got, "vacuous surface"
    # telescoping invariant: togo(t) = turn(t) + togo(next t)
    for (uid, turn), (_, tc, togo, n_after) in got.items():
        nxt = [
            v for (u2, t2), v in got.items() if u2 == uid and t2 > turn
        ]
        if n_after == 0:
            assert togo == tc
        else:
            nxt_turn = min(t2 for (u2, t2) in got if u2 == uid and t2 > turn)
            assert togo == tc + got[(uid, nxt_turn)][2]


def test_turn_reward_togo_single_shuffle(spark):
    """Turn window, pooling groupBy, and suffix-sum window all key on
    user_id — exactly one shuffle exchange end to end."""
    df = QUERIES["q_corpus_turn_reward_togo"](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    import re

    plan = df._jdf.queryExecution().explainString(mode)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}:\n{plan}"
