"""Round-10b: independent plain-Python recomputation of X513-X515.

Two engines agreeing exactly can still both be wrong (the round-9
lesson that motivated the libm verifier layer). These tests recompute
best-of-n, DPO pairs, and GRPO advantage from the RAW parquet with
plain Python (pyarrow + math — no Spark, no DuckDB) and require exact
agreement with the Spark plans, plus the structural invariants each
definition promises.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from mini_etl_project_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def raw_events():
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "event_id", "value"])
    by_user: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for uid, eid, val in zip(
        t["user_id"].to_pylist(), t["event_id"].to_pylist(), t["value"].to_pylist()
    ):
        # Half-up on the double's shortest repr — exactly Spark's ROUND
        # (BigDecimal.valueOf(d) = shortest repr, then HALF_UP). The old
        # floor(x*100 + 0.5) diverged on the 0.49999999999999994 class
        # and on negatives (round-11 ADVICE pin).
        by_user[uid].append(
            (eid, int(Decimal(repr(val * 100)).quantize(Decimal(1), ROUND_HALF_UP)))
        )
    return by_user


def test_best_of_n_matches_python(spark, raw_events):
    got = {
        r["user_id"]: r
        for r in QUERIES["q_corpus_best_of_n"](spark, SF).collect()
    }
    assert set(got) == set(raw_events)
    for uid, cand in raw_events.items():
        ranked = sorted(cand, key=lambda t: (-t[1], t[0]))
        r = got[uid]
        assert r["n_candidates"] == len(cand)
        assert r["best_event_id"] == ranked[0][0]
        assert r["best_cents"] == ranked[0][1]
        if len(ranked) >= 2:
            assert r["margin_cents"] == ranked[0][1] - ranked[1][1]
            assert r["margin_cents"] >= 0  # invariant: argmax beats runner-up
        else:
            assert r["margin_cents"] is None


def test_dpo_pairs_match_python(spark, raw_events):
    got = {
        r["user_id"]: r
        for r in QUERIES["q_corpus_dpo_pairs"](spark, SF).collect()
    }
    expected_users = set()
    for uid, cand in raw_events.items():
        hi = sorted(cand, key=lambda t: (-t[1], t[0]))[0]
        lo = sorted(cand, key=lambda t: (t[1], t[0]))[0]
        if len(cand) >= 2 and hi[1] - lo[1] >= 1:
            expected_users.add(uid)
            r = got[uid]
            assert (r["chosen_event_id"], r["chosen_cents"]) == hi
            assert (r["rejected_event_id"], r["rejected_cents"]) == lo
            assert r["gap_cents"] == hi[1] - lo[1] >= 1
            # invariant: a pair never degenerates to the same candidate
            assert r["chosen_event_id"] != r["rejected_event_id"]
    assert set(got) == expected_users


def test_grpo_advantage_matches_python(spark, raw_events):
    got = {
        r["user_id"]: r
        for r in QUERIES["q_corpus_grpo_advantage"](spark, SF).collect()
    }
    for uid, cand in raw_events.items():
        if len(cand) < 2:
            assert uid not in got
            continue
        cents = [c for _, c in cand]
        n, s = len(cents), sum(cents)
        q = sum(c * c for c in cents)
        r = got[uid]
        assert r["n_candidates"] == n and r["sum_cents"] == s
        # integer-exact above-mean count
        assert r["n_pos"] == sum(1 for c in cents if c * n > s)
        best = sorted(cand, key=lambda t: (-t[1], t[0]))[0]
        assert (r["best_event_id"], r["best_cents"]) == best
        num = q * n - s * s  # = n(n-1)·var_ddof1 in cents², exact int
        assert num >= 0  # Cauchy-Schwarz
        if num == 0:
            assert r["adv_best"] is None
            continue
        # replicate the plan's exact op order: each a single correctly-
        # rounded double op, so Python floats reproduce it bit-for-bit
        mean = float(s) / float(n)
        var = (float(num) / float(n)) / (float(n) - 1.0)
        adv = (float(best[1]) - mean) / math.sqrt(var)
        assert r["adv_best"] == adv, (uid, r["adv_best"], adv)
        # invariant: the max candidate sits at or above the group mean
        assert r["adv_best"] >= 0.0
