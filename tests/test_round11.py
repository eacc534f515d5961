"""Round-11: X516 margin calibration + the vacuity-fix contracts.

X516's surface is recomputed from the raw parquet with plain Python
(pyarrow + hashlib — no Spark, no DuckDB) and required to agree exactly,
the same two-engines-can-both-be-wrong discipline as test_round10b. The
monotonicity invariant the judge asked for (VERDICT r10 ask #6) is pinned
on the statistically meaningful bins: the probe's win probability is the
noise-difference CDF, monotone in margin by construction, so the
empirical curve must be non-decreasing wherever a bin holds enough pairs
for the CDF to dominate sampling noise (>= 30 pairs; static data, so
this is a deterministic pin, not a flaky statistical test).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from mini_etl_project_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _h60(prefix: str, event_id: int) -> int:
    return int(hashlib.md5(f"{prefix}{event_id}".encode()).hexdigest()[:15], 16)


def _cents(val: float) -> int:
    return int(Decimal(repr(val * 100)).quantize(Decimal(1), ROUND_HALF_UP))


@pytest.fixture(scope="module")
def margin_cal_python():
    """Plain-Python rebuild of the X516 surface from raw parquet."""
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "value"]
    )
    by_user: dict[int, list[tuple[int, int, int]]] = defaultdict(list)
    for uid, eid, val in zip(
        t["user_id"].to_pylist(),
        t["event_id"].to_pylist(),
        t["value"].to_pylist(),
    ):
        if val is None:
            continue
        noise = _h60("n", eid) % 50001 - 25000
        by_user[uid].append((_h60("p", eid), eid, _cents(val), noise))
    bins: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])  # n, wins, sum_margin
    for cand in by_user.values():
        cand.sort()  # (pairing hash, event_id) — the held-out pair order
        for i in range(0, len(cand) - 1, 2):
            a, b = cand[i], cand[i + 1]
            # chosen = higher cents, tie to smaller event_id
            (ch, rj) = (a, b) if (a[2], -a[1]) > (b[2], -b[1]) else (b, a)
            margin = ch[2] - rj[2]
            win = 1 if ch[2] + ch[3] > rj[2] + rj[3] else 0
            b_ = min(margin // 5000, 10)
            bins[b_][0] += 1
            bins[b_][1] += win
            bins[b_][2] += margin
    return {
        b: {
            "n_pairs": n,
            "n_wins": w,
            "win_rate_ppm": w * 1_000_000 // n,
            "mean_margin_cents": s // n,
        }
        for b, (n, w, s) in bins.items()
    }


def test_margin_calibration_matches_python(spark, margin_cal_python):
    got = {
        r["bin"]: r
        for r in QUERIES["q_corpus_margin_calibration"](spark, SF).collect()
    }
    assert set(got) == set(margin_cal_python)
    for b, exp in margin_cal_python.items():
        r = got[b]
        for k in ("n_pairs", "n_wins", "win_rate_ppm", "mean_margin_cents"):
            assert r[k] == exp[k], (b, k, r[k], exp[k])


def test_margin_calibration_monotone(spark, margin_cal_python):
    """The calibration curve's defining invariant: win rate is
    non-decreasing in margin bin wherever the bin holds >= 30 pairs
    (above that the noise-CDF signal dominates the per-bin sampling
    noise on this static data; near-empty tail bins may legitimately
    wobble and are excluded)."""
    dense = sorted(
        (b, v["win_rate_ppm"])
        for b, v in margin_cal_python.items()
        if v["n_pairs"] >= 30
    )
    assert len(dense) >= 3, "expected several dense bins at sf0.001"
    rates = [r for _, r in dense]
    assert rates == sorted(rates), f"calibration not monotone: {dense}"
    # the curve must actually RISE (a flat 0.5 line would mean the probe
    # carries no signal): top dense bin beats the bottom by >= 2 points
    assert rates[-1] - rates[0] >= 20_000


def test_good_turing_populated_and_identity(spark):
    """The round-11 vacuity fix: exactly 20 count-of-count rows at every
    SF (the 20 lowest frequency ranks present), and the Good-Turing
    identity r*_num = (r+1)·N_{r+1} holds against the emitted table."""
    rows = QUERIES["q_text_good_turing"](spark, SF).collect()
    assert len(rows) == 20
    n_r = {r["r"]: r["n_r"] for r in rows}
    for row in rows:
        nxt = n_r.get(row["r"] + 1)
        if nxt is not None:  # neighbor inside the emitted window
            assert row["r_star_num"] == (row["r"] + 1) * nxt
        assert row["r_star_den"] == row["n_r"]
        assert (
            row["r_star_ppm"]
            == 1_000_000 * row["r_star_num"] // row["r_star_den"]
        )


def test_setop_except_nonempty(spark):
    """The second vacuity-audit hit stays non-empty: orders' custkeys
    minus BUILDING customers exists at every SF by construction."""
    assert QUERIES["q_setop_except"](spark, SF).take(1)


def test_bon_yield_monotone_and_anchored(spark):
    """X518 invariants: the yield curve is non-increasing in threshold
    (margin >= t is a nested family of events), anchored at t=0 with
    yield = 100% of margin-bearing prompts (X513 margins are >= 0 by the
    argmax construction), with n_prompts constant across rows."""
    rows = sorted(
        QUERIES["q_corpus_bon_yield"](spark, SF).collect(),
        key=lambda r: r["threshold_cents"],
    )
    assert [r["threshold_cents"] for r in rows] == list(range(0, 10001, 1000))
    assert len({r["n_prompts"] for r in rows}) == 1
    accepted = [r["n_accepted"] for r in rows]
    assert accepted == sorted(accepted, reverse=True)
    assert rows[0]["n_accepted"] == rows[0]["n_prompts"]
    assert rows[0]["yield_ppm"] == 1_000_000
    for r in rows:
        assert r["yield_ppm"] == r["n_accepted"] * 1_000_000 // r["n_prompts"]


def test_kto_labels_match_python(spark):
    """X519 plain-Python recomputation + the median order-statistic
    invariants: strictly-above and strictly-below counts are each <=
    n/2, ties = candidates exactly at the median, and the exact x2
    median matches the sorted middle pair."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "value"]
    )
    by_user = defaultdict(list)
    for uid, eid, val in zip(
        t["user_id"].to_pylist(),
        t["event_id"].to_pylist(),
        t["value"].to_pylist(),
    ):
        if val is not None:
            by_user[uid].append(_cents(val))
    got = {
        r["user_id"]: r
        for r in QUERIES["q_corpus_kto_labels"](spark, SF).collect()
    }
    assert set(got) == set(by_user)
    for uid, cents in by_user.items():
        cents.sort()
        n = len(cents)
        m2 = cents[(n - 1) // 2] + cents[n // 2]
        des = sum(1 for c in cents if 2 * c > m2)
        und = sum(1 for c in cents if 2 * c < m2)
        r = got[uid]
        assert r["n_candidates"] == n
        assert r["median_cents_x2"] == m2
        assert (r["n_desirable"], r["n_undesirable"]) == (des, und)
        assert r["n_tie"] == n - des - und
        # median order statistics: at most half strictly on each side
        assert des <= n // 2 and und <= n // 2
        assert r["desirable_ppm"] == des * 1_000_000 // max(des + und, 1)
