"""Query registry — the engine's declared query surface.

Every operator from SURVEY.md §2 lands here as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an equivalent
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports the registry to
the driver's correctness harness.

Determinism contract (the driver hash-compares values):

- Aggregates over ``double`` columns go through :func:`dsum`/:func:`davg`,
  which sum exactly in ``DECIMAL`` space and cast back to ``double`` — both
  Spark and DuckDB then produce bit-identical results regardless of
  accumulation order, so the engine stays correct under any partitioning
  (and therefore at any scale).
- Every computed column is aliased identically in the DataFrame plan and
  the oracle SQL (the harness matches columns by name).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver runs a rows-only check.

    Duplicate names raise: a second registration would silently shadow
    the first in these dicts (exactly how X204's global Gini was
    unreachable behind X313's keyed Gini for six rounds — round-7 fix).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(existing: {QUERIES[name].__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from mini_etl_project_spark.queries import (  # noqa: F401
        core,
        corpus_q,
        dedup_q,
        etl_q,
        functions_q,
        iterative_q,
        joins,
        llm_q,
        misc_q,
        ml_q,
        sampling_q,
        setops,
        udf_q,
        similarity_q,
        streaming_q,
        table_q,
        text_q,
        timeseries_q,
        tpch_extra,
        tpch_full,
        windows,
    )


# The driver's correctness harness walks entries in registration order with
# a finite per-round budget (~50 observed per round), so ordering is part
# of the contract: entries that most need fresh driver evidence go first.
# The ordering is DATA-DRIVEN from the committed CORRECTNESS_r*.json files:
#   1. _RECHECK — queries whose implementation changed this round (need a
#      fresh green row even if previously sampled);
#   2. never-driver-sampled queries, in stable registration order (new
#      queries land here automatically);
#   3. sampled queries, stalest evidence first (ascending latest round).
# This can never drift: the moment the driver records a round, its file
# re-sorts the rotation for the next one.

#: Queries re-touched this round (fresh driver evidence wanted first).
#: Round 13 (VERDICT r12 ask #3 — drain the driver-evidence debt): the
#: three queries whose PLANS this optimization round reshaped (narrow
#: ETL cache + outlier ride; ingest width pin; boxcox scan widening),
#: two representatives of the 16 pln-memoization lanes (trees identical
#: by construction, locally re-verified exact), then ALL 38 remaining
#: ts-NULL-reshaped lanes whose latest driver evidence predates their
#: r12 mid-build reshape (computed: ts-sweep-touched @query functions in
#: 5f57768..f725d46 minus CORRECTNESS_r12.json greens).
_RECHECK: list[str] = [
    "q_etl_pipeline",
    "q_corpus_incremental_ingest",
    "q_ml_boxcox_grid",
    "q_text_zipf_fit",
    "q_stream_entropy_windowed",
    # -- ts-NULL sweep lanes, local-only evidence until now --
    "q_join_asof_forward",
    "q_join_asof_nearest",
    "q_join_asof_nullpayload",
    "q_join_asof_tolerance",
    "q_ml_psm_match",
    "q_sql_named_window",
    "q_stream_funnel",
    "q_stream_ohlc",
    "q_stream_sliding",
    "q_ts_anomaly",
    "q_ts_autocorr",
    "q_ts_binary_seg",
    "q_ts_bollinger",
    "q_ts_cumsum_reset",
    "q_ts_cusum",
    "q_ts_dickey_fuller",
    "q_ts_ema",
    "q_ts_ema_crossover",
    "q_ts_forecast_eval",
    "q_ts_markov_transitions",
    "q_ts_ohlc",
    "q_ts_paths",
    "q_ts_pattern_vshape",
    "q_ts_peaks",
    "q_ts_rebase_index",
    "q_ts_rescaled_range",
    "q_ts_runs_test",
    "q_ts_sax",
    "q_ts_seasonal_decompose",
    "q_ts_session_gap",
    "q_ts_transition_matrix",
    "q_ts_xmr_control",
    "q_window_count_distinct",
    "q_window_ignore_nulls",
    "q_window_rolling_regression",
    "q_window_session_dynamic_gap",
    "q_window_session_native",
    "q_window_sliding",
]

#: Round-12's deferral of X520-X524 EXPIRES this round (VERDICT r12:
#: "their deferral expires next round and they must rotate into the r13
#: sample"): empty deferral drops them into the never-sampled bucket,
#: which sorts immediately after _RECHECK — 43 + 4 = 47 of the ~50
#: budget, leaving the tail to the stalest sampled queries.
_DEFER_NEW: list[str] = []


def _driver_evidence() -> dict[str, int]:
    """query name -> latest round with a driver CORRECTNESS row."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(f))
        except (OSError, ValueError):
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _rotation_order(names: list[str]) -> list[str]:
    evidence = _driver_evidence()
    pos = {n: i for i, n in enumerate(names)}
    recheck = [n for n in _RECHECK if n in pos]
    rest = [n for n in names if n not in set(recheck)]
    defer = set(_DEFER_NEW)
    never = [n for n in rest if n not in evidence and n not in defer]
    deferred = [n for n in rest if n not in evidence and n in defer]
    sampled = sorted(
        (n for n in rest if n in evidence),
        key=lambda n: (evidence[n], pos[n]),
    )
    return recheck + never + deferred + sampled


def _reorder() -> None:
    order = _rotation_order(list(QUERIES))
    for registry in (QUERIES, ORACLES):
        ordered = {n: registry[n] for n in order if n in registry}
        registry.clear()
        registry.update(ordered)


_load_all()
_reorder()
