"""Registry-wide output contract: every query's result schema is scalar.

The driver canonicalizes query output through pandas (sort_values over
object columns), which cannot hash list/dict-valued cells — round 6's
only red row (q_fn_array_v34) was exactly this class of failure, with
correct values. This test freezes the fix: no registered query may emit
an Array/Map/Struct column. Plan-only (schema is resolved without
executing), so walking the whole registry is cheap.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

from mini_etl_project_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def test_no_nonscalar_output_columns(spark):
    bad: list[str] = []
    errors: list[str] = []
    for name, fn in sorted(QUERIES.items()):
        try:
            schema = fn(spark, SF).schema
        except Exception as e:  # noqa: BLE001 — collect, don't abort the walk
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
            # DECIMAL(p>18) degrades to float64 on the DuckDB side of the
            # driver's pandas canonicalizer while Spark keeps
            # decimal.Decimal — identical values hash-diverge (r7's one
            # red row, q_join_pvm_bridge). Serialize wide decimals to
            # VARCHAR in-plan (exact at any magnitude) on BOTH engines.
            if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18:
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not errors, "plan build failed for:\n" + "\n".join(errors[:10])
    assert not bad, (
        "non-transportable output columns (driver canonicalizer cannot "
        "hash these — serialize in-plan via array_join/to_json, and "
        "DECIMAL(p>18) via CAST AS VARCHAR on both engines):\n"
        + "\n".join(bad)
    )


# Structural `Scan parquet` ceilings, recorded by the round-9 full-
# registry audit (SCALE_VALIDATION.md "full-registry scan-count audit")
# and measured again when this test was frozen (round 10, sf0.001).
# The re-derivation class recurs — a bounded derived table consumed by
# multiple downstream branches (or an iteration replaying its lineage)
# re-derives its fact-scan subtree once PER CONSUMER, and AQE exchange
# reuse does NOT reliably deduplicate it: round 9 found final plans
# with 10-132 scans where 1-2 are structural (kl_drift 10->1,
# link_predict 132->checkpointed). 0 = every scan happens inside a
# one-time eager localCheckpoint build; the final plan reads only
# checkpointed RDDs. Counting convention: formatted explain prints
# each scan node twice (tree line + detail header), so every non-zero
# value here is 2x the physical scan count — consistent across all
# records in this file (each was measured with exactly this counter).
_SCAN_CEILING: dict[str, int] = {
    # round-11 new/retouched queries
    "q_corpus_margin_calibration": 2,  # ONE events scan (window + 2 aggs)
    "q_corpus_incremental_ingest": 0,  # all bounded tables checkpointed
    "q_corpus_bon_yield": 0,  # margin table checkpointed (2 consumers)
    "q_corpus_kto_labels": 2,  # ONE events scan (two window stages + agg)
    "q_text_good_turing": 0,  # count-of-counts checkpointed (3 consumers)
    "q_setop_except": 4,  # two structural legs (orders, customer)
    # round-10 new queries (X513-X515; 2 = ONE physical scan)
    "q_corpus_best_of_n": 2,
    "q_corpus_dpo_pairs": 2,
    "q_corpus_grpo_advantage": 2,  # was 6 pre-merge: window-based
    # moments replaced the groupBy + re-join (3 scans -> 1)
    # the round-9 audit's ten restructured plans
    "q_graph_link_predict": 0,
    "q_etl_ipf_raking": 0,
    "q_ml_pca_power": 0,
    "q_graph_triangles": 0,
    "q_ts_wavelet_haar": 0,
    "q_setop_percent_of_parent": 0,
    "q_ts_durbin_watson": 0,
    "q_text_unigram_kl_drift": 0,
    "q_text_unigram_surprisal": 2,  # LM estimate + scoring — inherent
    # round-9 new queries (structural floors at freeze time)
    "q_sim_ann_ml_brp_acct": 10,  # MLlib BRP model+twin accounting legs
    "q_ml_entropy_monthly": 0,
    "q_ml_kl_divergence": 0,
    "q_ml_mutual_information": 0,
    "q_ml_log_loss": 0,
    "q_text_pmi_collocations": 0,
    "q_text_zipf_fit": 0,
    "q_ml_aic_bic": 0,
    "q_ml_odds_ratio": 0,
    "q_ml_info_gain_ranking": 0,
    "q_ml_hellinger_drift": 0,
    "q_ml_psi": 0,
    "q_ts_macd": 0,
    "q_ts_rsi": 0,
    "q_ts_hurst": 0,
    "q_ml_tukey_hsd": 0,
    "q_ml_bland_altman": 0,
    "q_ml_poisson_rate_test": 2,  # two independent event windows
    "q_corpus_curriculum": 0,
    "q_corpus_conversation_assembly": 2,  # sessionize + transcript legs
    "q_corpus_perplexity_filter": 2,  # LM estimate + scoring — inherent
    "q_ml_boxcox_grid": 0,
    "q_ml_cliffs_delta": 2,  # two group-value grids
    "q_ml_sign_test": 2,  # paired windows
    "q_text_rank_overlap_profile": 4,  # two top-k legs x (rank + join)
}


def test_scan_count_ceilings(spark):
    """VERDICT r9 ask #3: freeze the scan-count audit as a contract.
    A plan re-derivation regression (the 10-132x scan class) must fail
    the suite, not wait for a future judge's audit. Ceilings are the
    recorded structural floors; a legitimate improvement lowers the
    measured count and still passes — only regressions fail."""
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    bad: list[str] = []
    for name, ceiling in sorted(_SCAN_CEILING.items()):
        df = QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(mode)
        got = plan.count("Scan parquet")
        if got > ceiling:
            bad.append(f"{name}: {got} scans > recorded floor {ceiling}")
    assert not bad, (
        "plan re-derivation regression (checkpoint the bounded derived "
        "table — see SCALE_VALIDATION.md round-9 audit):\n"
        + "\n".join(bad)
    )


def test_oracle_names_subset_and_unique():
    """Every oracle key resolves to a registered query (no orphan SQL),
    and registration raised on duplicates (the X204 shadowing class)."""
    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, f"oracle SQL with no registered query: {orphans}"


def test_rotation_defers_new_queries_behind_drain():
    """Round-10 rotation contract: names in _DEFER_NEW sit AFTER every
    non-deferred never-sampled name, so the driver's ~50/round budget
    drains the old evidence gap before sampling this round's additions
    (VERDICT r9 ask #1)."""
    import glob
    import json
    import os
    import re

    from mini_etl_project_spark.queries import _DEFER_NEW

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        if re.search(r"_r(\d+)", os.path.basename(f)):
            try:
                sampled.update(json.load(open(f)))
            except (OSError, ValueError):
                continue
    order = list(QUERIES)
    pos = {n: i for i, n in enumerate(order)}
    never = [n for n in order if n not in sampled and n not in set(_DEFER_NEW)]
    if not never:  # fully drained: deferral is moot
        return
    last_never = max(pos[n] for n in never)
    for n in _DEFER_NEW:
        if n in pos and n not in sampled:
            assert pos[n] > last_never, (n, pos[n], last_never)


def test_coverage_doc_names_resolve():
    """Every `q_*` name cited in COVERAGE.md resolves to a registered
    query — a doc/registry drift (rename, removal) can't sit silently
    behind a stale inventory row (the X204 lesson, doc side)."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "COVERAGE.md")).read()
    cited = {
        n for n in re.findall(r"\bq_[a-z0-9_]+", text) if not n.endswith("_")
    }  # drop glob artifacts like `q_stream_*`
    # Documented env-gated registrations (absent in this container):
    gated = {"q_stream_stateful_v2"}  # protobuf-gated, streaming_q.py:411
    missing = sorted(n for n in cited - gated if n not in QUERIES)
    assert not missing, f"COVERAGE.md cites unregistered queries: {missing}"


def test_no_vacuous_oracle_rows_at_gate_sf(spark):
    """VERDICT r10 ask #1: a driver green row only carries evidence when
    the compared result is NON-EMPTY — q_text_good_turing passed the gate
    for rounds with 0 rows in both engines (its r<=20 cap undershot
    sf0.01's frequency floor of 26), proving nothing. Every oracle-backed
    query must return >=1 row at the gate SF (sf0.01, the SF the driver
    compares at). The round-11 full-registry audit
    (tools/audit_vacuous.py) found exactly two hits — good_turing (cap
    made rank-relative) and q_setop_except (every customer has an order
    in this data; direction flipped) — both fixed; this walk keeps the
    class extinct. take(1) is the cheapest non-emptiness action (Catalyst
    plants a LocalLimit below the final exchange where semantics allow).
    """
    from concurrent.futures import ThreadPoolExecutor

    gate_sf = "/root/testdata/sf0.01"
    empty: list[str] = []
    errors: list[str] = []

    def probe(name: str) -> None:
        try:
            if not QUERIES[name](spark, gate_sf).take(1):
                empty.append(name)
        except Exception as e:  # noqa: BLE001 — collect, don't abort
            errors.append(f"{name}: {type(e).__name__}: {e}")

    # 4 concurrent probes: the per-query cost is job-launch latency, not
    # compute, and SparkSession schedules concurrent actions safely —
    # serial this walk is ~10 min, threaded ~3 (599 queries x ~0.5 s).
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(probe, sorted(ORACLES)))
    assert not errors, "query failed at gate SF:\n" + "\n".join(errors[:10])
    assert not empty, (
        "vacuous oracle rows (0 rows at the gate SF — the green row "
        "proves nothing; make the query's thresholds data-relative or "
        "repoint it at a non-empty slice):\n" + "\n".join(empty)
    )
