"""Benchmark harness — driver contract (BASELINE.md protocol).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Protocol: warm SparkSession, 1 warm-up run then median of 5 timed runs per
query; per-query seconds reported; ``value`` is the sum of medians. (5,
not 3: the host shows sporadic multi-second whole-JVM stalls — verified
external, GC time is <100 ms during an 8 s spike — and a median of 3
flips high when two land in one query's window; 5 keeps one spike from
moving any median.)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mini_etl_project_spark.queries import QUERIES
from mini_etl_project_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",     # flagship grouped aggregation
    "q03_shipping_priority",   # join-heavy + top-k
    "q05_region_revenue",      # 6-way join
    "q06_revenue_change",      # selective scan
    "q10_returned_items",      # join + group + top-k
    "q_window_topk_per_group", # window ranking
    "q_etl_pipeline",          # full AutoETL (profile→clean→impute→dedup)
    "q_dedup_minhash_lsh",     # MinHash+LSH near-dup pipeline
    "q_sim_topk_exact",        # brute-force cosine top-k
    "q_stream_tumbling",       # structured streaming windowed agg
]


def run_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    # "noop" sink materializes every column of every row (unlike count(),
    # which lets Catalyst prune the final project) without write-side cost.
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def prewarm_page_cache(sf_dir: str) -> int:
    """Read every parquet byte once so the first timed scans hit the OS
    page cache — round-6 measured a cold-cache first run 3.5 s over its
    quiet band on unchanged code. Returns bytes touched."""
    total = 0
    try:
        import glob

        for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
            with open(path, "rb") as f:
                while True:
                    chunk = f.read(1 << 24)
                    if not chunk:
                        break
                    total += len(chunk)
    except OSError:
        pass
    return total


def read_cpu_steal() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — hypervisor steal
    is invisible in load average but shows directly here."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


# q06 (selective scan, untouched since round 1) quiet-host band across
# r1-r8 quiet runs: 0.27-0.42 s. A median above the ceiling means the
# host was contended during this run, not that the plan regressed.
_Q06_BAND = (0.27, 0.45)

# Host-drift normalization (BASELINE.md, round-10 protocol note): q06's
# plan has not changed since round 1, so its measured median is a pure
# probe of the host's sustained throughput during THIS run. Scaling the
# total by (band midpoint / measured q06) yields a second, host-
# independent metric so cross-round trends no longer need manual
# adjudication against quiet-host records. The raw total stays the
# primary driver metric; the normalized one is the trend line.
_Q06_BAND_MID = round(sum(_Q06_BAND) / 2, 4)

# Second probe (VERDICT r10 ask #5): q06 is ONE plan shape (selective
# scan) — a steal window that lands on shuffles but not scans fools a
# single-probe correction. q_window_topk_per_group (scan + window sort
# + shuffle, plan untouched since round 1) probes the shuffle path.
# Quiet-band from the committed BENCH_r02-r10 artifacts (excluding the
# r5 contended run): 0.29-0.46 s. The normalized metric stays q06-based
# for cross-round continuity; `normalized_trusted` now additionally
# requires the two probes' implied correction factors to agree within
# 15% — disagreement means the drift was non-uniform across plan
# shapes, so no single scalar correction is honest.
_TOPK_BAND = (0.29, 0.46)
_TOPK_BAND_MID = round(sum(_TOPK_BAND) / 2, 4)
_PROBE_AGREE_TOL = 0.15

# Separately-tracked lanes (VERDICT r11 ask #3): timed with the same
# warm-up + median-of-5 protocol but reported under "extra_lanes" and
# NOT added to the headline total — the 16.8 s baseline's cross-round
# continuity must hold. Band notes live in BASELINE.md.
EXTRA_LANES = [
    "q_corpus_incremental_ingest",  # composed corpus-ingest shape (X517)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    prewarm_page_cache(sf_dir)
    try:
        load_avg = round(os.getloadavg()[0], 2)
    except OSError:
        load_avg = None
    steal0, jiff0 = read_cpu_steal()
    names = [n for n in HEADLINE if n in QUERIES]
    results: dict[str, float] = {}
    for name in names:
        run_once(spark, name, sf_dir)  # warm-up (also warms file/metadata caches)
        results[name] = round(statistics.median(run_once(spark, name, sf_dir) for _ in range(5)), 4)
    total = round(sum(results.values()), 4)
    # extra lanes: same protocol, excluded from the headline total
    extra: dict[str, float] = {}
    for name in (n for n in EXTRA_LANES if n in QUERIES):
        run_once(spark, name, sf_dir)
        extra[name] = round(statistics.median(run_once(spark, name, sf_dir) for _ in range(5)), 4)
    steal1, jiff1 = read_cpu_steal()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (jiff1 - jiff0), 2)
        if jiff1 > jiff0
        else 0.0
    )
    q06 = results.get("q06_revenue_change")
    contended = bool(
        steal_pct > 2.0 or (q06 is not None and q06 > _Q06_BAND[1])
    )
    normalized = (
        round(total * _Q06_BAND_MID / q06, 4) if q06 else None
    )
    # Dual-probe agreement gate: both probes' correction factors
    # (band midpoint / measured) must tell the same host story.
    topk = results.get("q_window_topk_per_group")
    probes_agree = None
    if q06 and topk:
        corr_q06 = _Q06_BAND_MID / q06
        corr_topk = _TOPK_BAND_MID / topk
        probes_agree = abs(corr_q06 / corr_topk - 1.0) <= _PROBE_AGREE_TOL
    # 'probe missing' is not 'probes disagreed' (ADVICE r11): with only
    # one probe the trusted flag degrades to the pre-r11 single-probe
    # gate (not contended) and the artifact says why.
    if probes_agree is None:
        trusted, trust_reason = bool(not contended), "single_probe_only"
    elif not probes_agree:
        trusted, trust_reason = False, "probes_disagree"
    else:
        trusted, trust_reason = bool(not contended), (
            "ok" if not contended else "contended"
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
                # host-condition annotation (BASELINE.md protocol): the
                # number is only comparable across rounds on a quiet host
                "contended": contended,
                "steal_pct": steal_pct,
                "load_avg_start": load_avg,
                "q06_quiet_band": list(_Q06_BAND),
                # drift-corrected trend metric: total scaled by how far
                # the q06 probe sat from its quiet-band midpoint. Only
                # meaningful on UNCONTENDED runs (uniform host drift);
                # under active steal the probe and the workload are hit
                # non-uniformly and the correction over/under-shoots —
                # normalized_trusted carries that gate in the artifact.
                "normalized_total_sec": normalized,
                "normalized_trusted": trusted,
                "trust_reason": trust_reason,
                "q06_band_mid": _Q06_BAND_MID,
                # second untouched probe (shuffle/window shape) + the
                # cross-probe agreement that gates the trusted flag
                "topk_probe_band": list(_TOPK_BAND),
                "topk_band_mid": _TOPK_BAND_MID,
                "probes_agree": probes_agree,
                # separately-tracked lanes, NOT in "value" (see EXTRA_LANES)
                "extra_lanes": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
