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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    names = [n for n in HEADLINE if n in QUERIES]
    results: dict[str, float] = {}
    for name in names:
        run_once(spark, name, sf_dir)  # warm-up (also warms file/metadata caches)
        results[name] = round(statistics.median(run_once(spark, name, sf_dir) for _ in range(5)), 4)
    total = round(sum(results.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
