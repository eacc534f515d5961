"""Round-12 measurement harness (guide §1: measure first).

Captures, for each named query (default: the bench HEADLINE + extra lanes):
  - .explain("formatted") → plans/r13/<name>_<tag>.txt
  - warm-up + median-of-5 noop-sink timings (same protocol as bench.py)

Usage: python tools/measure_r13.py <tag> [query ...]
Writes one JSON line with the timings; plans land in plans/r13/.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_etl_project_spark.queries import QUERIES
from mini_etl_project_spark.session import get_spark

DEFAULT = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_revenue_change",
    "q10_returned_items",
    "q_window_topk_per_group",
    "q_etl_pipeline",
    "q_dedup_minhash_lsh",
    "q_sim_topk_exact",
    "q_stream_tumbling",
    "q_corpus_incremental_ingest",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("measure_r13")
    results: dict[str, float] = {}
    for name in names:
        if name not in QUERIES:
            continue
        spark.sparkContext.setJobDescription(f"r13-measure: {name}")
        df = QUERIES[name](spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        def once() -> float:
            t0 = time.time()
            d = QUERIES[name](spark, sf_dir)
            d.write.format("noop").mode("overwrite").save()
            return time.time() - t0
        once()  # warm-up
        results[name] = round(statistics.median(once() for _ in range(5)), 4)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": results,
                      "total": round(sum(results.values()), 4)}))


if __name__ == "__main__":
    main()
