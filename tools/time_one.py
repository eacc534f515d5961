"""Time one query with the bench protocol (warm-up + median of N).

Usage: python tools/time_one.py <query_name> [n_runs] [sf_dir]
Prints per-run seconds and the median. Same noop-sink action as bench.py.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_etl_project_spark.queries import QUERIES
from mini_etl_project_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("time_one")
    spark.sparkContext.setJobDescription(f"time_one:{name}")
    ts = []
    for i in range(n + 1):
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        tag = "warmup" if i == 0 else f"run{i}"
        print(f"{tag}: {dt:.3f}", flush=True)
        if i > 0:
            ts.append(dt)
    print(f"median: {statistics.median(ts):.4f}")


if __name__ == "__main__":
    main()
