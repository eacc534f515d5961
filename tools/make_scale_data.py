"""Synthesize a larger scale factor locally by replicating sf0.1 facts.

The driver provides testdata up to sf0.1; the 100 TB posture claims in
SCALE_VALIDATION.md need at least one order-of-magnitude extrapolation
point. This replicates each FACT table N times with shifted keys (orders/
lineitem share the orderkey shift so joins stay consistent; events get
shifted users so session/user cardinality scales; documents/embeddings get
shifted ids, which also makes the dedup corpus 10x-duplicated — a
realistic near-dup stress). Dimensions stay fixed, as in TPC-H where fact
growth dominates.

Usage: python tools/make_scale_data.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mini_etl_project_spark.session import get_spark, load_table

DIMS = ("region", "nation", "customer", "supplier", "part")
KEY_SHIFTS = {
    # table -> columns shifted by copy_index * offset
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
OFFSET = 10_000_000_000  # far above any real key at sf0.1


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make_scale_data")
    os.makedirs(out, exist_ok=True)

    for t in DIMS:
        load_table(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        print(f"{t}: copied")

    for t, keys in KEY_SHIFTS.items():
        base = load_table(spark, src, t)
        parts = []
        for i in range(factor):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            parts.append(c)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        # Repartition so the output has enough row groups to scan in
        # parallel (the whole point of the scale test).
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: x{factor} -> {n} rows")


if __name__ == "__main__":
    main()
