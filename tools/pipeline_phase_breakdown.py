"""Phase breakdown of the AutoETL pipeline at a given SF.

VERDICT r9 ask #6: the approx-profile flag cut the 100x transform
168.8 -> 94.9 s; this instruments WHERE the residual goes — the fused
stats groupBy, the outlier stats job, or the final dropDuplicates
shuffle — without touching the pipeline (pure monkeypatch timers).

Usage: python tools/pipeline_phase_breakdown.py [sf_dir] [sample_mod] [digest]
Prints one JSON line with per-phase seconds. digest=1 keys the R17 dedup
on a 16-byte row digest instead of the wide row (round-11 experiment).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mini_etl_project_spark.plans.pipeline import AutoETLPipeline
from mini_etl_project_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    digest = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    spark = get_spark("pipe_phase")
    l = load_table(spark, sf_dir, "lineitem")
    raw = l.select(
        F.col("l_orderkey").cast("string").alias("okey"),
        F.when(F.col("l_linenumber") == 3, "N/A")
        .otherwise(
            F.concat(F.lit("$"), F.col("l_extendedprice").cast("string"))
        )
        .alias("price"),
        F.date_format("l_shipdate", "dd/MM/yyyy").alias("ship"),
        F.col("l_returnflag").alias("flag"),
    )

    phases: dict[str, float] = {}

    def timed(cls, meth):
        orig = getattr(cls, meth)

        def wrap(*a, **kw):
            t0 = time.time()
            out = orig(*a, **kw)
            phases[meth] = phases.get(meth, 0.0) + round(time.time() - t0, 2)
            return out

        setattr(cls, meth, wrap)

    for m in ("_fused_stats", "_outlier_stats", "_category_and_mode_stats"):
        timed(AutoETLPipeline, m)

    pipe = AutoETLPipeline(
        compat=True,
        eager_summary=False,
        exact_stats=False,
        assume_partitioned=True,
        profile_sample_mod=mod if mod > 1 else None,
        dedup_digest=digest,
    )
    t0 = time.time()
    result = pipe.transform(raw)
    t_transform = round(time.time() - t0, 2)

    t0 = time.time()
    n_pre = pipe._pre_dedup.count()
    t_pre_count = round(time.time() - t0, 2)

    t0 = time.time()
    n = result.count()
    t_final = round(time.time() - t0, 2)
    pipe.release()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "sample_mod": mod,
                "dedup_digest": digest,
                "transform_call_sec": t_transform,
                "phases": phases,
                "pre_dedup_count_sec": t_pre_count,
                "final_count_sec": t_final,
                "dedup_overhead_sec": round(t_final - t_pre_count, 2),
                "rows_pre": n_pre,
                "rows_final": n,
                "total_sec": round(t_transform + t_final, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
