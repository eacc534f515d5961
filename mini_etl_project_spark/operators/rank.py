"""Distributed exact global ranking.

An unpartitioned ``row_number()`` window drags every row through one
partition — the canonical scale-killer for rankings over unbounded
inputs (users, documents, scores). The distributed-exact form used here:

1. ``repartitionByRange`` on the ranking order (Spark's distributed sort
   machinery — sampled range boundaries, no single-partition stage);
2. a tiny per-partition count table (bounded by the partition count — the
   only unpartitioned window in the plan sits on that aggregate) turned
   into cumulative rank offsets;
3. global rank = broadcast offset + per-partition ``row_number`` (a KEYED
   window on the partition id).

Because the caller supplies a TOTAL, UNIQUE ordering, the resulting rank
is identical no matter where the sampled range boundaries land. The
``localCheckpoint`` pins one physical partitioning so the count pass and
the rank pass agree on partition ids.

Used by q_ml_lift_table (decile ntile) and q_ml_roc_auc (rank-sum AUC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    n_col: str = "n_total",
    num_partitions: int = 32,
) -> DataFrame:
    """Append ``rank_col`` (1-based exact global rank under ``order``,
    which MUST be a total unique ordering) and ``n_col`` (total row
    count) to ``df``. All stages are distributed; no global sort."""
    parts = df.repartitionByRange(num_partitions, *order)
    pid_df = parts.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    counts = pid_df.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    w_prev = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__c").over(w_prev), F.lit(0))
        .cast("bigint")
        .alias("__off"),
        F.sum("__c").over(w_all).cast("bigint").alias(n_col),
    )
    local_rank = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*order)
    )
    return (
        pid_df.withColumn("__lr", local_rank)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_col, (F.col("__off") + F.col("__lr")).cast("bigint")
        )
        .drop("__pid", "__lr", "__off")
    )
