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

The ``group`` variant ranks WITHIN each value of a (possibly
low-cardinality) grouping key without concentrating any group into one
partition: range-partitioning on ``(group, order)`` keeps every group's
rows contiguous but still spread over many partitions, and the offsets
table stays bounded — ranges are contiguous, so the number of distinct
(group, pid) pairs is at most ``#groups + num_partitions``. The only
unpartitioned work in the plan is the window over that bounded table.

Used by q_ml_lift_table (decile ntile), q_ml_roc_auc (rank-sum AUC), and
q_agg_percentile_disc (grouped discrete percentiles).
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
    group: list[str] | None = None,
) -> DataFrame:
    """Append ``rank_col`` (1-based exact rank under ``order`` — global,
    or within each ``group`` when given; the ordering MUST be total and
    unique within a group) and ``n_col`` (group row count) to ``df``.
    All fact-scale stages are distributed; no single-partition sort."""
    group = list(group or [])
    gcols = [F.col(g) for g in group]
    parts = df.repartitionByRange(num_partitions, *gcols, *order)
    pid_df = parts.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    counts = pid_df.groupBy(*group, "__pid").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # Bounded-table windows: ≤ #groups + num_partitions rows total.
    w_prev = Window.partitionBy(*group).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(*group).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        *group,
        "__pid",
        F.coalesce(F.sum("__c").over(w_prev), F.lit(0))
        .cast("bigint")
        .alias("__off"),
        F.sum("__c").over(w_all).cast("bigint").alias(n_col),
    )
    local_rank = F.row_number().over(
        Window.partitionBy(*group, "__pid").orderBy(*order)
    )
    return (
        pid_df.withColumn("__lr", local_rank)
        .join(F.broadcast(offsets), [*group, "__pid"])
        .withColumn(
            rank_col, (F.col("__off") + F.col("__lr")).cast("bigint")
        )
        .drop("__pid", "__lr", "__off")
    )


def global_prefix_sum(
    df: DataFrame,
    order: list[Column],
    weight: Column,
    sum_col: str = "prefix_sum",
    total_col: str = "w_total",
    num_partitions: int = 32,
    group: list[str] | None = None,
) -> DataFrame:
    """Append the exact INCLUSIVE running sum of ``weight`` under
    ``order`` (global, or within ``group``) plus the group total —
    without an unpartitioned window.

    Same two-phase shape as :func:`global_rank`: range-partition on the
    ordering, reduce each partition to one weight subtotal (the only
    unpartitioned window runs over that bounded ≤ #groups+partitions
    table), broadcast cumulative offsets back, and finish with a
    per-partition running sum KEYED by partition id. The ordering must
    be total and unique within a group; ``weight`` should be an exact
    type (bigint/decimal) so partial-sum order cannot matter.

    The scale primitive behind cumulative-distribution queries and
    weighted systematic sampling (q_sample_weighted_systematic): a naive
    ``sum().over(Window.orderBy(...))`` drags the whole fact table
    through one partition.
    """
    group = list(group or [])
    gcols = [F.col(g) for g in group]
    parts = df.repartitionByRange(num_partitions, *gcols, *order)
    pid_df = parts.withColumn("__w", weight).withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()
    counts = pid_df.groupBy(*group, "__pid").agg(
        F.sum("__w").alias("__s")
    )
    w_prev = Window.partitionBy(*group).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(*group).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        *group,
        "__pid",
        F.coalesce(F.sum("__s").over(w_prev), F.lit(0)).alias("__off"),
        F.sum("__s").over(w_all).alias(total_col),
    )
    running = F.sum("__w").over(
        Window.partitionBy(*group, "__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        pid_df.withColumn("__run", running)
        .join(F.broadcast(offsets), [*group, "__pid"])
        .withColumn(sum_col, F.col("__off") + F.col("__run"))
        .drop("__pid", "__w", "__run", "__off")
    )
