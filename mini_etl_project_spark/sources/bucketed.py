"""Bucketed-table layout: pre-shuffled, co-located joins (X387).

The other half of the layout story next to z-ordering (operators/
zorder.py) and snapshot file-skipping (sources/snapshots.py): write the
two sides of a hot equi-join ``bucketBy(N, key)`` + ``sortBy(key)`` so
the shuffle happens ONCE at write time, and every subsequent join of the
two tables is exchange-free — at 100 TB this converts the recurring
cost of the largest shuffle in the workload into a one-time layout
decision. Spark's Hive-compatible bucketing feeds sort-merge join
directly from the bucketed scans when both sides share the bucket count
and key.

Verification is structural (tests/test_round7.py): the joined plan
contains no ShuffleExchange on either scan leg, and the join result is
value-identical to the unbucketed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Materialize ``df`` as a managed bucketed+sorted table."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Sort-merge join of two same-bucketed tables on their bucket key.

    The MERGE hint pins SMJ (broadcast would hide the property under
    test at toy scale); with matching bucket specs Spark plans it with
    zero Exchange operators.
    """
    l = spark.table(left).hint("MERGE")
    r = spark.table(right)
    return l.join(r, key)
