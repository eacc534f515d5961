"""Z-order (Morton) multi-column clustering for data-skipping layouts.

A linear sort on column A gives great file pruning on A and none on B.
Interleaving the bits of per-column buckets produces a space-filling
curve: range-partitioning by the interleaved key keeps every file's
min/max range NARROW IN EVERY clustered dimension at once, so manifest
min/max skipping (sources/snapshots.py) prunes files for predicates on
ANY of the clustered columns — Delta's ``OPTIMIZE ZORDER BY`` contract.

Everything is a plain Column expression (``width_bucket`` + bit shifts,
JVM-side, codegen'd); the only job is one tiny min/max aggregate to fix
the bucket scale. At 100 TB the write is one range-shuffle — the same
cost as any global sort — paid once to make every later scan cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, Column]:
    """Return ``(df, key)`` where ``key`` is the Morton code of ``cols``.

    Each column is linearly bucketed to ``2^bits`` cells between its
    min/max (one 1-row aggregate, shipped as literals), then the bucket
    bits are interleaved: bit ``j`` of column ``i`` lands at position
    ``j*len(cols) + i``. NULL in any column sorts to cell 0.
    """
    m = len(cols)
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    n_cells = (1 << bits) - 1
    buckets: list[Column] = []
    for i, c in enumerate(cols):
        lo, hi = row[f"lo_{i}"], row[f"hi_{i}"]
        if lo is None or hi is None or hi <= lo:
            buckets.append(F.lit(0))
            continue
        b = (
            F.width_bucket(
                F.col(c).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n_cells)
            )
            - 1
        )
        # width_bucket: x == hi lands in bucket n_cells+1; clamp, null→0.
        buckets.append(F.coalesce(F.least(b, F.lit(n_cells - 1)), F.lit(0)))
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, b in enumerate(buckets):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1)).cast("bigint")
            z = z + F.shiftleft(bit, j * m + i)
    return df, z


def cluster_by_zorder(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 8
) -> DataFrame:
    """Range-partition ``df`` along the Z-curve into ``n_files`` output
    partitions — each written file then covers a contiguous curve segment,
    i.e. a small hyper-rectangle of the clustered column space."""
    df, z = zorder_key(df, cols, bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
