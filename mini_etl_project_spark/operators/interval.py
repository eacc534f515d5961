"""Interval-overlap join (SURVEY.md §2.B Q7 family) — Spark lacks a
native one; a raw theta join (``l.start <= r.end AND r.start <= l.end``)
plans as BroadcastNestedLoopJoin, O(n·m) at scale.

Implementation: **range bucketing**. Each interval explodes into the
coarse time buckets it covers; the join runs as an equi-join on
(bucket [, keys]) and the exact overlap predicate filters within buckets.
A pair overlapping several buckets would match in each — instead of a
``distinct`` (an extra full shuffle of the output), each pair is emitted
ONLY in the bucket containing ``greatest(l.start, r.start)``, the first
bucket where both intervals are live: dedup-free by construction.

Scale: bucket width trades explode factor (long intervals → many copies)
against bucket occupancy (wide buckets → more in-bucket pairs). At 100 TB
pick width ≈ median interval length; skewed hot buckets split via AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_num(c: Column, kind: str) -> Column:
    """Intervals on dates/timestamps bucket on a numeric axis: days for
    dates, fractional epoch seconds for timestamps."""
    if kind == "date":
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("double")
    if kind.startswith("timestamp"):
        # TIMESTAMP_NTZ has no direct double cast; hop through TIMESTAMP
        # (session TZ pinned UTC, so the epoch value is unambiguous).
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: float,
    on: str | list[str] | None = None,
    how_bounds: str = "closed",
) -> DataFrame:
    """Join rows whose intervals overlap: ``l.start <= r.end AND
    r.start <= l.end`` (``closed``; ``open`` uses strict ``<``), plus
    optional equality keys ``on``.

    Output: all left columns + all right columns (names other than ``on``
    must be disjoint). One equi-shuffle on (bucket, keys); no
    cross-product, no output dedup (see module docstring).
    """
    if how_bounds not in ("closed", "open"):
        raise ValueError(f"interval_join: unknown bounds {how_bounds!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    overlap_cols = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap_cols:
        raise ValueError(
            f"interval_join: overlapping non-key columns {sorted(overlap_cols)}"
        )

    l_kind = dict(left.dtypes)[l_start]
    r_kind = dict(right.dtypes)[r_start]
    w = float(bucket_width)

    def bucketed(df: DataFrame, start: str, end: str, kind: str) -> DataFrame:
        s = _to_num(F.col(start), kind)
        e = _to_num(F.col(end), kind)
        b0 = F.floor(s / w).cast("long")
        b1 = F.floor(e / w).cast("long")
        return df.withColumn("__ivs", s).withColumn("__ive", e).withColumn(
            "__bucket", F.explode(F.sequence(b0, b1))
        )

    lb = bucketed(left, l_start, l_end, l_kind)
    rb = bucketed(right, r_start, r_end, r_kind).withColumnsRenamed(
        {"__ivs": "__rvs", "__ive": "__rve", "__bucket": "__rbucket"}
    )

    cond = lb["__bucket"] == rb["__rbucket"]
    for k in keys:
        cond = cond & (lb[k] == rb[k])
    lt = F.col("__ivs") <= F.col("__rve") if how_bounds == "closed" else F.col("__ivs") < F.col("__rve")
    gt = F.col("__rvs") <= F.col("__ive") if how_bounds == "closed" else F.col("__rvs") < F.col("__ive")
    # Emit each pair only in the first bucket both intervals are live in.
    first_common = F.floor(F.greatest(F.col("__ivs"), F.col("__rvs")) / w).cast("long")
    joined = (
        lb.join(rb, cond)
        .filter(lt & gt)
        .filter(F.col("__bucket") == first_common)
    )
    out_keys = [lb[k] for k in keys]
    l_rest = [lb[c] for c in left.columns if c not in keys]
    r_rest = [rb[c] for c in right.columns if c not in keys]
    return joined.select(*out_keys, *l_rest, *r_rest)
