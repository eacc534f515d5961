"""Shared expression builders for the query surface.

Exact-decimal aggregation: summing ``double`` in floating point is
accumulation-order dependent, so a distributed sum is not reproducible
across partitionings (nor comparable bit-for-bit against a single-threaded
oracle). Casting to ``DECIMAL(38, 6)`` first makes the sum exact — every
permutation of inputs yields the same result — then one final cast back to
``double``. This is both the oracle-parity trick and the right call at
100 TB: the plan stays fully JVM-side and whole-stage-codegen'd, with
map-side partial aggregation intact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB oracle equivalent of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB oracle equivalent of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


#: 2^30 — split point for dec_to_double: both halves stay < 2^53, where
#: decimal→double conversion is EXACT in both engines (DuckDB's
#: int128→double double-rounds above 2^53; Spark's BigDecimal.doubleValue
#: is correctly rounded — the difference shows up as 1-ulp drift on huge
#: moment sums, found by the round-7 cross-SF gate on q_ml_anova_oneway).
_SPLIT = 1 << 30


def dec_to_double(col: Column | str) -> Column:
    """Engine-portable decimal→double for values that may exceed 2^53.

    hi = (x − x%2^30)/2^30 is an exact integer-valued decimal division
    and lo = x%2^30 is exact; both cast to double exactly (< 2^53). The
    reassembly multiply+add are single correctly-rounded IEEE ops, so
    both engines produce the SAME double (within-engine determinism is
    not enough for hash parity — the rounding path must match too).
    Mirror with sql_dec_to_double."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    # (x - x%S)/S is an EXACT integer-valued decimal division (no
    # floor/rounding ambiguity between engines); non-negative inputs only
    return (
        ((c - c % _SPLIT) / _SPLIT).cast("double") * float(_SPLIT)
        + (c % _SPLIT).cast("double")
    )


def sql_dec_to_double(expr: str) -> str:
    """DuckDB twin of dec_to_double (// on DECIMAL is true division, so
    floor() it to mirror Spark's truncating decimal DIV on non-negatives;
    both uses here are non-negative magnitude sums)."""
    return (
        f"(CAST((({expr}) - ({expr}) % {_SPLIT}) / {_SPLIT} AS DOUBLE)"
        f" * {_SPLIT}.0 + CAST(({expr}) % {_SPLIT} AS DOUBLE))"
    )
