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
