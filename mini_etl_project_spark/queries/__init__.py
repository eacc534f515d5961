"""Query registry — the engine's declared query surface.

Every operator from SURVEY.md §2 lands here as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an equivalent
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports the registry to
the driver's correctness harness.

Determinism contract (the driver hash-compares values):

- Aggregates over ``double`` columns go through :func:`dsum`/:func:`davg`,
  which sum exactly in ``DECIMAL`` space and cast back to ``double`` — both
  Spark and DuckDB then produce bit-identical results regardless of
  accumulation order, so the engine stays correct under any partitioning
  (and therefore at any scale).
- Every computed column is aliased identically in the DataFrame plan and
  the oracle SQL (the harness matches columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver runs a rows-only check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from mini_etl_project_spark.queries import (  # noqa: F401
        core,
        dedup_q,
        etl_q,
        functions_q,
        joins,
        misc_q,
        setops,
        udf_q,
        similarity_q,
        streaming_q,
        text_q,
        tpch_extra,
        windows,
    )


_load_all()
