"""Skew-handling operators (SURVEY.md §4.3, 100 TB posture).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in the session factory);
these are the explicit techniques for when the skew is in an AGGREGATION
key or a broadcast is impossible:

- :func:`salted_aggregate` — two-phase aggregate: hot keys are spread over
  ``n_salts`` partial groups, then combined. Results are identical to the
  direct aggregate (counts are exact; sums go through exact decimals).
- :func:`salted_join` — replicate the small-but-unbroadcastable side
  ``n_salts``× and spread the skewed fact side by a row-level salt, so one
  hot key fans across ``n_salts`` reducers instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _row_salt(n_salts: int) -> Column:
    # row-position salt: distributes rows of the SAME key (a key-hash salt
    # would defeat the purpose); any assignment yields identical results
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    counts: list[str] | None = None,
    sums: list[str] | None = None,
) -> DataFrame:
    """count/sum aggregation over skewed keys in two shuffles of bounded
    fan-in. Output: one row per key with ``<c>_count`` / ``<c>_sum``.
    """
    counts, sums = counts or [], sums or []
    partial = (
        df.withColumn(_SALT, _row_salt(n_salts))
        .groupBy(*keys, _SALT)
        .agg(
            *[F.count(c).alias(f"{c}_count") for c in counts],
            *[
                F.sum(F.col(c).cast("decimal(38,6)")).alias(f"{c}_sum")
                for c in sums
            ],
        )
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"{c}_count").alias(f"{c}_count") for c in counts],
        *[F.sum(f"{c}_sum").cast("double").alias(f"{c}_sum") for c in sums],
    )


def salted_join(
    facts: DataFrame, dim: DataFrame, on: str, n_salts: int = 8
) -> DataFrame:
    """Inner equi-join where ``facts.on`` is heavily skewed and ``dim`` is
    too large to broadcast outright: dim rows are replicated per salt and
    both sides join on (key, salt)."""
    salted_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_facts = facts.withColumn(_SALT, _row_salt(n_salts))
    return salted_facts.join(salted_dim, [on, _SALT]).drop(_SALT)
