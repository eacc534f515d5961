"""Vector/embedding expression builders (X3–X5, SURVEY.md §2.C).

All numerics use the exact-decimal accumulation trick: float32 elements
promote to double exactly, per-element products are deterministic doubles,
and the DECIMAL(38,10) sum is order-independent — so cosine similarity is
bit-identical under any partitioning AND matches a sequential oracle.
Everything stays in higher-order functions (JVM-side, no UDFs).
"""

from __future__ import annotations

from mini_etl_project_spark.functions.memo import jvm_memo

from pyspark.sql import Column
from pyspark.sql import functions as F

# Expression-construction memoization (r12, guide §7.3 — driver time):
# each higher-order-function Column here costs dozens of py4j round
# trips (~8 ms apiece measured) to CONSTRUCT, and the hot callers
# (LSH bucketing, ingest probes, top-k scoring) rebuild the identical
# tree every query invocation. Catalyst Columns are immutable
# expression trees — reusing one across plans/queries is sound — so
# the string-named forms are built once per (name[, name]) and cached
# for the life of the JVM. Data never enters the cache; only
# unresolved expression shapes.

# Precision 28, not 38: Spark types decimal(38,10)+decimal(38,10) as
# decimal(38,9) (allowPrecisionLoss), silently rounding every partial sum.
# At (28,10) the addition widens to (29,10) — exact — and the re-cast back
# to (28,10) is lossless for our magnitudes. DuckDB oracles may keep
# DECIMAL(38,10): per-term values round identically at scale 10.
_DEC = "decimal(28,10)"


def _dec_sum(arr: Column) -> Column:
    """Exact sum of a double-array via decimal accumulation, as double."""
    return F.aggregate(
        arr,
        F.lit(0).cast(_DEC),
        lambda acc, x: (acc + x.cast(_DEC)).cast(_DEC),
    ).cast("double")


def dot_exact(a: Column | str, b: Column | str) -> Column:
    """Order-independent exact dot product of two float arrays."""
    if isinstance(a, str) and isinstance(b, str):
        return _dot_exact_named(a, b)
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _dec_sum(prods)


@jvm_memo
def _dot_exact_named(a: str, b: str) -> Column:
    prods = F.zip_with(
        F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return _dec_sum(prods)


def sqnorm_exact(a: Column | str) -> Column:
    """Exact squared L2 norm of a float array."""
    if isinstance(a, str):
        return _sqnorm_exact_named(a)
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return _dec_sum(sq)


@jvm_memo
def _sqnorm_exact_named(a: str) -> Column:
    sq = F.transform(
        F.col(a), lambda x: x.cast("double") * x.cast("double")
    )
    return _dec_sum(sq)


def dot_sign_nonneg(a: Column | str, b: Column | str) -> Column:
    """``dot_exact(a, b) >= 0``, computed fast: a plain double fold
    decides the sign except within ±1e-6 of zero, where the exact
    decimal fold is consulted (lazy CASE branch — evaluated only for
    ambiguous rows).

    Bit-identical to the decimal sign by construction: the decimal path
    rounds each product to 1e-10 (≤ 5e-11 error ×64 terms = 3.2e-9) and
    the sequential double fold adds ~1e-13, so double and decimal sums
    can only disagree on sign inside ±~4e-9 ≪ 1e-6. LSH bucketing is
    sign-only, which makes this the hot-path form — the full decimal
    fold is ~10× costlier per term (boxed BigDecimal vs double).
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dd = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(F.abs(dd) > 1e-6, dd >= 0).otherwise(dot_exact(a, b) >= 0)


def cosine_exact(a: Column | str, b: Column | str) -> Column:
    """Exact-deterministic cosine similarity (null on zero vectors)."""
    d = dot_exact(a, b)
    na, nb = F.sqrt(sqnorm_exact(a)), F.sqrt(sqnorm_exact(b))
    denom = na * nb
    return F.when(denom != 0, d / denom)
