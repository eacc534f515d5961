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

from mini_etl_project_spark.functions.memo import jvm_memo

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double column, as double.

    PORTABILITY CONSTRAINT (round-9 finding): safe ONLY for terms whose
    exact value has <= 6 decimal digits (money/quantity lanes — then the
    DECIMAL(38,6) cast does no rounding at all, in either engine). For
    full-precision terms (sqrt, ln, odd divisions) the cast ITSELF can
    diverge between engines — use :func:`qsum` instead."""
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


# -- portable natural log (pln) ---------------------------------------------
# Runtime ln() is libm-dependent (java.lang.Math.log vs DuckDB's C libm
# differ in the last ulp on some inputs), which is why the text stack
# (TF-IDF, PMI, Zipf) historically ranks by log-free monotone transforms.
# pln removes that restriction: ln built ONLY from IEEE-exact-or-
# correctly-rounded single ops (+, -, *, /), so identical expression
# trees produce bit-identical doubles in any IEEE-754 engine.
#
#   1. Argument reduction by an EXACT power of two: pick k with
#      r = x * 2^-k  in [0.75, 1.5).  Scaling a double by 2^±k is exact
#      (exponent arithmetic, no rounding) and the branch boundaries
#      0.75*2^k / 1.5*2^k are themselves exact doubles, so every engine
#      picks the same branch.
#   2. atanh series on the reduced argument: t = (r-1)/(r+1) lands in
#      [-1/7, 1/5); ln r = 2*t*(1 + t^2/3 + ... ), 13 Horner terms over
#      literal double coefficients.  Truncation error <= |t|^27/27
#      ~ 5e-21 — below the ulp of the result.
#   3. Reassembly: ln x = ln r + k*ln2, with ln2 a shared literal.
#
# Domain: [0.75*2^-60, 1.5*2^6); outside -> NULL in BOTH engines so a
# domain escape shows up as a red row, never as silent drift.
#
# The SQL side is STAGED (reduction columns in one CTE, series over
# column refs in the next) because inlining the 67-branch CASE into the
# Horner chain would blow the oracle string to ~450 KB; the Spark side
# mirrors the same staging via withColumn so both expression trees match
# op-for-op. Accuracy + Spark<->DuckDB bit-identity pinned in
# tests/test_round9.py.

_PLN_TERMS = 13
_PLN_COEFFS = [1.0 / (2 * k + 1) for k in range(_PLN_TERMS)]
_PLN_LN2 = 0.6931471805599453  # repr(math.log(2.0)) — shared literal
_PLN_KLO, _PLN_KHI = -60, 7


# Construction cost note (r13): each staged-ln builder is a 67-branch
# CASE chain / 13-term Horner fold — hundreds of py4j round trips
# (~8 ms apiece) to CONSTRUCT, measured at ~4 s of pure driver time per
# boxcox-shaped query invocation. Every Spark call site passes literal
# column names, so the string-named forms are memoized per JVM (the
# same r12 rule as functions/vectors.py: immutable expression shapes
# only, never data).


def pln_red(col: Column | str) -> Column:
    """Stage 1 (Spark): exactly power-of-two-reduced argument in
    [0.75, 1.5), NULL outside the domain."""
    if isinstance(col, str):
        return _pln_red_named(col)
    red = None
    for k in range(_PLN_KLO, _PLN_KHI):
        lo, hi, scale = 0.75 * 2.0**k, 1.5 * 2.0**k, 2.0 ** (-k)
        cond = (col >= F.lit(lo)) & (col < F.lit(hi))
        red = (
            F.when(cond, col * F.lit(scale))
            if red is None
            else red.when(cond, col * F.lit(scale))
        )
    return red


@jvm_memo
def _pln_red_named(name: str) -> Column:
    return pln_red(F.col(name))


def pln_k(col: Column | str) -> Column:
    """Stage 1 (Spark): the reduction exponent k as double."""
    if isinstance(col, str):
        return _pln_k_named(col)
    kk = None
    for k in range(_PLN_KLO, _PLN_KHI):
        lo, hi = 0.75 * 2.0**k, 1.5 * 2.0**k
        cond = (col >= F.lit(lo)) & (col < F.lit(hi))
        kk = (
            F.when(cond, F.lit(float(k)))
            if kk is None
            else kk.when(cond, F.lit(float(k)))
        )
    return kk


@jvm_memo
def _pln_k_named(name: str) -> Column:
    return pln_k(F.col(name))


def pln_finish(red: Column | str, kk: Column | str) -> Column:
    """Stage 2 (Spark): atanh series on the reduced argument + k*ln2."""
    if isinstance(red, str) and isinstance(kk, str):
        return _pln_finish_named(red, kk)
    red = F.col(red) if isinstance(red, str) else red
    kk = F.col(kk) if isinstance(kk, str) else kk
    t = (red - F.lit(1.0)) / (red + F.lit(1.0))
    t2 = t * t
    s = F.lit(_PLN_COEFFS[-1])
    for c in reversed(_PLN_COEFFS[:-1]):
        s = s * t2 + F.lit(c)
    return F.lit(2.0) * t * s + kk * F.lit(_PLN_LN2)


@jvm_memo
def _pln_finish_named(red: str, kk: str) -> Column:
    return pln_finish(F.col(red), F.col(kk))


def sql_pln_red(expr: str) -> str:
    """Stage 1 (DuckDB): reduced argument — mirror of pln_red.

    Every literal is CAST AS DOUBLE: DuckDB parses plain decimal
    literals as DECIMAL and would otherwise run decimal arithmetic."""
    x = f"({expr})"
    b = []
    for k in range(_PLN_KLO, _PLN_KHI):
        lo, hi, scale = 0.75 * 2.0**k, 1.5 * 2.0**k, 2.0 ** (-k)
        b.append(
            f"WHEN {x} >= CAST('{lo!r}' AS DOUBLE)"
            f" AND {x} < CAST('{hi!r}' AS DOUBLE)"
            f" THEN {x} * CAST('{scale!r}' AS DOUBLE)"
        )
    return "CASE " + " ".join(b) + " ELSE NULL END"


def sql_pln_k(expr: str) -> str:
    """Stage 1 (DuckDB): reduction exponent — mirror of pln_k."""
    x = f"({expr})"
    b = []
    for k in range(_PLN_KLO, _PLN_KHI):
        lo, hi = 0.75 * 2.0**k, 1.5 * 2.0**k
        b.append(
            f"WHEN {x} >= CAST('{lo!r}' AS DOUBLE)"
            f" AND {x} < CAST('{hi!r}' AS DOUBLE)"
            f" THEN CAST('{float(k)!r}' AS DOUBLE)"
        )
    return "CASE " + " ".join(b) + " ELSE NULL END"


def sql_pln_finish(red: str, kk: str) -> str:
    """Stage 2 (DuckDB): series + reassembly over COLUMN REFS (pass
    plain column names so the string stays compact)."""
    t = (
        f"((({red}) - CAST(1.0 AS DOUBLE))"
        f" / (({red}) + CAST(1.0 AS DOUBLE)))"
    )
    t2 = f"({t} * {t})"
    s = f"CAST('{_PLN_COEFFS[-1]!r}' AS DOUBLE)"
    for c in reversed(_PLN_COEFFS[:-1]):
        s = f"(({s}) * {t2} + CAST('{c!r}' AS DOUBLE))"
    return (
        f"(CAST(2.0 AS DOUBLE) * {t} * ({s})"
        f" + ({kk}) * CAST('{_PLN_LN2!r}' AS DOUBLE))"
    )


def fold_sum(xs: Column) -> Column:
    """Left-fold sum of a bounded NONEMPTY double array — the
    bit-identical Spark twin of DuckDB's
    ``list_reduce(xs, (a, x) -> a + x)``: seed with the first element,
    fold the rest in order. Summation order is part of the contract
    (double addition is non-associative), which is why callers sort the
    array deterministically first (the X458 EWMA lane)."""
    return F.aggregate(
        F.slice(xs, 2, 1000000),
        F.element_at(xs, 1),
        lambda a, x: a + x,
    )


# -- qsum: the portable sum lane for FULL-PRECISION doubles -------------------
#
# dsum's DECIMAL(38,6) cast is only cross-engine-safe when the term's
# exact value has <= 6 decimal digits (money/quantity lanes — then the
# cast does no rounding at all). For irrational terms (sqrt, ln, odd
# divisions) the engines disagree on the cast itself: Spark rounds the
# double's EXACT binary expansion (BigDecimal HALF_UP) while DuckDB
# multiplies by 10^scale IN DOUBLE first and rounds that — a
# double-rounding whose divergence probability grows with |x|*10^6*eps
# (found live: three of 31 KL-drift terms at |x|~1e9 crossed a boundary;
# see test_round9b). qsum quantizes portably instead: floor(x * scale)
# is an INTEGER-VALUED double (floor is exact in both engines, and the
# single multiply rounds identically), so the decimal cast is
# unambiguous at any magnitude. The sum is then exact, order-independent
# and distributed (map-side partials intact); dec_to_double brings it
# back above 2^53 safely. Quantization: 1/scale absolute per term,
# floor-biased — identical in both engines, which is the whole point.

QSCALE = 1e12


#: qsum term-domain bound: |term| < 1e6 keeps |term*QSCALE| < 1e18 <
#: 2^62, inside Spark's BIGINT floor() range (floor(DOUBLE) returns
#: BIGINT in Spark and silently wraps past 2^63). Out-of-domain terms
#: poison the whole sum to NULL in BOTH engines — a domain escape is a
#: visible red row, never silent drift (the pln convention).
QLIM = 1e6


def qsum(col: Column | str, alias: str) -> Column:
    """Order-independent, engine-portable sum of full-precision doubles
    (quantized at 1e-12 per term; term domain |x| < 1e6), as double.
    The signed total routes through ABS + sign because dec_to_double
    (and decimal %) is non-negative-only — the q_fn_regr_family trick."""
    c = F.col(col) if isinstance(col, str) else col
    s = (
        F.sum(F.floor(c * F.lit(QSCALE)).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
    )
    sgn = F.when(s < 0, -1.0).otherwise(1.0)
    bad = F.max(F.when(F.abs(c) >= F.lit(QLIM), 1).otherwise(0))
    return (
        F.when(bad > 0, F.lit(None).cast("double")).otherwise(
            sgn * dec_to_double(F.abs(s)) / F.lit(QSCALE)
        )
    ).alias(alias)


def sql_qsum_expr(expr: str) -> str:
    """DuckDB qsum as a bare aggregate expression (no alias)."""
    s = (
        f"CAST(SUM(CAST(FLOOR(({expr}) * 1e12) AS DECIMAL(38,0)))"
        f" AS DECIMAL(38,0))"
    )
    signed = (
        f"((CASE WHEN {s} < 0 THEN -1.0 ELSE 1.0 END)"
        f" * ({sql_dec_to_double(f'ABS({s})')}) / 1e12)"
    )
    return (
        f"(CASE WHEN MAX(CASE WHEN ABS({expr}) >= 1e6 THEN 1 ELSE 0 END) > 0"
        f" THEN NULL ELSE {signed} END)"
    )


def sql_qsum(expr: str, alias: str) -> str:
    """DuckDB oracle equivalent of :func:`qsum`."""
    return f"{sql_qsum_expr(expr)} AS {alias}"


def sql_ln_layer(stack_cte: str, keys: str) -> str:
    """The two-layer staged-ln CTE body over a stack(keys..., v) CTE —
    the unpivot-ln pattern every pln consumer shares: red/kk staged as
    real columns first (pln_finish references red ~50x), series over
    column refs second, so the oracle string stays compact and the
    Spark twin (withColumn red/kk, then pln_finish) matches op-for-op."""
    return (
        f"SELECT {keys}, v, {sql_pln_finish('red', 'kk')} AS lnv"
        f" FROM (SELECT {keys}, v, {sql_pln_red('v')} AS red,"
        f" {sql_pln_k('v')} AS kk FROM {stack_cte})"
    )
