"""As-of join (SURVEY.md §2.B Q8) — Spark lacks a native one.

Implementation: the **union + last-ignoring-nulls window** technique.
Tag both inputs, union them, sort within each key by event time (right
rows winning ties so "prior-or-same-time" matches), and carry the most
recent right-side payload forward with ``last(..., ignorenulls=True)``
over an unbounded-preceding frame. Keep only left rows.

Why this shape at 100 TB: it costs exactly one shuffle (partition by the
join key) and one sort within partitions — the same cost profile as a
sort-merge join — with no range cross-product and no per-group pandas.
Skewed keys behave like any other window (AQE/salting applies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of left join: for each left row, the nearest right row with
    equal key(s) and ``right_ts <= left_ts`` (``backward``, default),
    ``right_ts >= left_ts`` (``forward``), or the smaller ``|Δt|`` of the
    two (``nearest``; ties break backward — pandas ``merge_asof`` parity).

    Column names (other than ``on``) must be disjoint between the inputs.
    Right-side payload columns (everything except the keys) are appended
    to the left schema; unmatched left rows get nulls.

    The entire right row travels as ONE struct filled with
    ``last(ignorenulls)``, so a matched right row carries its own NULL
    payload values (row-level ``merge_asof``/DuckDB ASOF semantics) —
    per-column filling would stitch values from different right rows.

    ``forward`` reuses the backward machinery on a mirrored time axis
    (order DESC, first-following becomes last-preceding); ``nearest``
    evaluates both fills over ONE sort (two frames of the same window
    spec). All directions cost a single shuffle + sort.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"asof_join: overlapping non-key columns {sorted(overlap)}")

    l_tagged = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    for c in payload:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.withColumn(_TS, F.col(right_ts)).withColumn(_SIDE, F.lit(0))
    for c in left.columns:
        if c not in keys:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = keys + [c for c in left.columns if c not in keys] + payload + [_TS, _SIDE]
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    # The whole right row as one nullable struct (null on left-side rows):
    # carrying (ts, payload...) together keeps row-level match semantics
    # and lets `nearest` compare candidate distances.
    right_row = F.when(
        F.col(_SIDE) == 0, F.struct(F.col(_TS).alias("__ts"), *payload)
    )

    if direction == "nearest":
        # One sort; backward = last right-row struct in the preceding
        # frame, forward = first in the following frame. Right rows sort
        # before left rows at equal timestamps, so a simultaneous right row
        # lands in the backward frame with Δt = 0 (and wins every tie).
        # Frame discipline: both probes are GROWING frames (incremental
        # O(n) in Spark's window exec). A (0, unboundedFollowing) frame
        # is SHRINKING — re-evaluated from the buffer per row, O(n²)
        # per key — so the forward probe runs under the exact REVERSE
        # ordering instead: {rows ≥ current in asc} ≡ {rows ≤ current
        # in (ts desc, side desc)}, and last(...) over that growing
        # frame is the first following non-null of the asc order.
        w = Window.partitionBy(*keys).orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        w_rev = Window.partitionBy(*keys).orderBy(
            F.col(_TS).desc(), F.col(_SIDE).desc()
        )
        prev = F.last(right_row, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        nxt = F.last(right_row, ignorenulls=True).over(
            w_rev.rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.withColumn("__prev", prev).withColumn("__next", nxt)

        # Sub-second-safe numeric time: timestamps → fractional epoch
        # seconds (double), dates via timestamp; numerics cast directly.
        ts_kind = dict(unioned.dtypes)[_TS]

        def _num(c: Column) -> Column:
            if ts_kind == "date" or ts_kind.startswith("timestamp"):
                # date and TIMESTAMP_NTZ lack a direct double cast; hop
                # through TIMESTAMP (session TZ pinned UTC).
                return c.cast("timestamp").cast("double")
            return c.cast("double")

        back_dt = _num(F.col(_TS)) - _num(F.col("__prev.__ts"))
        fwd_dt = _num(F.col("__next.__ts")) - _num(F.col(_TS))
        chosen = (
            F.when(F.col("__prev").isNull(), F.col("__next"))
            .when(F.col("__next").isNull(), F.col("__prev"))
            .when(back_dt <= fwd_dt, F.col("__prev"))
            .otherwise(F.col("__next"))
        )
        matched = filled.withColumn("__match", chosen).drop("__prev", "__next")
    else:
        # Right rows sort before left rows at the same timestamp (asc on
        # _SIDE), so an exactly-simultaneous right row is visible.
        ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(ts_order, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = unioned.withColumn(
            "__match", F.last(right_row, ignorenulls=True).over(w)
        )

    out = matched.filter(F.col(_SIDE) == 1)
    for c in payload:
        out = out.withColumn(c, F.col(f"__match.{c}"))
    return out.drop("__match", _TS, _SIDE)
