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

from pyspark.sql import DataFrame, Window
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
    equal key(s) and ``right_ts <= left_ts`` (``backward``, default) or
    ``right_ts >= left_ts`` (``forward``).

    Column names (other than ``on``) must be disjoint between the inputs.
    Right-side payload columns (everything except the keys) are appended
    to the left schema; unmatched left rows get nulls.

    ``forward`` reuses the backward machinery on a mirrored time axis
    (order DESC, first-following becomes last-preceding) — same single
    shuffle + sort cost.
    """
    if direction not in ("backward", "forward"):
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

    # Right rows sort before left rows at the same timestamp (asc on _SIDE),
    # so an exactly-simultaneous right row is visible to the left row.
    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in payload:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col(_SIDE) == 1).drop(_TS, _SIDE)
