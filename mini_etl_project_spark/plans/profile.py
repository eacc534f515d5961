"""Column profiling → logical type inference (reference R7,
ETL_PROJECT.py:16-41).

The reference scans every column ~4 times with per-row Python. Here the
whole profile is ONE wide aggregation job — per column: non-null count,
exact distinct count, mean stringified length, date-parse successes
(16-format chain), numeric-parse successes — and the driver applies the
reference's strict threshold rules to produce a logical type per column.

This two-phase profile→plan flow is the engine's core custom machinery
(SURVEY.md §4.2): data-dependent typed plans, no custom Catalyst rules.

Scale: one job, ~5 aggregates per column, all codegen'd. ``exact_distinct``
can be switched off to use HLL (``approx_count_distinct``) at 100 TB —
detection only needs the distinct count near the 50 / 30 %-ratio
boundaries, where HLL's ~2 % error is acceptable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_etl_project_spark.functions.dates import parse_date_multi

#: Logical types (reference vocabulary).
DATE, NUMERIC, CATEGORICAL, TEXT, UNKNOWN = (
    "date",
    "numeric",
    "categorical",
    "text",
    "unknown",
)


@dataclass(frozen=True)
class ColumnProfile:
    name: str
    non_null: int
    distinct: int
    avg_len: float | None  # mean length of str-cast non-null values
    date_ok: int
    numeric_ok: int

    @property
    def unique_ratio(self) -> float:
        return self.distinct / self.non_null if self.non_null else 0.0

    @property
    def logical_type(self) -> str:
        """The reference's priority rules, thresholds strict
        (ETL_PROJECT.py:19-41; verified: exactly 70 % numeric → unknown).
        """
        if self.non_null == 0:
            return UNKNOWN
        if self.date_ok / self.non_null > 0.7:
            return DATE
        if self.numeric_ok / self.non_null > 0.7:
            return NUMERIC
        if 0 < self.unique_ratio <= 0.3 and self.distinct < 50:
            return CATEGORICAL
        if (self.avg_len or 0.0) > 10 and self.unique_ratio > 0.5:
            return TEXT
        return UNKNOWN


def profile_frame_and_count(
    df: DataFrame, exact_distinct: bool = True
) -> tuple[dict[str, ColumnProfile], int]:
    """Profile every column AND the total row count in one aggregation job."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in df.columns:
        raw = F.col(c)
        s = raw.cast("string")
        distinct = (
            F.count_distinct(raw) if exact_distinct else F.approx_count_distinct(raw)
        )
        aggs += [
            F.count(raw).alias(f"{c}__nn"),
            distinct.alias(f"{c}__dc"),
            F.avg(F.length(s)).alias(f"{c}__len"),
            F.count(parse_date_multi(s)).alias(f"{c}__date"),
            F.count(F.trim(s).try_cast("double")).alias(f"{c}__num"),
        ]
    row = df.agg(*aggs).collect()[0]
    profiles = {
        c: ColumnProfile(
            name=c,
            non_null=row[f"{c}__nn"],
            distinct=row[f"{c}__dc"],
            avg_len=row[f"{c}__len"],
            date_ok=row[f"{c}__date"],
            numeric_ok=row[f"{c}__num"],
        )
        for c in df.columns
    }
    return profiles, row["__rows"]


def profile_frame(df: DataFrame, exact_distinct: bool = True) -> dict[str, ColumnProfile]:
    """Profile every column in one aggregation job."""
    return profile_frame_and_count(df, exact_distinct)[0]
