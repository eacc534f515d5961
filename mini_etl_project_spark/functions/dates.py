"""Multi-format date parsing (reference R8, ETL_PROJECT.py:43-61).

The reference tries 16 strptime formats in declared order — order IS
precedence (day-first formats precede month-first, so ``03/04/2023`` parses
as April 3rd). We compile the same chain into one ``coalesce(try_to_date,
…)`` Column expression: JVM-side, codegen-friendly, no per-row Python.

``try_to_date`` (not ``to_date``) keeps null-on-mismatch semantics under
Spark 4's default ANSI mode. Datetime-bearing formats truncate to date,
matching the reference's ``.date()`` call (ETL_PROJECT.py:58).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: strptime → Spark datetime pattern, in the reference's precedence order
#: (ETL_PROJECT.py:48-54).
DATE_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "dd-MM-yyyy",
    "dd/MM/yyyy",
    "MM-dd-yyyy",
    "MM/dd/yyyy",
    "yyyy.MM.dd",
    "dd.MM.yyyy",
    "MM.dd.yyyy",
    "yyyyMMdd",
    "ddMMyyyy",
    "MMddyyyy",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "dd-MM-yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm:ss",
)


def parse_date_multi(col: Column | str) -> Column:
    """Best-effort date parse over the 16-format chain; null if none match.

    The input is trimmed first (the reference strips before strptime).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    return F.coalesce(*[F.try_to_date(s, fmt) for fmt in DATE_FORMATS])
