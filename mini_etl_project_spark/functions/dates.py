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


#: Anchored shape-guards per format. ``try_to_date`` signals mismatch with
#: a caught JVM exception, so an unguarded 16-format chain pays ~16
#: exception throws per non-date value — profiling a 100 TB string column
#: would burn executor CPU on exception bookkeeping. Each guard is a
#: SUPERSET of what its format can parse (never changes results, only
#: skips impossible attempts); regexes compile once per task.
_G_D = r"\d{1,2}"
_G_Y = r"\d{1,4}"
_G_TIME = r" \d{1,2}:\d{1,2}:\d{1,2}"
FORMAT_GUARDS: dict[str, str] = {
    "yyyy-MM-dd": rf"^{_G_Y}-{_G_D}-{_G_D}$",
    "yyyy/MM/dd": rf"^{_G_Y}/{_G_D}/{_G_D}$",
    "dd-MM-yyyy": rf"^{_G_D}-{_G_D}-{_G_Y}$",
    "dd/MM/yyyy": rf"^{_G_D}/{_G_D}/{_G_Y}$",
    "MM-dd-yyyy": rf"^{_G_D}-{_G_D}-{_G_Y}$",
    "MM/dd/yyyy": rf"^{_G_D}/{_G_D}/{_G_Y}$",
    "yyyy.MM.dd": rf"^{_G_Y}\.{_G_D}\.{_G_D}$",
    "dd.MM.yyyy": rf"^{_G_D}\.{_G_D}\.{_G_Y}$",
    "MM.dd.yyyy": rf"^{_G_D}\.{_G_D}\.{_G_Y}$",
    "yyyyMMdd": r"^\d{8}$",
    "ddMMyyyy": r"^\d{8}$",
    "MMddyyyy": r"^\d{8}$",
    "yyyy-MM-dd HH:mm:ss": rf"^{_G_Y}-{_G_D}-{_G_D}{_G_TIME}$",
    "yyyy/MM/dd HH:mm:ss": rf"^{_G_Y}/{_G_D}/{_G_D}{_G_TIME}$",
    "dd-MM-yyyy HH:mm:ss": rf"^{_G_D}-{_G_D}-{_G_Y}{_G_TIME}$",
    "dd/MM/yyyy HH:mm:ss": rf"^{_G_D}/{_G_D}/{_G_Y}{_G_TIME}$",
}


#: Shape families, mutually exclusive by construction (anchored, distinct
#: separators / time suffix). Formats within a family keep their relative
#: precedence order; cross-family order is irrelevant because a value can
#: match at most one family — so the family regrouping below is
#: semantically identical to the flat 16-format chain while evaluating
#: ≤6 family regexes (instead of 16 guards) per non-matching value.
_FAMILIES: tuple[tuple[str, tuple[str, ...]], ...] = (
    (rf"^{_G_Y}-{_G_D}-{_G_Y}$", ("yyyy-MM-dd", "dd-MM-yyyy", "MM-dd-yyyy")),
    (rf"^{_G_Y}/{_G_D}/{_G_Y}$", ("yyyy/MM/dd", "dd/MM/yyyy", "MM/dd/yyyy")),
    (rf"^{_G_Y}\.{_G_D}\.{_G_Y}$", ("yyyy.MM.dd", "dd.MM.yyyy", "MM.dd.yyyy")),
    (r"^\d{8}$", ("yyyyMMdd", "ddMMyyyy", "MMddyyyy")),
    (
        rf"^{_G_Y}-{_G_D}-{_G_Y}{_G_TIME}$",
        ("yyyy-MM-dd HH:mm:ss", "dd-MM-yyyy HH:mm:ss"),
    ),
    (
        rf"^{_G_Y}/{_G_D}/{_G_Y}{_G_TIME}$",
        ("yyyy/MM/dd HH:mm:ss", "dd/MM/yyyy HH:mm:ss"),
    ),
)


def parse_date_multi(col: Column | str) -> Column:
    """Best-effort date parse over the 16-format chain; null if none match.

    The input is trimmed first (the reference strips before strptime).
    Structured as family-dispatch (see ``_FAMILIES``) purely for speed;
    results are identical to the flat precedence chain.
    """
    c = F.col(col) if isinstance(col, str) else col
    # strip ALL whitespace like the reference's str.strip() (F.trim only
    # strips ASCII spaces — tabs/newlines would defeat the shape guards);
    # btrim over the Java-\s char set == the regex strip, minus the regex
    s = F.btrim(c.cast("string"), F.lit(" \t\n\x0b\x0c\r"))
    expr = F.lit(None).cast("date")
    for family_rx, fmts in reversed(_FAMILIES):
        inner = F.coalesce(
            *[
                F.when(s.rlike(FORMAT_GUARDS[fmt]), F.try_to_date(s, fmt))
                for fmt in fmts
            ]
        )
        expr = F.when(s.rlike(family_rx), inner).otherwise(expr)
    # Every family starts with a digit: one 1-char prefilter short-circuits
    # the 6 family regexes for '$1.23', 'N/A', free text, … (identity on
    # results — a non-digit start can never match any family).
    return F.when(s.rlike(r"^\d"), expr)
