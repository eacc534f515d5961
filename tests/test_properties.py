"""Property/metamorphic tests (SURVEY.md §5.2 item 4) on the cleaners:
idempotence, null-sentinel totality, dedup count laws. Hypothesis drives
value generation; each property batch evaluates through a single Spark job.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mini_etl_project_spark.functions.cleaning import (
    TEXT_SENTINELS,
    clean_numeric,
    clean_text,
)
from mini_etl_project_spark.functions.dates import parse_date_multi

# messy-string alphabet biased toward cleaner-relevant shapes
messy = st.one_of(
    st.text(alphabet="0123456789.,+-$ eE", max_size=18),
    st.sampled_from(list(TEXT_SENTINELS)),
    st.text(max_size=12),
    st.dates(datetime.date(1, 1, 1), datetime.date(9999, 12, 31)).map(
        lambda d: d.isoformat()
    ),
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _col(spark, values, builder):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(builder(F.col("v")).alias("o")).collect()]


@given(st.lists(messy, min_size=1, max_size=25))
@_SETTINGS
def test_text_clean_idempotent(spark, vals):
    once = _col(spark, vals, lambda c: clean_text(c, True))
    twice = _col(
        spark, [v if v is not None else None for v in once], lambda c: clean_text(c, True)
    )
    assert once == twice


@given(st.lists(messy, min_size=1, max_size=25))
@_SETTINGS
def test_numeric_clean_total_and_idempotent(spark, vals):
    # totality: never raises, output is double-or-null
    out = _col(spark, vals, lambda c: clean_numeric(c, compat=True))
    assert all(v is None or isinstance(v, float) for v in out)
    # idempotence on the stringified result (re-cleaning a clean number)
    again = _col(
        spark,
        [None if v is None else repr(v) for v in out],
        lambda c: clean_numeric(c, compat=False),
    )
    for a, b in zip(out, again):
        assert (a is None and b is None) or a == b


@given(st.lists(messy, min_size=1, max_size=25))
@_SETTINGS
def test_date_parse_total(spark, vals):
    out = _col(spark, vals, parse_date_multi)
    assert all(v is None or isinstance(v, datetime.date) for v in out)


def test_sentinels_always_null(spark):
    out = _col(spark, list(TEXT_SENTINELS), lambda c: clean_text(c, False))
    assert out == [None] * len(TEXT_SENTINELS)


def test_dedup_count_law(spark, sf_dir):
    from mini_etl_project_spark.session import load_table

    l = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    assert l.dropDuplicates().count() == l.distinct().count()
