"""Round-2 operator tests: nearest as-of join (incl. the row-level NULL
payload semantics), interval-overlap join, and the AutoETL per-SF row-count
tripwires (VERDICT r1 items 7 and 8)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.operators.asof import asof_join
from mini_etl_project_spark.operators.interval import interval_join


def _ts(h: int, m: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(12)), (1, _ts(23)), (2, _ts(5))],
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(9), 90.0), (1, _ts(13), None), (1, _ts(22), 220.0)],
        "k int, rts timestamp, val double",
    )
    return left, right


def test_asof_nearest_picks_smaller_delta(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", direction="nearest"
    )
    got = {(r["k"], r["lts"].hour): r["rts"] for r in out.collect()}
    assert got[(1, 10)] == _ts(9)      # |1h| back vs |3h| fwd
    assert got[(1, 12)] == _ts(13)     # |1h| fwd beats |3h| back
    assert got[(1, 23)] == _ts(22)     # only backward exists
    assert got[(2, 5)] is None         # no right rows for key 2


def test_asof_match_carries_right_rows_own_nulls(spark, asof_frames):
    """A matched right row whose payload is NULL must surface that NULL —
    not inherit the column from an older right row (ADVICE r1, medium)."""
    left, right = asof_frames
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", direction="backward"
    )
    by_hour = {r["lts"].hour: r for r in out.collect()}
    # 23:00 matches the 22:00 row (220.0); 12:00 matches 9:00 (90.0);
    # a left row at 14:00 would match 13:00 whose val is NULL:
    out2 = asof_join(
        spark.createDataFrame([(1, _ts(14))], "k int, lts timestamp"),
        right,
        on="k",
        left_ts="lts",
        right_ts="rts",
        direction="backward",
    ).collect()
    assert out2[0]["rts"] == _ts(13)
    assert out2[0]["val"] is None      # NOT 90.0 from the older 9:00 row
    assert by_hour[23]["val"] == 220.0
    assert by_hour[10]["val"] == 90.0


def test_asof_nearest_tie_breaks_backward(spark):
    left = spark.createDataFrame([(1, _ts(12))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(11), "back"), (1, _ts(13), "fwd")], "k int, rts timestamp, tag string"
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", direction="nearest"
    ).collect()
    assert out[0]["tag"] == "back"


def test_interval_join_overlaps_and_dedups(spark):
    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 50.0, 60.0), (3, 90.0, 95.0)],
        "a_key int, a_s double, a_e double",
    )
    b = spark.createDataFrame(
        [(10, 5.0, 7.0),    # inside a1
         (11, 9.0, 52.0),   # spans a1..a2 across many buckets
         (12, 200.0, 210.0)],  # overlaps nothing
        "b_key int, b_s double, b_e double",
    )
    out = interval_join(a, b, "a_s", "a_e", "b_s", "b_e", bucket_width=8.0)
    pairs = sorted((r["a_key"], r["b_key"]) for r in out.collect())
    # each overlapping pair exactly once, despite multi-bucket spans
    assert pairs == [(1, 10), (1, 11), (2, 11)]


def test_interval_join_open_bounds(spark):
    a = spark.createDataFrame([(1, 0.0, 10.0)], "a_key int, a_s double, a_e double")
    b = spark.createDataFrame([(2, 10.0, 20.0)], "b_key int, b_s double, b_e double")
    closed = interval_join(a, b, "a_s", "a_e", "b_s", "b_e", bucket_width=8.0)
    opened = interval_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bucket_width=8.0, how_bounds="open"
    )
    assert closed.count() == 1 and opened.count() == 0


#: Pinned output row counts for the generic (rows-only) AutoETL query —
#: the regression tripwire VERDICT r1 item 8 asked for.
_PIPELINE_GOLDEN_COUNTS = {"0.001": 6000, "0.01": 59999, "0.1": 599995}


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_pipeline_sf_rowcounts(spark, sf):
    from mini_etl_project_spark.queries import QUERIES

    n = QUERIES["q_etl_pipeline"](spark, f"/root/testdata/sf{sf}").count()
    assert n == _PIPELINE_GOLDEN_COUNTS[sf]


def test_pipeline_sf01_rowcount(spark):
    from mini_etl_project_spark.queries import QUERIES

    n = QUERIES["q_etl_pipeline"](spark, "/root/testdata/sf0.1").count()
    assert n == _PIPELINE_GOLDEN_COUNTS["0.1"]
