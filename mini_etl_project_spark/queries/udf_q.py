"""User-defined function surface — SURVEY.md §2.B Q26 (pandas UDF), Q27
(grouped-agg UDAF via applyInPandas), Q28 (Python UDTF).

UDFs are the engine's escape hatch, not its hot path — but the machinery
must work and be provably correct, so each variant computes something an
oracle can replicate: elementwise double arithmetic (deterministic per
element through Arrow), exact integer aggregation (order-independent), and
a deterministic table function.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_project_spark.queries import query
from mini_etl_project_spark.session import load_table

# -- Q26 scalar pandas UDF (Arrow-vectorized) ------------------------------

_PANDAS_UDF_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge_udf
FROM lineitem
WHERE l_orderkey % 17 = 0
"""


@query("q_udf_pandas_scalar", _PANDAS_UDF_ORACLE)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # elementwise IEEE double ops — identical to the SQL expression
        return price * (1.0 - disc) * (1.0 + tax)

    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 17 == 0).select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge_udf"),
    )


# -- Q27 grouped-aggregate UDAF via applyInPandas --------------------------
# Exact integer aggregation (quantities are integral doubles) so the
# result is order-independent — a float sum in pandas would not be.

_UDAF_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_udf_grouped_agg", _UDAF_ORACLE)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [len(pdf)],
                "total_qty": [int(pdf["l_quantity"].astype("int64").sum())],
                "min_price": [pdf["l_extendedprice"].min()],
                "max_price": [pdf["l_extendedprice"].max()],
            }
        )

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").applyInPandas(
        agg,
        "l_returnflag string, n_rows bigint, total_qty bigint, "
        "min_price double, max_price double",
    )


# -- Q28 Python UDTF (lateral table function) ------------------------------

_UDTF_ORACLE = """
SELECT p_partkey, t.word, t.idx
FROM (SELECT p_partkey, string_split(p_type, ' ') AS ws FROM part
      WHERE p_partkey % 29 = 0),
     LATERAL (SELECT ws[i] AS word, i AS idx
              FROM unnest(generate_series(1, len(ws))) u(i)) t
"""


@query("q_udtf_split_words", _UDTF_ORACLE)
def q_udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, idx int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" "), start=1):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("udtf_part")
    return spark.sql(
        """
        SELECT p_partkey, t.word, t.idx
        FROM udtf_part, LATERAL split_words(p_type) t
        WHERE p_partkey % 29 = 0
        """
    )


# -- Q27+ cogrouped applyInPandas ------------------------------------------
# The two-sided grouped-pandas API (cogroup): each orderkey's orders rows
# and lineitem rows arrive as ALIGNED pandas frames — the shape custom
# reconciliation/merge logic needs when one side isn't joinable row-wise
# (here: per-order fill stats against the order's own date). Exact
# integer/count outputs keep it order-independent, so the oracle is plain
# SQL. One shuffle per side on the cogroup key — same cost as the
# equivalent join at any scale.

_COGROUP_ORACLE = """
SELECT o.o_orderkey,
       COUNT(l.l_orderkey) AS n_lines,
       CAST(COALESCE(SUM(CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_shipped_30d
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 61 = 0
GROUP BY o.o_orderkey
"""


@query("q_udf_cogrouped", _COGROUP_ORACLE)
def q_udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime

    def fill_stats(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame):
        if orders_pdf.empty:  # lineitem for an order outside the filter
            return pd.DataFrame(
                columns=["o_orderkey", "n_lines", "n_shipped_30d"]
            )
        cutoff = orders_pdf["o_orderdate"].iloc[0] + datetime.timedelta(
            days=30
        )
        return pd.DataFrame(
            {
                "o_orderkey": [key[0]],
                "n_lines": [len(lines_pdf)],
                "n_shipped_30d": [
                    int((lines_pdf["l_shipdate"] <= cutoff).sum())
                ],
            }
        )

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 61 == 0)
        .select("o_orderkey", "o_orderdate")
    )
    # Mirror the key predicate on the lineitem side: cogroup invokes the
    # Python fn once per key on EITHER side, so an unfiltered right side
    # pays a Python call per excluded order (measured 42s -> 3s at
    # sf0.01). Same trick a runtime filter applies at scale; pushed to
    # the parquet scan here.
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 61 == 0)
        .select("l_orderkey", "l_shipdate")
    )
    return (
        o.groupBy("o_orderkey")
        .cogroup(l.groupBy("l_orderkey"))
        .applyInPandas(
            fill_stats,
            "o_orderkey bigint, n_lines bigint, n_shipped_30d bigint",
        )
    )


# -- Arrow-native batch UDF (mapInArrow) ------------------------------------
#
# The fourth Python-UDF tier after scalar pandas_udf / applyInPandas /
# UDTF: mapInArrow hands the function raw ``pyarrow.RecordBatch``es with
# NO pandas conversion on either side — the cheapest possible
# Python-side hop for columnar math (one Arrow buffer in, one out). The
# computation (integer cents + a min-max style ratio) uses pyarrow
# compute kernels only, so results are bit-identical to the SQL oracle.

_ARROW_ORACLE = """
SELECT event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS cents,
       value / 100.0 AS frac
FROM events
"""


@query("q_udf_arrow", _ARROW_ORACLE)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for batch in it:
            v = batch.column("value")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("event_id"),
                    pc.cast(pc.round(pc.multiply(v, 100.0)), pa.int64()),
                    pc.divide(v, 100.0),
                ],
                names=["event_id", "cents", "frac"],
            )

    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    return e.mapInArrow(
        batches, "event_id bigint, cents bigint, frac double"
    )


# -- Polymorphic UDTF (Spark 4 analyze-time schema) -------------------------
#
# A UDTF whose output schema is computed at ANALYSIS time from its
# literal argument (`analyze` static method) — the dynamic-schema table
# function Spark 4 added. The function unpivots a fixed number of
# trailing value columns chosen by the literal; the oracle is the
# equivalent static UNION ALL.

_UDTF_ANALYZE_ORACLE = """
SELECT o_orderkey, 'cents' AS metric,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS val
FROM orders WHERE o_orderkey % 53 = 0
UNION ALL
SELECT o_orderkey, 'cust', o_custkey FROM orders WHERE o_orderkey % 53 = 0
"""


@query("q_udtf_analyze", _UDTF_ANALYZE_ORACLE)
def q_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class Unpivot2:
        @staticmethod
        def analyze(n: AnalyzeArgument, *cols: AnalyzeArgument) -> AnalyzeResult:
            # schema depends on the literal: id + (metric, val)
            schema = (
                StructType()
                .add("o_orderkey", LongType())
                .add("metric", StringType())
                .add("val", LongType())
            )
            assert n.value == len(cols) - 1  # first col is the key
            return AnalyzeResult(schema=schema)

        def eval(self, n, *args):
            key = args[0]
            names = ["cents", "cust"]
            for i in range(n):
                yield key, names[i], args[1 + i]

    spark.udtf.register("unpivot2", udtf(Unpivot2))
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 53 == 0
    )
    o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_custkey").cast("bigint").alias("cust"),
    ).createOrReplaceTempView("udtf_analyze_src")
    return spark.sql(
        """
        SELECT t.o_orderkey, t.metric, t.val
        FROM udtf_analyze_src,
             LATERAL unpivot2(2, o_orderkey, cents, cust) t
        """
    )


# -- X187 UDTF with TABLE argument (partitioned custom aggregator) ---------
#
# Spark 4's polymorphic-input surface: a Python UDTF consumes
# ``TABLE(v) PARTITION BY event_type`` and emits ONE row per partition
# from ``terminate()`` — a custom aggregate expressed as a table
# function, the escape hatch for aggregation logic SQL can't write
# (here deliberately simple so the oracle CAN check it: count, integer
# cent sum, and min/max event id per type).  Partitioning is handled by
# the engine — the UDTF instance sees exactly one group, so the
# operator distributes like any keyed aggregation.

_UDTF_TABLE_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id
FROM events
WHERE event_type IS NOT NULL AND value IS NOT NULL
GROUP BY event_type
"""


@query("q_udtf_table_arg", _UDTF_TABLE_ORACLE)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "event_type string, n bigint, sum_cents bigint,"
            " min_id bigint, max_id bigint"
        )
    )
    class GroupSummarizer:
        def __init__(self) -> None:
            self._key = None
            self._n = 0
            self._sum = 0
            self._min = None
            self._max = None

        def eval(self, row):
            self._key = row["event_type"]
            self._n += 1
            self._sum += row["cents"]
            eid = row["event_id"]
            self._min = eid if self._min is None else min(self._min, eid)
            self._max = eid if self._max is None else max(self._max, eid)

        def terminate(self):
            if self._key is not None:
                yield self._key, self._n, self._sum, self._min, self._max

    spark.udtf.register("group_summarizer", GroupSummarizer)
    # NULL keys/values excluded on both engines (r12 NULL audit: a None
    # cents crashes the Python accumulator, and terminate()'s
    # key-is-not-None guard silently swallows the NULL partition the
    # oracle's GROUP BY would keep)
    load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).createOrReplaceTempView("udtf_events")
    return spark.sql(
        """
        SELECT * FROM group_summarizer(
          TABLE(udtf_events) PARTITION BY event_type)
        """
    )


# -- X229 event debounce (chained stateful logic, applyInPandas) -----------
#
# Debounce with a 5-minute refractory period: an event is ACCEPTED iff it
# is its user's first event or ≥5 min have passed since that user's last
# ACCEPTED event. The acceptance chain depends on prior decisions, so no
# window/aggregate expresses it — this is the canonical per-key
# sequential operator, run as applyInPandas (each user's few events in
# one Arrow batch; keyed parallelism across users is what scales it).
# The oracle replays the chain with a recursive CTE stepping through
# each user's row_number sequence. Output: per-user event/accepted
# counts plus first-accepted/last-accepted timestamps.

_DEBOUNCE_GAP_US = 300_000_000  # 5 minutes

_DEBOUNCE_ORACLE = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL),
chain AS (
  SELECT user_id, rn, ts AS last_acc, ts, 1 AS is_acc
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn,
         CASE WHEN epoch_us(s.ts) - epoch_us(c.last_acc)
                   >= {_DEBOUNCE_GAP_US}
              THEN s.ts ELSE c.last_acc END,
         s.ts,
         CASE WHEN epoch_us(s.ts) - epoch_us(c.last_acc)
                   >= {_DEBOUNCE_GAP_US}
              THEN 1 ELSE 0 END
  FROM chain c JOIN seq s
    ON s.user_id = c.user_id AND s.rn = c.rn + 1)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(is_acc) AS BIGINT) AS n_accepted,
       MIN(CASE WHEN is_acc = 1 THEN ts END) AS first_accepted,
       MAX(CASE WHEN is_acc = 1 THEN ts END) AS last_accepted
FROM chain GROUP BY user_id
"""


@query("q_udf_debounce", _DEBOUNCE_ORACLE)
def q_udf_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    def debounce(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = pdf["ts"].astype("int64").to_numpy()  # ns since epoch
        gap_ns = _DEBOUNCE_GAP_US * 1000
        accepted = []
        last = None
        for t in ts_us:
            if last is None or t - last >= gap_ns:
                accepted.append(True)
                last = t
            else:
                accepted.append(False)
        acc_ts = pdf["ts"][accepted]
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "n_accepted": [int(sum(accepted))],
                "first_accepted": [acc_ts.iloc[0]],
                "last_accepted": [acc_ts.iloc[-1]],
            }
        )

    # ts is load-bearing (the refractory chain IS the timestamp): a
    # NULL ts is NaT in the Arrow batch and int64-casts to garbage —
    # excluded on both engines (r12 ts-NULL audit)
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        "user_id", "ts", "event_id"
    )
    return e.groupBy("user_id").applyInPandas(
        debounce,
        "user_id bigint, n_events bigint, n_accepted bigint, "
        "first_accepted timestamp, last_accepted timestamp",
    )
