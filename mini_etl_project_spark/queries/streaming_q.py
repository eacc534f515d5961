"""Streaming queries with batch oracles (Q29–Q34, X10) + multimodal (X5).

Each ``q_stream_*`` runs a REAL Structured Streaming job (file replay →
watermarked event-time transform → availableNow drain into a memory sink)
and returns the drained result as a batch DataFrame; the DuckDB oracle is
the batch-SQL equivalent. This checks streaming execution itself — window
assignment, session merging, state — not a batch simulation of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_etl_project_spark.operators.multimodal import (
    attach_binary,
    extract_byte_features,
)
from mini_etl_project_spark.queries import query
from mini_etl_project_spark.session import load_table
from mini_etl_project_spark.streaming.ops import (
    drain_to_table,
    events_stream,
    late_split_stream,
    session_agg,
    tumbling_agg,
)

# -- Q29/Q30/Q31: streaming tumbling-window aggregate ----------------------

_TUMBLING_ORACLE = """
SELECT DATE_TRUNC('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("q_stream_tumbling", _TUMBLING_ORACLE)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = drain_to_table(tumbling_agg(events_stream(spark, sf_dir)))
    df = spark.table(out)
    # DuckDB date_trunc yields timestamp; window.start is timestamp — align
    return df.select(
        F.col("window_start").cast("timestamp"),
        "event_type",
        "n_events",
        "sum_value",
    )


# -- Q30: watermark late-data dropping, made observable --------------------
# Three micro-batches (recent file, empty bridge, stale file — the bridge
# burns Spark's one-batch late-event watermark lag, see
# streaming/ops.py::late_split_stream). The stale rows are all > 50 min
# past the active watermark and get dropped, so the drained result equals
# a batch aggregate over ONLY the recent slice. Removing withWatermark
# makes the stale rows aggregate and this oracle fail — the watermark is
# load-bearing, not decorative. epoch_us on both sides pins the cutoff to
# Spark's microsecond timeline (events.parquet is TIMESTAMP(NANOS)).

_LATE_DROP_ORACLE = """
WITH mx AS (SELECT MAX(ts) AS m FROM events)
SELECT DATE_TRUNC('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events
FROM events, mx
WHERE epoch_us(ts) >= epoch_us(m) - 3600000000
GROUP BY 1, 2
"""


@query("q_stream_late_drop", _LATE_DROP_ORACLE)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = late_split_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    out = drain_to_table(agg, mode="update")
    return spark.table(out).select(
        F.col("window_start").cast("timestamp"), "event_type", "n_events"
    )


# -- Q32/X10: streaming session windows vs gaps-and-islands oracle ---------
# Boundary semantics verified empirically (Spark 4.1.2): two events exactly
# `gap` apart MERGE into one session (session_window extends the window to
# ts+gap and a next event AT that end still merges) — so "new session"
# requires gap STRICTLY > 30 minutes, exactly what this oracle encodes.

_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
islands AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM islands
GROUP BY user_id, session_id
"""


@query("q_stream_sessions", _SESSION_ORACLE)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = drain_to_table(session_agg(events_stream(spark, sf_dir)))
    return spark.table(out).select("user_id", "session_start", "n_events")


# -- X10 batch sessionization (the scalable batch-mode equivalent) ---------

_FUNNEL_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, ts,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events)
SELECT event_type, next_type, COUNT(*) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


@query("q_stream_funnel", _FUNNEL_ORACLE)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )


# -- Q29+Q4: stream-stream join (watermarked, time-bounded) ----------------
# Single-file availableNow replay delivers both sides in batch 0, so no
# state is evicted mid-run and the drained inner join equals the batch
# join exactly — the streaming machinery (state store, range condition,
# watermark bookkeeping) is what's under test.

_STREAM_JOIN_ORACLE = """
SELECT c.user_id AS user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS delay_us
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


@query("q_stream_join", _STREAM_JOIN_ORACLE)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import click_purchase_join

    out = drain_to_table(
        click_purchase_join(events_stream(spark, sf_dir)), mode="append"
    )
    return spark.table(out)


# -- X5 multimodal: binary payloads through Arrow mapInPandas --------------

_MULTIMODAL_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       lower(hex(encode(substring(text, 1, 8)))) AS head_hex
FROM documents
WHERE doc_id < 100
"""


@query("q_multimodal_bytes", _MULTIMODAL_ORACLE)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    mm = attach_binary(d, "doc_id", "text")
    feats = extract_byte_features(mm)
    # head_hex is the first 8 BYTES; ascii token text → first 8 chars too,
    # so the oracle can express it with substring+encode
    return feats.select("doc_id", "n_bytes", "head_hex")


# -- Q34 stateful op, oracle-checked ---------------------------------------
# applyInPandasWithState emits each user's CUMULATIVE (count, max) once
# per micro-batch; the final cumulative row per user equals the batch
# aggregate, so max-reducing the drained emissions is batching-invariant —
# the oracle holds whether the replay ran as 1 micro-batch or 50.

_STATEFUL_ORACLE = """
SELECT user_id, COUNT(*) AS n_seen, MAX(value) AS max_value
FROM events
GROUP BY user_id
"""


@query("q_stream_stateful", _STATEFUL_ORACLE)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import (
        drain_to_table,
        events_stream,
        stateful_running_max,
    )

    tbl = drain_to_table(
        stateful_running_max(events_stream(spark, sf_dir)), mode="update"
    )
    return (
        spark.table(tbl)
        .groupBy("user_id")
        .agg(
            F.max("n_seen").alias("n_seen"),
            F.max("max_value").alias("max_value"),
        )
    )
