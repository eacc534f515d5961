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
    adaptive_stream_partitions,
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
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


@query("q_stream_tumbling", _TUMBLING_ORACLE)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = drain_to_table(tumbling_agg(events_stream(spark, sf_dir)), shuffle_partitions=adaptive_stream_partitions(sf_dir))
    df = spark.table(out)
    # DuckDB date_trunc yields timestamp; window.start is timestamp — align
    return df.select(
        F.col("window_start").cast("timestamp"),
        "event_type",
        "n_events",
        "sum_value",
    )


# -- Q31: streaming SLIDING window (1 h wide, 30 min slide) ----------------
# Every event lands in exactly two windows; the oracle enumerates both
# memberships per event (bucket(ts) and bucket(ts) − 30 min) and must
# reproduce the drained streaming state exactly.

_SLIDING_ORACLE = """
WITH m AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, event_type
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type
  FROM events WHERE ts IS NOT NULL)
SELECT window_start, event_type, COUNT(*) AS n_events
FROM m
GROUP BY 1, 2
"""


@query("q_stream_sliding", _SLIDING_ORACLE)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    # NULL event time excluded explicitly — same contract as
    # streaming/ops.py::tumbling_agg (r12 ts-NULL audit)
    agg = (
        stream.filter(F.col("ts").isNotNull())
        .withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    out = drain_to_table(agg, shuffle_partitions=adaptive_stream_partitions(sf_dir))
    return spark.table(out).select(
        F.col("window_start").cast("timestamp"), "event_type", "n_events"
    )


# -- Q29+Q4: stream-static join (dimension enrichment) ---------------------
# The production pattern q_stream_join doesn't cover: an unbounded stream
# enriched by a STATIC dimension (broadcast to every micro-batch, no
# state, no watermark requirement for inner joins). Users map onto
# customer keys; the drained per-segment counts must equal the batch join.

_STREAM_STATIC_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_events
FROM events e
JOIN customer c ON c.c_custkey = e.user_id + 1
GROUP BY c.c_mktsegment
"""


@query("q_stream_static_join", _STREAM_STATIC_ORACLE)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = stream.join(
        F.broadcast(dim), dim["c_custkey"] == stream["user_id"] + 1
    )
    agg = enriched.groupBy("c_mktsegment").agg(F.count("*").alias("n_events"))
    out = drain_to_table(agg, shuffle_partitions=adaptive_stream_partitions(sf_dir))
    return spark.table(out)


# -- Q30: watermark late-data dropping, made observable --------------------
# Three micro-batches (recent file, empty bridge, stale file — the bridge
# burns Spark's one-batch late-event watermark lag, see
# streaming/ops.py::late_split_stream). The stale rows are all > 50 min
# past the active watermark and get dropped, so the drained result equals
# a batch aggregate over ONLY the recent slice. Removing withWatermark
# makes the stale rows aggregate and this oracle fail — the watermark is
# load-bearing, not decorative. epoch_us on both sides pins the cutoff to
# Spark's microsecond timeline regardless of the parquet file's physical
# timestamp unit (nanos or micros — see session.load_table).

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
    out = drain_to_table(agg, mode="update", shuffle_partitions=adaptive_stream_partitions(sf_dir))
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
  FROM events WHERE ts IS NOT NULL),
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
    out = drain_to_table(session_agg(events_stream(spark, sf_dir)), shuffle_partitions=adaptive_stream_partitions(sf_dir))
    return spark.table(out).select("user_id", "session_start", "n_events")


# -- X10 batch sessionization (the scalable batch-mode equivalent) ---------

_FUNNEL_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, ts,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events WHERE ts IS NOT NULL)
SELECT event_type, next_type, COUNT(*) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


@query("q_stream_funnel", _FUNNEL_ORACLE)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # ts is load-bearing (the transition sequence IS the timestamp
    # order): an unordered event would land at opposite ends of each
    # user's sequence on the two engines and mint fake transitions
    # (r12 ts-NULL audit) — excluded on both.
    e = e.filter(F.col("ts").isNotNull())
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
,
        shuffle_partitions=adaptive_stream_partitions(sf_dir),
    )
    return spark.table(out)


# -- X5 multimodal: binary payloads through Arrow mapInPandas --------------

_MULTIMODAL_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       lower(hex(encode(substring(text, 1, 8)))) AS head_hex
FROM documents
WHERE doc_id < 100 AND text IS NOT NULL
"""


@query("q_multimodal_bytes", _MULTIMODAL_ORACLE)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # media ingestion yields only rows WITH a payload (binaryFile never
    # emits NULL content); a NULL body would crash the Arrow batch's
    # len() — excluded on both engines (r12 NULL audit)
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & F.col("text").isNotNull()
    )
    mm = attach_binary(d, "doc_id", "text")
    feats = extract_byte_features(mm)
    # head_hex is the first 8 BYTES; ascii token text → first 8 chars too,
    # so the oracle can express it with substring+encode
    return feats.select("doc_id", "n_bytes", "head_hex")


# -- X5 multimodal: container-header metadata parse (PNG/JPEG/WAV) ---------
# Both engines synthesize the same spec-shaped headers from doc_id, then
# parse them INDEPENDENTLY at the byte level: Spark walks JPEG segments
# generically (operators/multimodal.py::parse_media_meta, pure binary
# expressions); the oracle slices the hex image of the same payload at the
# offsets the container specs dictate. Agreement means the byte layout,
# endianness handling, and segment walk are all right.

_MEDIA_META_ORACLE = """
WITH synth AS (
  SELECT doc_id,
    CASE doc_id % 3
      WHEN 0 THEN '89504E470D0A1A0A' || '0000000D' || '49484452'
                  || printf('%08X', 16 + doc_id % 2048)
                  || printf('%08X', 16 + (doc_id * 7) % 1152)
      WHEN 1 THEN '52494646' || '24000000' || '57415645' || '666D7420'
                  || '10000000' || '0100'
                  || printf('%02X', 1 + doc_id % 2) || '00'
                  || printf('%02X', (8000 * (1 + doc_id % 5)) % 256)
                  || printf('%02X', (8000 * (1 + doc_id % 5)) // 256)
                  || '0000'
      ELSE 'FFD8' || 'FFE0' || '0010' || '4A46494600' || repeat('00', 9)
           || 'FFC0' || '0011' || '08'
           || printf('%04X', 8 + (doc_id * 5) % 2160)
           || printf('%04X', 8 + (doc_id * 3) % 4096)
    END AS h
  FROM documents
)
SELECT doc_id,
  CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A' THEN 'png'
       WHEN substr(h, 1, 8) = '52494646' AND substr(h, 17, 8) = '57415645'
         THEN 'wav'
       WHEN substr(h, 1, 4) = 'FFD8' THEN 'jpeg' END AS media_kind,
  CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A'
         THEN ('0x' || substr(h, 33, 8))::BIGINT           -- IHDR width, bytes 17-20
       WHEN substr(h, 1, 4) = 'FFD8'
         THEN ('0x' || substr(h, 55, 4))::BIGINT           -- SOF0 width, bytes 28-29
       END AS width,
  CASE WHEN substr(h, 1, 16) = '89504E470D0A1A0A'
         THEN ('0x' || substr(h, 41, 8))::BIGINT           -- IHDR height, bytes 21-24
       WHEN substr(h, 1, 4) = 'FFD8'
         THEN ('0x' || substr(h, 51, 4))::BIGINT           -- SOF0 height, bytes 26-27
       END AS height,
  CASE WHEN substr(h, 1, 8) = '52494646'
         THEN ('0x' || substr(h, 47, 2) || substr(h, 45, 2))::BIGINT
       END AS channels,                                    -- fmt LE16, bytes 23-24
  CASE WHEN substr(h, 1, 8) = '52494646'
         THEN ('0x' || substr(h, 55, 2) || substr(h, 53, 2)
                    || substr(h, 51, 2) || substr(h, 49, 2))::BIGINT
       END AS sample_rate                                  -- fmt LE32, bytes 25-28
FROM synth
"""


@query("q_multimodal_meta", _MEDIA_META_ORACLE)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.multimodal import (
        parse_media_meta,
        synth_media,
    )

    d = load_table(spark, sf_dir, "documents")
    return parse_media_meta(synth_media(d, "doc_id"))


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


# -- Q34 via Spark 4 transformWithStateInPandas (stateful V2) --------------
# Same batching-invariant pattern: cumulative per-batch emissions, final
# max-reduce equals the batch GROUP BY whether the replay ran as 1
# micro-batch or 50.
#
# ENVIRONMENT GATE: the TWS state-server protocol needs google.protobuf,
# which this container does not ship (and installs are off-limits) — the
# driver worker crashes with ImportError before user code runs. The
# operator (streaming/ops.py::stateful_type_counts_v2) is real and the
# query registers automatically wherever protobuf exists; the gating
# itself is pytest-asserted (test_round3.py), mirroring the R2/R21 Excel
# shim posture.


def _has_tws_runtime() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_STATEFUL_V2_ORACLE = """
SELECT user_id, event_type, COUNT(*) AS n_events
FROM events
WHERE event_type IS NOT NULL
GROUP BY user_id, event_type
"""


# The SAME per-(user, event_type) semantics through the V1 engine, which
# runs in this container: both operators fold batches with the shared
# _type_count_transition, so a green driver row here pins the V2
# processor's logic — only its state-plumbing remains env-gated.


@query("q_stream_stateful_types", _STATEFUL_V2_ORACLE)
def q_stream_stateful_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import (
        drain_to_table,
        events_stream,
        stateful_type_counts_v1,
    )

    # stateful keyed ops require definite keys: a NULL event_type group
    # is silently dropped by the Pandas-state grouping while the batch
    # GROUP BY keeps it — excluded on both engines (r12 NULL audit)
    tbl = drain_to_table(
        stateful_type_counts_v1(
            events_stream(spark, sf_dir).filter(
                F.col("event_type").isNotNull()
            )
        ),
        mode="update",
        shuffle_partitions=adaptive_stream_partitions(sf_dir),
    )
    return (
        spark.table(tbl)
        .groupBy("user_id", "event_type")
        .agg(F.max("n_events").alias("n_events"))
    )


def q_stream_stateful_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import stateful_type_counts_v2

    # same NULL-key pin as the V1 twin (r12 NULL audit)
    tbl = drain_to_table(
        stateful_type_counts_v2(
            events_stream(spark, sf_dir).filter(
                F.col("event_type").isNotNull()
            )
        ),
        mode="update",
        shuffle_partitions=adaptive_stream_partitions(sf_dir),
    )
    return (
        spark.table(tbl)
        .groupBy("user_id", "event_type")
        .agg(F.max("n_events").alias("n_events"))
    )


if _has_tws_runtime():  # pragma: no cover — container lacks protobuf
    q_stream_stateful_v2 = query("q_stream_stateful_v2", _STATEFUL_V2_ORACLE)(
        q_stream_stateful_v2
    )


@query("q_stream_stateful", _STATEFUL_ORACLE)
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import (
        drain_to_table,
        events_stream,
        stateful_running_max,
    )

    tbl = drain_to_table(
        stateful_running_max(events_stream(spark, sf_dir)), mode="update"
,
        shuffle_partitions=adaptive_stream_partitions(sf_dir),
    )
    return (
        spark.table(tbl)
        .groupBy("user_id")
        .agg(
            F.max("n_seen").alias("n_seen"),
            F.max("max_value").alias("max_value"),
        )
    )


# -- Q29+Q5: stream-stream LEFT OUTER join (watermark-driven NULL rows) ----
# The hard half of streaming joins: a NULL-padded row may only be emitted
# once the watermark PROVES no match can still arrive. The oracle encodes
# that contract exactly: every matched pair (inner results emit
# immediately), plus NULL rows for unmatched clicks strictly older than
# final_watermark − 30 min, where final_watermark =
# min(max click ts, max purchase ts) − 10 min — the value a bounded
# replay ends on. Unmatched clicks inside that band MUST stay withheld
# (emitting them would be wrong: a purchase could still arrive); the
# hash gate fails in both directions.

_STREAM_JOIN_OUTER_ORACLE = """
WITH wm AS (
  SELECT LEAST(
           (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
           (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'))
         - INTERVAL 10 MINUTE AS w)
SELECT c.user_id AS user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS delay_us
FROM events c
LEFT JOIN events p
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
CROSS JOIN wm
WHERE c.event_type = 'click'
  AND (p.event_id IS NOT NULL OR c.ts < wm.w - INTERVAL 30 MINUTE)
"""


@query("q_stream_join_outer", _STREAM_JOIN_OUTER_ORACLE)
def q_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import (
        click_purchase_outer,
        flush_split_stream,
    )

    out = drain_to_table(
        click_purchase_outer(flush_split_stream(spark, sf_dir)), mode="append"
,
        shuffle_partitions=adaptive_stream_partitions(sf_dir),
    )
    return spark.table(out)


# -- X50 streaming OHLC (stateful min_by/max_by rollup) --------------------
# The hypertable rollup running incrementally: open/close are
# min_by/max_by over a UNIQUE (ts, event_id) struct ordering, so the
# streamed state result is deterministic and equals the batch rollup no
# matter how micro-batches slice the input. Complete mode; one watermark.

_STREAM_OHLC_ORACLE = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_asc,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_desc
  FROM events WHERE ts IS NOT NULL)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       MAX(CASE WHEN rn_asc = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_desc = 1 THEN value END) AS close
FROM ranked GROUP BY window_start, event_type
"""


@query("q_stream_ohlc", _STREAM_OHLC_ORACLE)
def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    # NULL event time excluded explicitly — same contract as
    # streaming/ops.py::tumbling_agg (r12 ts-NULL audit)
    agg = (
        stream.filter(F.col("ts").isNotNull())
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min_by("value", F.struct("ts", "event_id")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.struct("ts", "event_id")).alias("close"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "open",
            "high",
            "low",
            "close",
        )
    )
    out = drain_to_table(agg, shuffle_partitions=adaptive_stream_partitions(sf_dir))
    return spark.table(out).select(
        F.col("window_start").cast("timestamp"),
        "event_type",
        "n_events",
        "open",
        "high",
        "low",
        "close",
    )


# -- X5+ modality routing: dispatch by magic bytes to per-modality plans ---
# The mixed-corpus pattern: ONE binary column carrying different container
# formats, routed by sniffed media_kind into modality-specific
# sub-pipelines (images → megapixel binning over parsed dims; audio →
# channel layout + sample-rate extrema), then unioned back under a
# common schema. Each branch is a filter + keyed aggregate over the same
# parsed scan — Catalyst shares the parse via column pruning, and no
# Python touches the bytes.

_MEDIA_ROUTE_ORACLE = """
WITH synth AS (
  SELECT doc_id,
    CASE doc_id % 3
      WHEN 0 THEN '89504E470D0A1A0A' || '0000000D' || '49484452'
                  || printf('%08X', 16 + doc_id % 2048)
                  || printf('%08X', 16 + (doc_id * 7) % 1152)
      WHEN 1 THEN '52494646' || '24000000' || '57415645' || '666D7420'
                  || '10000000' || '0100'
                  || printf('%02X', 1 + doc_id % 2) || '00'
                  || printf('%02X', (8000 * (1 + doc_id % 5)) % 256)
                  || printf('%02X', (8000 * (1 + doc_id % 5)) // 256)
                  || '0000'
      ELSE 'FFD8' || 'FFE0' || '0010' || '4A46494600' || repeat('00', 9)
           || 'FFC0' || '0011' || '08'
           || printf('%04X', 8 + (doc_id * 5) % 2160)
           || printf('%04X', 8 + (doc_id * 3) % 4096)
    END AS h
  FROM documents),
parsed AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END
      AS media_kind,
    CASE doc_id % 3
      WHEN 0 THEN 16 + doc_id % 2048
      WHEN 2 THEN 8 + (doc_id * 3) % 4096 END AS w,
    CASE doc_id % 3
      WHEN 0 THEN 16 + (doc_id * 7) % 1152
      WHEN 2 THEN 8 + (doc_id * 5) % 2160 END AS ht,
    CASE doc_id % 3 WHEN 1 THEN 1 + doc_id % 2 END AS ch,
    CASE doc_id % 3 WHEN 1 THEN 8000 * (1 + doc_id % 5) END AS rate
  FROM synth)
SELECT media_kind,
       CAST(w * ht // 1000000 AS BIGINT) AS bin,
       COUNT(*) AS n,
       CAST(MIN(w) AS BIGINT) AS lo, CAST(MAX(w) AS BIGINT) AS hi
FROM parsed WHERE media_kind IN ('png', 'jpeg')
GROUP BY media_kind, bin
UNION ALL
SELECT 'wav', CAST(ch AS BIGINT), COUNT(*),
       CAST(MIN(rate) AS BIGINT), CAST(MAX(rate) AS BIGINT)
FROM parsed WHERE media_kind = 'wav'
GROUP BY ch
"""


@query("q_multimodal_route", _MEDIA_ROUTE_ORACLE)
def q_multimodal_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.multimodal import (
        parse_media_meta,
        synth_media,
    )

    d = load_table(spark, sf_dir, "documents")
    parsed = parse_media_meta(synth_media(d, "doc_id"))
    images = (
        parsed.filter(F.col("media_kind").isin("png", "jpeg"))
        .groupBy(
            "media_kind",
            F.expr("width * height DIV 1000000").cast("bigint").alias("bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("width").cast("bigint").alias("lo"),
            F.max("width").cast("bigint").alias("hi"),
        )
    )
    audio = (
        parsed.filter(F.col("media_kind") == "wav")
        .groupBy(
            F.lit("wav").alias("media_kind"),
            F.col("channels").cast("bigint").alias("bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("sample_rate").cast("bigint").alias("lo"),
            F.max("sample_rate").cast("bigint").alias("hi"),
        )
    )
    return images.unionByName(audio)


# -- Chained stateful operators: window-on-window rollup --------------------
#
# Two tumbling aggregations CHAINED in one streaming query (Spark 3.4+
# multiple-stateful-operator support): events → hourly per-type sums →
# 6-hour rollup of the hourly results. The second window aggregates the
# FIRST's window-start event time, exercising the watermark propagation
# between stateful operators. Oracle = the same two-level rollup in
# batch SQL (integer cents, so both levels are exact).

_STREAM_CHAINED_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, h)
SELECT event_type,
       CAST(to_timestamp(epoch(h) - epoch(h) % 21600) AS TIMESTAMP) AS window6_start,
       CAST(SUM(cents) AS BIGINT) AS cents6,
       COUNT(*) AS n_hours
FROM hourly, (SELECT MAX(ts) AS mx FROM events) wm
GROUP BY event_type, window6_start, wm.mx
-- append-mode emission contract: a 6-hour window emits iff the final
-- watermark (max event time - 10 min) passed its END; the trailing
-- window per type is correctly withheld and the oracle says so
HAVING epoch(window6_start) + 21600 <= epoch(wm.mx) - 600
"""


@query("q_stream_chained_windows", _STREAM_CHAINED_ORACLE)
def q_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import (
        drain_to_table,
        events_stream,
    )

    stream = events_stream(spark, sf_dir)
    hourly = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    six = (
        hourly.groupBy(
            # window-on-window: passing the WINDOW STRUCT (not its start
            # column) is what propagates event time + watermark through
            # the second stateful operator (SPARK-40925 chained windows)
            F.window(F.col("w1"), "6 hours").alias("w6"),
            "event_type",
        )
        .agg(
            F.sum("cents").cast("bigint").alias("cents6"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .select(
            "event_type",
            F.col("w6.start").alias("window6_start"),
            "cents6",
            "n_hours",
        )
    )
    out = drain_to_table(six, mode="append", shuffle_partitions=adaptive_stream_partitions(sf_dir))
    return spark.table(out)


# -- X179 streaming windowed top-k (two-phase) -----------------------------
#
# Rank is not expressible inside an unbounded stream (no append-mode
# window-functions), so the production pattern is two-phase: the STREAM
# maintains per-(window, event_type) counts (incremental state, the
# heavy lifting), and the cheap rank runs BATCH over the drained state.
# The oracle replays the same two phases in SQL.  Top-2 per hourly
# window by (count desc, event_type) — fully deterministic.

_STREAM_TOPK_ORACLE = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n_events
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                               ORDER BY n_events DESC, event_type) AS rnk
  FROM agg)
SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
       n_events, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 2
"""


@query("q_stream_topk_windowed", _STREAM_TOPK_ORACLE)
def q_stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    out = drain_to_table(tumbling_agg(events_stream(spark, sf_dir)), shuffle_partitions=adaptive_stream_partitions(sf_dir))
    # a NULL event type has no place on a type leaderboard, and it
    # sorts at opposite ends of the two engines' rank tie-break —
    # excluded on both (r12 NULL audit)
    df = spark.table(out).filter(F.col("event_type").isNotNull())
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 2)
        .select(
            F.col("window_start").cast("timestamp"),
            "event_type",
            "n_events",
            "rnk",
        )
    )


# -- X199 stream-stream FULL OUTER join ------------------------------------
#
# Completes the stream-stream join matrix (inner / left outer / full
# outer): both sides NULL-pad under watermark proof.  The oracle adds
# the symmetric right-side contract to the LEFT OUTER one above:
# unmatched PURCHASES emit once the final watermark passes purchase_ts
# (the latest possible matching click carries click_ts = purchase_ts),
# unmatched CLICKS once it passes click_ts + 30 min.  Rows inside
# either band must stay withheld — the hash gate fails in both
# directions if the engine's eviction timing drifts.

_STREAM_JOIN_FULL_ORACLE = """
WITH wm AS (
  SELECT LEAST(
           (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
           (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'))
         - INTERVAL 10 MINUTE AS w),
matched AS (
  SELECT c.user_id AS user_id, c.event_id AS click_id,
         p.event_id AS purchase_id,
         CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS delay_us
  FROM events c JOIN events p
    ON c.user_id = p.user_id
   AND c.event_type = 'click' AND p.event_type = 'purchase'
   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
unmatched_clicks AS (
  SELECT c.user_id, c.event_id AS click_id,
         CAST(NULL AS BIGINT) AS purchase_id,
         CAST(NULL AS BIGINT) AS delay_us
  FROM events c CROSS JOIN wm
  WHERE c.event_type = 'click'
    AND c.ts < wm.w - INTERVAL 30 MINUTE
    AND NOT EXISTS (
      SELECT 1 FROM events p
      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)),
unmatched_purchases AS (
  SELECT p.user_id, CAST(NULL AS BIGINT) AS click_id,
         p.event_id AS purchase_id,
         CAST(NULL AS BIGINT) AS delay_us
  FROM events p CROSS JOIN wm
  WHERE p.event_type = 'purchase'
    AND p.ts < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM events c
      WHERE c.event_type = 'click' AND c.user_id = p.user_id
        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE))
SELECT * FROM matched
UNION ALL SELECT * FROM unmatched_clicks
UNION ALL SELECT * FROM unmatched_purchases
"""


@query("q_stream_join_full", _STREAM_JOIN_FULL_ORACLE)
def q_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import (
        click_purchase_full_outer,
        flush_split_stream,
    )

    out = drain_to_table(
        click_purchase_full_outer(flush_split_stream(spark, sf_dir)),
        mode="append",
        shuffle_partitions=adaptive_stream_partitions(sf_dir),
    )
    return spark.table(out)


# -- X231 streaming threshold alerts (filter -> windowed dedup) ------------
#
# The alerting shape: raise at most ONE alert per (user, hour) when any
# event value crosses the threshold — a streaming filter followed by
# dropDuplicatesWithinWatermark on the (user, window-start) alert key,
# drained in append mode and aggregated per hour. The bounded replay
# delivers every row within the watermark, so the oracle is the exact
# batch dedup: DISTINCT (user, hour) among crossing events. State per
# key expires with the watermark — bounded state at any rate.

_ALERT_THRESHOLD = 250.0

_STREAM_ALERTS_ORACLE = f"""
WITH crossings AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour_start
  FROM events WHERE value > {_ALERT_THRESHOLD})
SELECT hour_start, CAST(COUNT(*) AS BIGINT) AS n_alerts
FROM crossings GROUP BY hour_start
"""


@query("q_stream_alerts", _STREAM_ALERTS_ORACLE)
def q_stream_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    alerts = (
        stream.filter(F.col("value") > _ALERT_THRESHOLD)
        .withColumn("hour_start", F.date_trunc("hour", "ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "hour_start"])
        .select("user_id", "hour_start")
    )
    out = drain_to_table(alerts, mode="append", shuffle_partitions=adaptive_stream_partitions(sf_dir))
    return (
        spark.table(out)
        .groupBy(F.col("hour_start").cast("timestamp").alias("hour_start"))
        .agg(F.count("*").cast("bigint").alias("n_alerts"))
    )


# -- X306 audio voice-activity detection (energy VAD) ----------------------
#
# The codec-free slice of an audio pipeline: 16-bit little-endian PCM
# payloads (synthesized deterministically per doc — bursty: every third
# 128-sample block is 16× louder) are packed to REAL bytes and decoded
# back through numpy inside an Arrow-batched mapInPandas, then framed
# (64 samples), energy-thresholded, and run-length segmented — all the
# plumbing a real VAD needs minus the codec. The oracle never sees
# bytes: it regenerates the same samples arithmetically and replays the
# frame/threshold/segment logic in SQL, so the byte pack/unpack layer is
# proven by agreement. Per-doc work is bounded; docs parallelize freely.

_VAD_FRAME = 64
_VAD_THRESHOLD = 1 << 20


def _vad_expr_sql() -> str:
    return """
samples AS (
  SELECT doc_id, i,
         CAST(((doc_id * 31 + i * 17) % 256 - 128) *
              (CASE WHEN ((i // 128) + doc_id) % 3 = 0 THEN 16 ELSE 1 END)
           AS BIGINT) AS x
  FROM docs, LATERAL UNNEST(range(0, n_samples)) AS t(i)),
frames AS (
  SELECT doc_id, i // 64 AS f, SUM(x * x) AS energy
  FROM samples GROUP BY doc_id, i // 64),
flags AS (
  SELECT doc_id, f, CASE WHEN energy > 1048576 THEN 1 ELSE 0 END AS active,
         LAG(CASE WHEN energy > 1048576 THEN 1 ELSE 0 END, 1, 0)
           OVER (PARTITION BY doc_id ORDER BY f) AS prev_active
  FROM frames)
"""


_VAD_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, CAST(1024 + (doc_id % 4) * 256 AS BIGINT) AS n_samples
  FROM documents),
{_vad_expr_sql()}
SELECT doc_id,
       CAST(MAX(f) + 1 AS BIGINT) AS n_frames,
       CAST(SUM(active) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN active = 1 AND prev_active = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_segments,
       CAST((1000000 * SUM(active)) // (MAX(f) + 1) AS BIGINT)
         AS active_ppm
FROM flags GROUP BY doc_id
"""


@query("q_multimodal_audio_vad", _VAD_ORACLE)
def q_multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 1024 + (doc_id % 4) * 256
                i = np.arange(n, dtype=np.int64)
                gain = np.where(((i // 128) + doc_id) % 3 == 0, 16, 1)
                x = ((doc_id * 31 + i * 17) % 256 - 128) * gain
                # pack to real 16-bit LE PCM bytes and decode back — the
                # byte layer a codec would hand us
                pcm = x.astype("<i2").tobytes()
                decoded = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                frames = decoded.reshape(-1, _VAD_FRAME)
                energy = (frames * frames).sum(axis=1)
                active = (energy > _VAD_THRESHOLD).astype(np.int64)
                rises = int(
                    (np.diff(np.concatenate(([0], active))) == 1).sum()
                )
                out.append(
                    (
                        doc_id,
                        int(active.size),
                        int(active.sum()),
                        rises,
                        (1_000_000 * int(active.sum())) // int(active.size),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_active",
                    "n_segments",
                    "active_ppm",
                ],
            )

    return d.mapInPandas(
        vad,
        "doc_id bigint, n_frames bigint, n_active bigint, "
        "n_segments bigint, active_ppm bigint",
    )


# -- X307 image patch extraction (ViT-style patchify) ----------------------
#
# Vision-transformer preprocessing minus the codec: each doc carries a
# synthetic H×W 8-bit grayscale raster (H, W vary per doc, both multiples
# of the 16-px patch size). The Spark path materializes the REAL byte
# buffer, reshapes it in numpy inside mapInPandas, slices the 16×16 patch
# grid, and emits per-patch statistics (sum/min/max) — one output row per
# patch, exactly the token layout a ViT embeds. The oracle regenerates
# pixels arithmetically and aggregates per patch cell in SQL; agreement
# proves the buffer layout (row-major, stride W) and the grid arithmetic.

_PATCH = 16

_PATCHIFY_ORACLE = """
WITH docs AS (
  SELECT doc_id,
         CAST(32 + (doc_id % 3) * 16 AS BIGINT) AS h,
         CAST(32 + (doc_id % 5) * 16 AS BIGINT) AS w
  FROM documents WHERE doc_id < 200),
px AS (
  SELECT doc_id, h, w, i // w AS y, i % w AS x,
         CAST((doc_id + (i // w) * 31 + (i % w) * 17) % 256 AS BIGINT) AS v
  FROM docs, LATERAL UNNEST(range(0, h * w)) AS t(i))
SELECT doc_id, CAST(y // 16 AS BIGINT) AS py, CAST(x // 16 AS BIGINT) AS px,
       CAST(SUM(v) AS BIGINT) AS p_sum,
       CAST(MIN(v) AS BIGINT) AS p_min,
       CAST(MAX(v) AS BIGINT) AS p_max
FROM px GROUP BY doc_id, y // 16, x // 16
"""


@query("q_multimodal_patchify", _PATCHIFY_ORACLE)
def q_multimodal_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )

    def patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = _PATCH
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                h = 32 + (doc_id % 3) * 16
                w = 32 + (doc_id % 5) * 16
                y, x = np.mgrid[0:h, 0:w]
                img = ((doc_id + y * 31 + x * 17) % 256).astype(np.uint8)
                # round-trip through the flat byte buffer a decoder yields
                buf = img.tobytes()
                raster = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
                # patch grid: (h//p, p, w//p, p) → per-patch axes last
                grid = (
                    raster.reshape(h // p, p, w // p, p)
                    .transpose(0, 2, 1, 3)
                    .astype(np.int64)
                )
                sums = grid.sum(axis=(2, 3))
                mins = grid.min(axis=(2, 3))
                maxs = grid.max(axis=(2, 3))
                for py in range(h // p):
                    for px_ in range(w // p):
                        out.append(
                            (
                                doc_id,
                                py,
                                px_,
                                int(sums[py, px_]),
                                int(mins[py, px_]),
                                int(maxs[py, px_]),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "py", "px", "p_sum", "p_min", "p_max"],
            )

    return d.mapInPandas(
        patchify,
        "doc_id bigint, py bigint, px bigint, "
        "p_sum bigint, p_min bigint, p_max bigint",
    )


# -- X362: dHash image near-duplicate detection ----------------------------
#
# The standard perceptual near-dup pipeline for image corpora: decode →
# resize to a 9×8 thumbnail → difference hash (bit r·7+c set iff
# pixel(r,c) < pixel(r,c+1)) → bucket-join on the 56-bit hash. Codec
# decode is STUBBED with the repo's deterministic synthetic raster
# (documented; the container has no image libs) — docs sharing
# doc_id//4 yield identical thumbnails except each group's 4th member,
# which gets a different gradient (a planted non-dup). Everything
# downstream of the fake decode is the real pipeline: numpy bit packing
# over the byte buffer inside mapInPandas, then an exact-dup collapse
# on the hash — sub-linear bucketing, no pairwise compare. The oracle
# rebuilds the raster and the bit arithmetic in SQL.

_DHASH_ORACLE = """
WITH docs AS (
  SELECT doc_id FROM documents WHERE doc_id < 500),
px AS (
  SELECT doc_id, y.y AS y, x.x AS x,
         CASE WHEN doc_id % 4 = 3
              THEN ((doc_id // 4) * 7 + y.y * 29 + x.x * 19) % 256
              ELSE ((doc_id // 4) * 7 + y.y * 31 + x.x * 17) % 256
         END AS v
  FROM docs, LATERAL UNNEST(range(0, 8)) AS y(y),
             LATERAL UNNEST(range(0, 9)) AS x(x)),
bits AS (
  SELECT a.doc_id, a.y, a.x,
         CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
  FROM px a JOIN px b
    ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
  WHERE a.x < 7),
h AS (
  SELECT doc_id,
         CAST(SUM(bit * (CAST(1 AS BIGINT) << (y * 7 + x))) AS BIGINT)
           AS dhash
  FROM bits GROUP BY doc_id)
SELECT dhash,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM h GROUP BY dhash HAVING COUNT(*) >= 2
"""


@query("q_multimodal_dhash_neardup", _DHASH_ORACLE)
def q_multimodal_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id")
    )

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                y, x = np.mgrid[0:8, 0:9]
                base = (doc_id // 4) * 7
                if doc_id % 4 == 3:
                    img = ((base + y * 29 + x * 19) % 256).astype(np.uint8)
                else:
                    img = ((base + y * 31 + x * 17) % 256).astype(np.uint8)
                # the byte-buffer round trip a real decoder would yield
                thumb = np.frombuffer(img.tobytes(), dtype=np.uint8).reshape(
                    8, 9
                )
                bits = (thumb[:, :7] < thumb[:, 1:8]).astype(np.int64)
                weights = 1 << (
                    np.arange(8)[:, None] * 7 + np.arange(7)[None, :]
                ).astype(np.int64)
                out.append((doc_id, int((bits * weights).sum())))
            yield pd.DataFrame(out, columns=["doc_id", "dhash"])

    h = d.mapInPandas(dhash, "doc_id bigint, dhash bigint")
    return (
        h.groupBy("dhash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .filter(F.col("n_images") >= 2)
    )


# -- X468 stream-stream LEFT SEMI join (streaming EXISTS) --------------------
# The attribution EXISTS: clicks followed by a same-user purchase within
# 30 minutes, emitted once on first match. Semi emission is inner-like
# (no watermark-withheld tail), so the plain replayed source suffices.
# The batch oracle is the same EXISTS over the raw events.

_STREAM_SEMI_ORACLE = """
SELECT c.user_id AS user_id,
       c.event_id AS click_id
FROM events c
WHERE c.event_type = 'click'
  AND EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase'
      AND p.user_id = c.user_id
      AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
"""


@query("q_stream_join_semi", _STREAM_SEMI_ORACLE)
def q_stream_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.streaming.ops import click_purchase_semi

    out = drain_to_table(
        click_purchase_semi(events_stream(spark, sf_dir)), mode="append"
,
        shuffle_partitions=adaptive_stream_partitions(sf_dir),
    )
    return spark.table(out)


# -- X477 multimodal resize as an oracle surface -------------------------------
#
# The codec-free resize plumbing (operators/multimodal.py:241 — strided
# byte-grid downsample through Arrow mapInPandas) promoted from
# pytest-only to a driver-checkable row: the thumb BYTES are exact
# (thumb[i] = raw[min(i·n // 64, n-1)]), so DuckDB re-derives them by
# hex-pair arithmetic over encode(text) and both engines compare the
# lowercase hex. The Spark side runs the REAL 1-batch-in/1-batch-out
# Arrow path — this row proves the plumbing, not a re-expression.

_MM_RESIZE_ORACLE = """
WITH src AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS n
  FROM documents WHERE doc_id < 100 AND LENGTH(text) > 0)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bytes,
       list_aggregate(
         list_transform(
           generate_series(0, 63),
           i -> substr(hx, 2 * LEAST((i * n) // 64, n - 1) + 1, 2)),
         'string_agg', '') AS thumb_hex,
       CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h
FROM src
"""


@query("q_multimodal_resize", _MM_RESIZE_ORACLE)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.multimodal import (
        attach_binary,
        resize_bytes,
    )

    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 100) & (F.length("text") > 0)
    )
    mm = attach_binary(d, "doc_id", "text")
    sized = resize_bytes(mm, out_w=8, out_h=8)
    return sized.join(
        mm.select("doc_id", F.octet_length("payload").cast("bigint").alias("n_bytes")),
        "doc_id",
    ).select(
        "doc_id",
        "n_bytes",
        F.lower(F.hex("thumb")).alias("thumb_hex"),
        "out_w",
        "out_h",
    )


# -- X478 multimodal frame sampling as an oracle surface -----------------------
#
# The 1→N Arrow fan-out (operators/multimodal.py:270 — fixed-size frame
# chunking, every k-th frame emitted as its own row) with the same
# hex-pair oracle: frame fi = raw[fi·F : fi·F+F), every 4th of the
# 16-byte frames. Proves mapInPandas row-expansion end to end.

_MM_FRAMES_ORACLE = """
WITH src AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS n
  FROM documents WHERE doc_id < 50 AND text IS NOT NULL),
f AS (
  SELECT doc_id, UNNEST(generate_series(0, n // 16 - 1)) AS fi, hx
  FROM src WHERE n >= 16)
SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
       substr(hx, 32 * fi + 1, 32) AS frame_hex
FROM f WHERE fi % 4 = 0
"""


@query("q_multimodal_frame_sample", _MM_FRAMES_ORACLE)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.multimodal import (
        attach_binary,
        sample_frames,
    )

    # same payload pin as q_multimodal_bytes (r12 NULL audit)
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 50) & F.col("text").isNotNull()
    )
    mm = attach_binary(d, "doc_id", "text")
    frames = sample_frames(mm, frame_bytes=16, every_k=4)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.lower(F.hex("frame")).alias("frame_hex"),
    )


# -- X499 streaming windowed entropy monitor ----------------------------------
#
# The real-time category-balance alarm: Shannon entropy (nats) +
# normalized entropy of the event-type mix per tumbling hour, computed
# over a LIVE watermarked stream. The streaming stage emits only exact
# integer cell counts (window x event_type — bounded state, the Q30/Q31
# machinery); the entropy itself is batch post-processing on the drained
# bounded table via the portable-ln kernel with per-window ordered
# folds, so the row is fully oracle-exact (DuckDB replays the same
# hour-bucket counts batch-side). The oracle doubles as the
# batch-equivalence proof for the streaming aggregation.

_STREAM_ENTROPY_ORACLE = """
WITH cells AS (
  SELECT date_trunc('hour', ts) AS ws, event_type AS et,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT ws AS tws, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k
  FROM cells GROUP BY 1),
stack AS (
  SELECT 'p' AS which, ws, et, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS v
  FROM cells JOIN tot ON ws = tws
  UNION ALL
  SELECT 'k', tws, NULL, CAST(k AS DOUBLE) FROM tot),
lns AS ({LN_LAYER}),
folds AS (
  SELECT ws, list_reduce(list(v * lnv ORDER BY et), (a, b) -> a + b) AS s
  FROM lns WHERE which = 'p' GROUP BY ws)
SELECT CAST(f.ws AS TIMESTAMP) AS window_start,
       t.n AS n_events, t.k AS k_types,
       -(f.s) AS entropy_nats,
       CASE WHEN t.k > 1 THEN -(f.s) / l.lnv END AS entropy_norm
FROM folds f
JOIN tot t ON f.ws = t.tws
JOIN (SELECT ws, lnv FROM lns WHERE which = 'k') l ON f.ws = l.ws
"""


def _stream_entropy_oracle() -> str:
    from mini_etl_project_spark.queries.helpers import sql_ln_layer

    return _STREAM_ENTROPY_ORACLE.replace(
        "{LN_LAYER}", sql_ln_layer("stack", "which, ws, et")
    )


@query("q_stream_entropy_windowed", _stream_entropy_oracle())
def q_stream_entropy_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.queries.helpers import (
        fold_sum,
        pln_finish,
        pln_k,
        pln_red,
    )

    out = drain_to_table(tumbling_agg(events_stream(spark, sf_dir)), shuffle_partitions=adaptive_stream_partitions(sf_dir))
    cells = spark.table(out).select(
        F.col("window_start").alias("ws"),
        F.col("event_type").alias("et"),
        F.col("n_events").cast("bigint").alias("c"),
    )
    tot = cells.groupBy(F.col("ws").alias("tws")).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    stack = (
        cells.join(F.broadcast(tot), cells["ws"] == F.col("tws"))
        .select(
            F.lit("p").alias("which"),
            "ws",
            "et",
            (F.col("c").cast("double") / F.col("n").cast("double")).alias(
                "v"
            ),
        )
        .unionAll(
            tot.select(
                F.lit("k"),
                F.col("tws"),
                F.lit(None).cast("string"),
                F.col("k").cast("double"),
            )
        )
    )
    lns = (
        stack.withColumn("red", pln_red("v"))
        .withColumn("kk", pln_k("v"))
        .select(
            "which",
            "ws",
            "et",
            "v",
            pln_finish("red", "kk").alias("lnv"),
        )
    )
    folds = (
        lns.filter(F.col("which") == "p")
        .groupBy("ws")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("et", (F.col("v") * F.col("lnv")).alias("t"))
                )
            ).alias("ps")
        )
        .select(
            "ws", fold_sum(F.transform("ps", lambda p: p["t"])).alias("s")
        )
    )
    lnk = lns.filter(F.col("which") == "k").select(
        F.col("ws").alias("lws"), F.col("lnv").alias("lnk")
    )
    return (
        folds.join(F.broadcast(tot), folds["ws"] == F.col("tws"))
        .join(F.broadcast(lnk), folds["ws"] == F.col("lws"))
        .select(
            F.col("ws").cast("timestamp").alias("window_start"),
            F.col("n").alias("n_events"),
            F.col("k").alias("k_types"),
            (-F.col("s")).alias("entropy_nats"),
            F.when(F.col("k") > 1, (-F.col("s")) / F.col("lnk")).alias(
                "entropy_norm"
            ),
        )
    )
