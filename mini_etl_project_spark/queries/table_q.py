"""Snapshot-table queries — MERGE, change feed, and the streaming
exactly-once sink, each checked against a DuckDB oracle.

The table format itself (sources/snapshots.py) is exercised end-to-end:
every query below BUILDS a table in /tmp from the round's parquet
fixtures, runs the table operation, and returns an aggregate whose value
the oracle reproduces from the raw fixtures with plain SQL. A wrong
manifest, a lost file, a survivor row dropped by MERGE, or a change feed
that leaks copied rows all surface as a hash mismatch.

Scale notes: MERGE's cost is proportional to the files that contain a
matched key (file-pruned copy-on-write), the change feed reads only the
changed files of each commit (I/O scales with the delta, not the table),
and the streaming sink commits each micro-batch transactionally so a
replayed batch is a no-op — all of which is what the same operations do
on a 1000-executor cluster over object storage.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_project_spark.queries import query
from mini_etl_project_spark.queries.helpers import dsum, sql_dsum
from mini_etl_project_spark.session import load_table


def _fresh_root(sf_dir: str, tag: str) -> str:
    """Deterministic per-fixture scratch dir, rebuilt on every call so
    repeated driver invocations see identical content."""
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = f"/tmp/mini_etl_snap_{tag}_{h}"
    shutil.rmtree(root, ignore_errors=True)
    return root


def _customer_slim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


# -- MERGE (upsert) --------------------------------------------------------
# Table = customer; updates bump acctbal for keys % 97 == 0; inserts add
# synthetic keys offset by 10M for keys % 191 == 0. The oracle rebuilds
# the merged table arithmetically from the raw customer fixture.

_MERGE_ORACLE = f"""
WITH merged AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 97 = 0 THEN c_acctbal + 1000.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer
  UNION ALL
  SELECT c_custkey + 10000000, 'SYNTH', 1.0
  FROM customer WHERE c_custkey % 191 = 0
)
SELECT c_mktsegment, COUNT(*) AS n_rows,
       {sql_dsum('c_acctbal', 'sum_acctbal')}
FROM merged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_table_merge", _MERGE_ORACLE)
def q_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(_fresh_root(sf_dir, "merge"))
    cust = _customer_slim(spark, sf_dir)
    t.append(cust.repartitionByRange(8, "c_custkey"), stats_cols=["c_custkey"])

    updates = cust.filter(F.col("c_custkey") % 97 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    inserts = cust.filter(F.col("c_custkey") % 191 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.lit("SYNTH").alias("c_mktsegment"),
        F.lit(1.0).alias("c_acctbal"),
    )
    t.merge(spark, updates.unionByName(inserts), key_cols=["c_custkey"])

    return (
        t.read(spark)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_rows"), dsum("c_acctbal", "sum_acctbal"))
        .orderBy("c_mktsegment")
    )


# -- change feed (CDC) -----------------------------------------------------
# v1 = customers with even keys; v2 appends the odd keys; v3 merges an
# update set. read_changes(since=1) must carry exactly v2's inserts and
# v3's changed rows — copied-over survivors leaking into the feed, or a
# compaction polluting it, breaks the hash.

_CDC_ORACLE = f"""
WITH v2 AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 1
), v3 AS (
  SELECT c_custkey, c_acctbal - 50.0 AS c_acctbal
  FROM customer WHERE c_custkey % 97 = 0
)
SELECT * FROM (
  SELECT CAST(2 AS INTEGER) AS _commit_version, 'insert' AS _change_type,
         COUNT(*) AS n_rows, {sql_dsum('c_acctbal', 'sum_acctbal')}
  FROM v2
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'upsert',
         COUNT(*), CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
  FROM v3
) ORDER BY _commit_version
"""


@query("q_table_cdc", _CDC_ORACLE)
def q_table_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(_fresh_root(sf_dir, "cdc"))
    cust = _customer_slim(spark, sf_dir)
    t.append(cust.filter(F.col("c_custkey") % 2 == 0))  # v1
    t.append(cust.filter(F.col("c_custkey") % 2 == 1))  # v2
    updates = cust.filter(F.col("c_custkey") % 97 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") - 50.0
    )
    t.merge(spark, updates, key_cols=["c_custkey"])  # v3
    t.compact(spark, small_threshold=1 << 30)  # v4: physical only, no feed rows

    return (
        t.read_changes(spark, since_version=1)
        .groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n_rows"), dsum("c_acctbal", "sum_acctbal"))
        .orderBy("_commit_version")
    )


# -- streaming exactly-once sink ------------------------------------------
# events replayed as a file stream -> streaming dedup on event_id ->
# foreachBatch transactional append into a snapshot table -> compact ->
# batch aggregate of the table. The oracle aggregates the raw events
# directly (event_id is unique in the fixture, so the dedup is
# semantically transparent and the whole sink path must be lossless).

_STREAM_SINK_ORACLE = f"""
SELECT event_type, COUNT(*) AS n_events,
       {sql_dsum('value', 'sum_value')}
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q_stream_sink_snapshot", _STREAM_SINK_ORACLE)
def q_stream_sink_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import (
        SnapshotTable,
        stream_to_snapshot_table,
    )
    from mini_etl_project_spark.streaming.ops import events_stream

    root = _fresh_root(sf_dir, "sink")
    t = SnapshotTable.create(os.path.join(root, "tbl"))
    deduped = events_stream(spark, sf_dir).dropDuplicates(["event_id"])
    stream_to_snapshot_table(
        deduped, t, os.path.join(root, "ckpt"), app_id="q_stream_sink"
    )
    t.compact(spark)  # fold micro-batch files; logical no-op

    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .orderBy("event_type")
    )


# -- incremental view maintenance over the change feed ----------------------
# The capability CDC exists FOR: maintain a materialized aggregate from
# deltas without rescanning the table. v1 = full base aggregate; then each
# commit's feed (postimages + upsert PREIMAGES) folds in as
# ``new = old + f(post) − f(pre)``. All sums stay in DECIMAL(28,6) until
# one final cast, so base + delta is EXACTLY the full recompute the oracle
# runs — a wrong feed (missed preimage, leaked copied row, double-counted
# file) breaks the hash. I/O for the fold scales with the delta, not the
# table: that is the 100 TB argument for maintaining views this way.

_DEC28 = "decimal(28,6)"

_INCR_VIEW_ORACLE = """
WITH final AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 83 = 0 THEN c_acctbal + 500.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer
  UNION ALL
  SELECT c_custkey + 20000000, 'SYNTH', 2.0
  FROM customer WHERE c_custkey % 157 = 0
)
SELECT c_mktsegment, COUNT(*) AS n_rows,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_acctbal
FROM final
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_table_incr_view", _INCR_VIEW_ORACLE)
def q_table_incr_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(_fresh_root(sf_dir, "incrview"))
    cust = _customer_slim(spark, sf_dir)
    t.append(cust.repartitionByRange(8, "c_custkey"), stats_cols=["c_custkey"])

    # Materialize the view at v1 — sums stay DECIMAL until the end.
    base = (
        t.read(spark, 1)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("b_n"),
            F.sum(F.col("c_acctbal").cast(_DEC28)).alias("b_sum"),
        )
    )

    # v2: merge (upserts with preimages recorded by the format).
    updates = cust.filter(F.col("c_custkey") % 83 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 500.0
    )
    t.merge(spark, updates, ["c_custkey"])
    # v3: append (pure inserts).
    inserts = (
        cust.filter(F.col("c_custkey") % 157 == 0)
        .select(
            (F.col("c_custkey") + 20000000).alias("c_custkey"),
            F.lit("SYNTH").alias("c_mktsegment"),
            F.lit(2.0).alias("c_acctbal"),
        )
    )
    t.append(inserts)

    # Fold the feed: +post, −pre. Upserts net to 0 rows / Δvalue; inserts
    # net to +1 row / +value.
    feed = t.read_changes(spark, since_version=1, include_preimages=True)
    signed = F.when(
        F.col("_change_type") == "upsert_preimage",
        -F.col("c_acctbal"),
    ).otherwise(F.col("c_acctbal"))
    n_sign = F.when(F.col("_change_type") == "upsert_preimage", -1).otherwise(1)
    deltas = feed.groupBy("c_mktsegment").agg(
        F.sum(n_sign).alias("d_n"),
        F.sum(signed.cast(_DEC28)).alias("d_sum"),
    )

    zero = F.lit(0).cast(_DEC28)
    return (
        base.join(deltas, "c_mktsegment", "full")
        .select(
            "c_mktsegment",
            (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
            .cast("bigint")
            .alias("n_rows"),
            (F.coalesce("b_sum", zero) + F.coalesce("d_sum", zero))
            .cast("double")
            .alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


# -- SCD Type-2 history derivation ------------------------------------------
# The classic warehouse op: turn a mutation stream into a
# slowly-changing-dimension history — one row per (key, attribute-value
# period) with valid_from / valid_to / is_current. Gaps-and-islands over
# the per-key event order: a period starts where the tracked attribute
# differs from its predecessor; valid_to = next period's start (open for
# the current row). Every window is partitioned by the key — per-key
# state only, no global ordering, so the shape holds at any scale.
# Deterministic total order inside a key: (ts, event_id).

_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
periods AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS period_id
  FROM ordered),
collapsed AS (
  SELECT user_id, event_type, CAST(period_id AS BIGINT) AS period_id,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM periods GROUP BY user_id, event_type, period_id),
hist AS (
  SELECT user_id, event_type, period_id, valid_from,
         CAST(n_events AS BIGINT) AS n_events,
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to
  FROM collapsed)
SELECT user_id, event_type, period_id, valid_from, valid_to,
       CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current,
       n_events
FROM hist
"""


@query("q_table_scd2", _SCD2_ORACLE)
def q_table_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    # ts is load-bearing (a mutation with no timestamp has no place in
    # the history): NULL ts sorts at opposite ends of the per-key order
    # on the two engines and shifts every period boundary (r12 ts-NULL
    # audit) — excluded on both.
    e = e.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    periods = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        chg.alias("chg"),
    ).withColumn("period_id", F.sum("chg").over(wcum))
    collapsed = periods.groupBy(
        "user_id", "event_type", F.col("period_id").cast("bigint").alias("period_id")
    ).agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wlead = Window.partitionBy("user_id").orderBy("valid_from")
    return collapsed.select(
        "user_id",
        "event_type",
        "period_id",
        "valid_from",
        F.lead("valid_from").over(wlead).alias("valid_to"),
        F.when(
            F.lead("valid_from").over(wlead).isNull(), 1
        ).otherwise(0).alias("is_current"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


# -- Version diff via time travel ------------------------------------------
#
# "What changed between v1 and v2?" computed from two time-travel reads of
# the same snapshot table (not the change feed — this is the reconstruction
# path for tables whose history predates CDC): one full outer join on the
# key, rows classified added/removed/changed/unchanged. The oracle builds
# both versions declaratively and classifies the same way.

_DIFF_ORACLE = """
WITH v1 AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
v2 AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 97 = 0 THEN c_acctbal + 1000.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + 10000000, 'SYNTH', 1.0
  FROM customer WHERE c_custkey % 191 = 0),
classified AS (
  SELECT COALESCE(v1.c_custkey, v2.c_custkey) AS key,
         CASE WHEN v1.c_custkey IS NULL THEN 'added'
              WHEN v2.c_custkey IS NULL THEN 'removed'
              WHEN v1.c_acctbal <> v2.c_acctbal
                   OR v1.c_mktsegment <> v2.c_mktsegment THEN 'changed'
              ELSE 'unchanged' END AS change_type
  FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey)
SELECT change_type, COUNT(*) AS n,
       CAST(SUM(key) AS BIGINT) AS key_checksum
FROM classified GROUP BY change_type
"""


@query("q_table_diff", _DIFF_ORACLE)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(_fresh_root(sf_dir, "diff"))
    cust = _customer_slim(spark, sf_dir)
    t.append(cust.repartitionByRange(8, "c_custkey"), stats_cols=["c_custkey"])
    v2_frame = (
        cust.filter(F.col("c_custkey") % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 97 == 0, F.col("c_acctbal") + 1000.0
            ).otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 191 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"),
                F.lit("SYNTH").alias("c_mktsegment"),
                F.lit(1.0).alias("c_acctbal"),
            )
        )
    )
    t.overwrite(v2_frame)

    v1 = t.read(spark, version=1)
    v2 = t.read(spark, version=2)
    a = v1.select(*(F.col(c).alias(f"a_{c}") for c in v1.columns))
    b = v2.select(*(F.col(c).alias(f"b_{c}") for c in v2.columns))
    joined = a.join(
        b, a["a_c_custkey"] == b["b_c_custkey"], "full_outer"
    )
    change = (
        F.when(F.col("a_c_custkey").isNull(), "added")
        .when(F.col("b_c_custkey").isNull(), "removed")
        .when(
            (F.col("a_c_acctbal") != F.col("b_c_acctbal"))
            | (F.col("a_c_mktsegment") != F.col("b_c_mktsegment")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce("a_c_custkey", "b_c_custkey").alias("key"),
            change.alias("change_type"),
        )
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("key").cast("bigint").alias("key_checksum"),
        )
    )


# -- X223 row-level DELETE (copy-on-write, file-pruned) --------------------
#
# DELETE FROM table WHERE acctbal < 0, on a snapshot table laid out in
# many small files so the pruning is observable: the commit rewrites
# only files containing a matching row, and the change feed carries the
# deleted rows as 'delete' events. The output joins three proofs the
# oracle rebuilds arithmetically from the raw fixture: per-segment
# survivor counts/sums, the deleted-row count from the CDC feed, and
# the file-pruning ratio is asserted separately in tests.

_DELETE_ORACLE = f"""
WITH survivors AS (
  SELECT * FROM customer WHERE NOT (c_acctbal < 0)),
agg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
         {sql_dsum('c_acctbal', 'sum_acctbal')}
  FROM survivors GROUP BY c_mktsegment),
dels AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_deleted
  FROM customer WHERE c_acctbal < 0)
SELECT a.c_mktsegment, a.n_rows, a.sum_acctbal, d.n_deleted
FROM agg a CROSS JOIN dels d
"""


@query("q_table_delete", _DELETE_ORACLE)
def q_table_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    root = _fresh_root(sf_dir, "delete")
    t = SnapshotTable.create(root)
    base = _customer_slim(spark, sf_dir).repartition(8)
    v0 = t.append(base)
    v1 = t.delete_where(spark, F.col("c_acctbal") < 0)
    dels = (
        t.read_changes(spark, since_version=v0, to_version=v1)
        .filter(F.col("_change_type") == "delete")
        .agg(F.count("*").cast("bigint").alias("n_deleted"))
    )
    agg = (
        t.read(spark)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum("c_acctbal", "sum_acctbal"),
        )
    )
    return agg.crossJoin(F.broadcast(dels))


# -- X239 row-level UPDATE (copy-on-write, both CDC images) ----------------
#
# UPDATE ... SET c_acctbal = c_acctbal + 1000 WHERE c_acctbal < 0 on the
# snapshot table: only files containing a match are rewritten, and the
# change feed carries the mutation as exact update_preimage /
# update_postimage row pairs (Delta CDF's update contract). The output
# fuses three proofs the oracle rebuilds arithmetically from the raw
# fixture: per-segment post-update aggregates, the updated-row count,
# and the pre→post balance delta recovered FROM THE FEED (sum(post) −
# sum(pre) must equal 1000·n_updated — the incremental-maintenance
# identity a downstream consumer would apply).

_UPDATE_ORACLE = f"""
WITH updated AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN c_acctbal + 1000
              ELSE c_acctbal END AS c_acctbal
  FROM customer),
agg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
         {sql_dsum('c_acctbal', 'sum_acctbal')}
  FROM updated GROUP BY c_mktsegment),
feed AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_updated,
         {sql_dsum('c_acctbal + 1000', 'post_sum')},
         {sql_dsum('c_acctbal', 'pre_sum')}
  FROM customer WHERE c_acctbal < 0)
SELECT a.c_mktsegment, a.n_rows, a.sum_acctbal,
       f.n_updated, f.post_sum, f.pre_sum
FROM agg a CROSS JOIN feed f
"""


@query("q_table_update", _UPDATE_ORACLE)
def q_table_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    root = _fresh_root(sf_dir, "update")
    t = SnapshotTable.create(root)
    base = _customer_slim(spark, sf_dir).repartition(8)
    v0 = t.append(base)
    v1 = t.update_where(
        spark,
        F.col("c_acctbal") < 0,
        {"c_acctbal": F.col("c_acctbal") + 1000},
    )
    feed = t.read_changes(
        spark, since_version=v0, to_version=v1, include_preimages=True
    )
    proofs = (
        feed.groupBy()
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "update_postimage", 1)
            ).cast("bigint").alias("n_updated"),
            dsum(
                F.when(
                    F.col("_change_type") == "update_postimage",
                    F.col("c_acctbal"),
                ),
                "post_sum",
            ),
            dsum(
                F.when(
                    F.col("_change_type") == "update_preimage",
                    F.col("c_acctbal"),
                ),
                "pre_sum",
            ),
        )
    )
    agg = (
        t.read(spark)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            dsum("c_acctbal", "sum_acctbal"),
        )
    )
    return agg.crossJoin(F.broadcast(proofs))


# -- X252 UPDATE-aware incremental view maintenance ------------------------
#
# The IVM identity extended to row-level UPDATE commits: fold the change
# feed as +postimage − preimage, where a copy-on-write UPDATE contributes
# matched rows under BOTH images (update_preimage / update_postimage).
# The maintained per-segment (count, balance-sum) view after
# append → update → delete must equal a from-scratch rebuild — the oracle
# recomputes the final state arithmetically from the raw fixture. Sums
# stay DECIMAL end-to-end (order-independent), counts fold as ±1.

_IVM_UPDATE_ORACLE = f"""
WITH final AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN c_acctbal + 1000
              ELSE c_acctbal END AS bal
  FROM customer
  WHERE NOT (c_custkey % 131 = 0)),
agg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
         {sql_dsum('bal', 'sum_bal')}
  FROM final GROUP BY c_mktsegment)
SELECT * FROM agg
"""


@query("q_table_ivm_update", _IVM_UPDATE_ORACLE)
def q_table_ivm_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(_fresh_root(sf_dir, "ivmupd"))
    cust = _customer_slim(spark, sf_dir)
    v1 = t.append(cust.repartition(8))
    # Materialized view at v1.
    base = (
        t.read(spark, v1)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("b_n"),
            F.sum(F.col("c_acctbal").cast(_DEC28)).alias("b_sum"),
        )
    )
    # v2: row-level UPDATE; v3: row-level DELETE.
    t.update_where(
        spark, F.col("c_acctbal") < 0, {"c_acctbal": F.col("c_acctbal") + 1000}
    )
    t.delete_where(spark, F.col("c_custkey") % 131 == 0)
    feed = t.read_changes(spark, since_version=v1, include_preimages=True)
    sign = F.when(
        F.col("_change_type").isin("insert", "upsert", "update_postimage"),
        F.lit(1),
    ).when(
        F.col("_change_type").isin(
            "delete", "upsert_preimage", "update_preimage"
        ),
        F.lit(-1),
    )
    delta = feed.groupBy("c_mktsegment").agg(
        F.sum(sign).cast("bigint").alias("d_n"),
        F.sum(sign * F.col("c_acctbal").cast(_DEC28)).alias("d_sum"),
    )
    merged = (
        base.join(delta, "c_mktsegment", "full")
        .select(
            "c_mktsegment",
            (
                F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))
            ).cast("bigint").alias("n_rows"),
            (
                F.coalesce(F.col("b_sum"), F.lit(0).cast(_DEC28))
                + F.coalesce(F.col("d_sum"), F.lit(0).cast(_DEC28))
            ).cast("double").alias("sum_bal"),
        )
        .filter(F.col("n_rows") > 0)
    )
    return merged


# -- X464 time travel -------------------------------------------------------
# Three commits (evens, +odds, merge-update), then reads PINNED to v1,
# v2, and latest. The oracle recomputes each version's aggregate from
# the raw fixture with the same commit rules — a manifest that loses a
# file, or a read that sees across its version boundary, breaks the hash.

_TT_ORACLE = f"""
WITH v1 AS (
  SELECT c_acctbal FROM customer WHERE c_custkey % 2 = 0),
v2 AS (
  SELECT c_acctbal FROM customer),
v3 AS (
  SELECT CASE WHEN c_custkey % 97 = 0 THEN c_acctbal + 500.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer)
SELECT * FROM (
  SELECT CAST(1 AS INTEGER) AS version, COUNT(*) AS n_rows,
         {sql_dsum('c_acctbal', 'sum_acctbal')} FROM v1
  UNION ALL
  SELECT CAST(2 AS INTEGER), COUNT(*),
         CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) FROM v2
  UNION ALL
  SELECT CAST(3 AS INTEGER), COUNT(*),
         CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) FROM v3
) ORDER BY version
"""


@query("q_table_time_travel", _TT_ORACLE)
def q_table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(_fresh_root(sf_dir, "tt"))
    cust = _customer_slim(spark, sf_dir)
    t.append(cust.filter(F.col("c_custkey") % 2 == 0))  # v1
    t.append(cust.filter(F.col("c_custkey") % 2 == 1))  # v2
    updates = cust.filter(F.col("c_custkey") % 97 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 500.0
    )
    t.merge(spark, updates, key_cols=["c_custkey"])  # v3

    def agg(df: DataFrame, v: int) -> DataFrame:
        return df.agg(
            F.lit(v).cast("int").alias("version"),
            F.count("*").alias("n_rows"),
            dsum("c_acctbal", "sum_acctbal"),
        ).select("version", "n_rows", "sum_acctbal")

    return (
        agg(t.read(spark, version=1), 1)
        .unionByName(agg(t.read(spark, version=2), 2))
        .unionByName(agg(t.read(spark), 3))
        .orderBy("version")
    )


# -- X465 compaction identity ------------------------------------------------
# Trickle-append 3×8 small files, OPTIMIZE, and prove the rewrite is
# PHYSICAL ONLY: row count and exact sum unchanged (flag computed
# in-plan from pre/post reads), file count strictly reduced. The oracle
# asserts the invariant flags as literal 1s next to the fixture-derived
# exact aggregate — the bound-flag pattern (X39/X103).

_COMPACT_ORACLE = f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum('c_acctbal', 'sum_acctbal')},
       1 AS fewer_files,
       1 AS data_identical
FROM customer
"""


@query("q_table_compaction", _COMPACT_ORACLE)
def q_table_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(_fresh_root(sf_dir, "compact"))
    cust = _customer_slim(spark, sf_dir)
    for m in range(3):  # trickle appends -> 24 small files
        t.append(cust.filter(F.col("c_custkey") % 3 == m).repartition(8))
    files_before = len(t._read_manifest(t.latest_version())["files"])
    pre = t.read(spark).agg(
        F.count("*").alias("n_pre"), dsum("c_acctbal", "s_pre")
    )
    t.compact(spark, small_threshold=1 << 30)
    files_after = len(t._read_manifest(t.latest_version())["files"])
    post = t.read(spark).agg(
        F.count("*").alias("n_rows"), dsum("c_acctbal", "sum_acctbal")
    )
    return post.crossJoin(F.broadcast(pre)).select(
        "n_rows",
        "sum_acctbal",
        F.lit(1 if files_after < files_before else 0)
        .cast("int")
        .alias("fewer_files"),
        (
            (F.col("n_rows") == F.col("n_pre"))
            & (F.col("sum_acctbal") == F.col("s_pre"))
        )
        .cast("int")
        .alias("data_identical"),
    )


# -- X466 vacuum retention -----------------------------------------------------
# Three overwrites; the FIRST version is tagged. vacuum(keep_last=1)
# must reclaim the untagged middle version's files (≥1 deleted) while
# the tagged v1 stays time-travelable PAST its retention age (tag
# targets are vacuum-exempt) — the Delta-retention trade-off with the
# tag escape hatch, both directions exercised. The tagged read's row
# count is emitted as an in-plan equality flag against the latest read
# (v1 = evens, v3 = odds of an odd-keyed domain ⇒ counts differ by the
# key-parity split; the flag compares v1's count to its own re-read).

_VACUUM_ORACLE = f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum('c_acctbal', 'sum_acctbal')},
       CAST((SELECT COUNT(*) FROM customer WHERE c_custkey % 2 = 0)
            AS BIGINT) AS tagged_rows,
       1 AS reclaimed_some
FROM customer WHERE c_custkey % 2 = 1
"""


@query("q_table_vacuum", _VACUUM_ORACLE)
def q_table_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(_fresh_root(sf_dir, "vacuum"))
    cust = _customer_slim(spark, sf_dir)
    t.overwrite(cust.filter(F.col("c_custkey") % 2 == 0))  # v1: evens
    t.tag("release", 1)
    t.overwrite(cust)  # v2: all (untagged — vacuum bait)
    t.overwrite(cust.filter(F.col("c_custkey") % 2 == 1))  # v3: odds
    deleted = t.vacuum(keep_last=1)
    # v1 outlived retention ONLY because of the tag; v2 was reclaimed
    tag_rows = t.read_tag(spark, "release").count()
    latest = t.read(spark).agg(
        F.count("*").alias("n_rows"), dsum("c_acctbal", "sum_acctbal")
    )
    return latest.select(
        "n_rows",
        "sum_acctbal",
        F.lit(tag_rows).cast("bigint").alias("tagged_rows"),
        F.lit(1 if deleted else 0).cast("int").alias("reclaimed_some"),
    )


# -- X467 restore + shallow clone ---------------------------------------------
# The rollback/branching pair: RESTORE pins the table back to v1 as a
# NEW commit (history preserved), while a shallow CLONE made at v2
# keeps reading v2 — proving the clone is isolated from the source's
# restore. Both aggregates recompute from the fixture.

_RESTORE_ORACLE = f"""
SELECT * FROM (
  SELECT 'restored_v1' AS branch, COUNT(*) AS n_rows,
         {sql_dsum('c_acctbal', 'sum_acctbal')}
  FROM customer WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT 'clone_v2', COUNT(*),
         CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
  FROM customer
) ORDER BY branch
"""


@query("q_table_restore_clone", _RESTORE_ORACLE)
def q_table_restore_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    root = _fresh_root(sf_dir, "restore")
    shutil.rmtree(root + "_clone", ignore_errors=True)  # idempotent reruns
    t = SnapshotTable.create(root)
    cust = _customer_slim(spark, sf_dir)
    t.append(cust.filter(F.col("c_custkey") % 2 == 0))  # v1: evens
    t.append(cust.filter(F.col("c_custkey") % 2 == 1))  # v2: all
    clone = t.clone_shallow(root + "_clone")
    t.restore(1)  # v3 pins v1's content

    def agg(df: DataFrame, branch: str) -> DataFrame:
        return df.agg(
            F.lit(branch).alias("branch"),
            F.count("*").alias("n_rows"),
            dsum("c_acctbal", "sum_acctbal"),
        ).select("branch", "n_rows", "sum_acctbal")

    return (
        agg(t.read(spark), "restored_v1")
        .unionByName(agg(clone.read(spark), "clone_v2"))
        .orderBy("branch")
    )


# =============================================================================
# Round-9 source-format lane (X510-X511): ORC and line-text round trips.
# Spark ships native readers/writers for both; DuckDB reads neither, so
# the oracle checks ROUND-TRIP INVARIANCE — the aggregate of the
# written-then-reread data must equal the same aggregate computed from
# the original parquet. A lossy writer, a schema-mangling reader, or a
# non-deterministic serialization all become red rows.
# =============================================================================


_ORC_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id
FROM events GROUP BY 1
"""


@query("q_source_orc_roundtrip", _ORC_ORACLE)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X510: events -> ORC (zlib, Spark-native) -> re-read -> exact
    aggregate. ORC is the one columnar format the engine supports
    natively besides parquet; the reread frame must carry identical
    values AND types (the cents rounding would drift on any
    float-precision loss)."""
    root = _fresh_root(sf_dir, "orc")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    ev.write.mode("overwrite").orc(root)
    back = spark.read.orc(root)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
        F.min("event_id").cast("bigint").alias("min_id"),
        F.max("event_id").cast("bigint").alias("max_id"),
    )


_TEXT_ORACLE = """
WITH lines AS (
  SELECT CAST(doc_id AS VARCHAR) || CHR(9) || text AS line
  FROM documents WHERE text IS NOT NULL),
parsed AS (
  SELECT CAST(string_split(line, CHR(9))[1] AS BIGINT) AS doc_id,
         string_split(line, CHR(9))[2] AS text
  FROM lines)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       md5(string_agg(md5(text), '' ORDER BY doc_id)) AS corpus_fp
FROM parsed
"""


@query("q_source_text_roundtrip", _TEXT_ORACLE)
def q_source_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X511: documents -> line-delimited text files (one TSV-framed doc
    per line, the classic corpus interchange shape) -> spark.read.text
    -> parse -> order-pinned corpus fingerprint. The md5-chain oracle
    catches any line loss, reordering-with-loss, or delimiter mangling.
    (The documents fixture is single-line text — the framing contract
    this lane assumes and asserts.)"""
    root = _fresh_root(sf_dir, "text")
    # a NULL body cannot be framed as a TSV line (concat_ws silently
    # drops the field, breaking the 2-part parse under ANSI; the
    # oracle's || nullifies the whole line) — bodyless docs are not
    # serialized, on both engines (r12 NULL audit)
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    d.select(
        F.concat_ws(
            "\t", F.col("doc_id").cast("string"), F.col("text")
        ).alias("value")
    ).write.mode("overwrite").text(root)
    back = spark.read.text(root)
    parsed = back.select(
        F.split(F.col("value"), "\t", 2).alias("parts")
    ).select(
        F.element_at("parts", 1).cast("bigint").alias("doc_id"),
        F.element_at("parts", 2).alias("text"),
    )
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("doc_id", F.md5("text").alias("h"))
                        )
                    ),
                    lambda s: s["h"],
                ),
            )
        ).alias("corpus_fp"),
    )
