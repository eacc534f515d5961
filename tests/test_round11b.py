"""Round-11: the snapshot-table leg of the X517 ingestion composition.

VERDICT r10 ask #4's second half: replay two batches through the
snapshot table and assert exactly-once. The disposition pipeline itself
is oracle-checked (q_corpus_incremental_ingest); these tests pin the
part an oracle can't see — that a RETRIED batch append (foreachBatch
recovery, the thing that actually happens on a 1000-executor cluster)
commits nothing, and that the CDC feed records each batch exactly once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.queries import QUERIES
from mini_etl_project_spark.session import load_table
from mini_etl_project_spark.sources.snapshots import SnapshotTable

SF = "/root/testdata/sf0.001"
APP = "ingest-pipeline"


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    """Seed a snapshot with the X517 corpus, then ingest two batches with
    a replay between them."""
    root = str(tmp_path_factory.mktemp("snap") / "corpus")
    table = SnapshotTable.create(root)

    docs = load_table(spark, SF, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    corpus = docs.filter((F.col("id") < 300) & (F.col("id") % 3 != 0))
    v_seed = table.append(corpus)

    # batch 1 = the X517 pipeline's admitted docs (the composition's
    # real output feeding the snapshot), exactly-once via append_txn
    disp = QUERIES["q_corpus_incremental_ingest"](spark, SF)
    admitted_ids = disp.filter(F.col("disposition") == "admitted").select(
        F.col("doc_id").alias("id")
    )
    batch1 = docs.join(admitted_ids, "id")  # admitted ids are originals
    n_b1 = batch1.count()
    v1 = table.append_txn(batch1, APP, batch_id=1)

    # the REPLAY: foreachBatch retry delivers the same batch id again
    v_replay = table.append_txn(batch1, APP, batch_id=1)

    # batch 2 = a later crawl slice, new batch id
    batch2 = docs.filter((F.col("id") >= 300) & (F.col("id") < 350))
    n_b2 = batch2.count()
    v2 = table.append_txn(batch2, APP, batch_id=2)

    return {
        "table": table,
        "n_corpus": corpus.count(),
        "n_b1": n_b1,
        "n_b2": n_b2,
        "v_seed": v_seed,
        "v1": v1,
        "v_replay": v_replay,
        "v2": v2,
    }


def test_ingest_exactly_once_two_batches(spark, ingested):
    t = ingested["table"]
    # the replay committed NOTHING: no version, no rows
    assert ingested["v_replay"] is None
    assert ingested["v1"] is not None and ingested["v2"] is not None
    assert t.latest_version() == ingested["v2"]
    assert t.last_txn(APP) == 2
    expected = ingested["n_corpus"] + ingested["n_b1"] + ingested["n_b2"]
    assert t.read(spark).count() == expected
    # and no id appears twice (the pipeline admitted only non-dups;
    # exactly-once kept the retry from double-writing them)
    dupes = (
        t.read(spark).groupBy("id").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0


def test_ingest_cdc_records_each_batch_once(spark, ingested):
    t = ingested["table"]
    feed = t.read_changes(spark, since_version=ingested["v_seed"])
    by_commit = {
        r["_commit_version"]: r["n"]
        for r in feed.groupBy("_commit_version")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # exactly two insert commits after the seed — one per batch, none
    # for the replay
    assert by_commit == {
        ingested["v1"]: ingested["n_b1"],
        ingested["v2"]: ingested["n_b2"],
    }
    assert set(
        r["_change_type"] for r in feed.select("_change_type").distinct().collect()
    ) == {"insert"}


def test_ingest_admits_no_planted_duplicates(spark):
    """Composition sanity on the disposition surface: every planted id
    (>= 50000) is caught by SOME dedup stage — none reaches admitted —
    and every disposition category is populated at this SF."""
    disp = QUERIES["q_corpus_incremental_ingest"](spark, SF)
    planted_admitted = disp.filter(
        (F.col("doc_id") >= 50000) & (F.col("disposition") == "admitted")
    ).count()
    assert planted_admitted == 0
    cats = {
        r["disposition"]
        for r in disp.select("disposition").distinct().collect()
    }
    assert cats == {
        "rejected_quality",
        "dup_exact_batch",
        "dup_exact_corpus",
        "dup_near_corpus",
        "dup_semantic_corpus",
        "admitted",
    }
