"""Extension-operator tests that go beyond the SQL oracle: ANN recall vs
the exact top-k, near-dup clustering, streaming dedup/state, multimodal
stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.operators.dedup import connected_components
from mini_etl_project_spark.operators.multimodal import decode_image
from mini_etl_project_spark.operators.similarity import RandomHyperplaneLSH, topk_exact
from mini_etl_project_spark.session import load_table


def test_ann_recall_vs_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    exact = topk_exact(e, queries, k=5)
    ann = RandomHyperplaneLSH(dim=64, bits=3, tables=8).topk(e, queries, k=5)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in ann.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"ANN recall {recall} too low"


def test_ann_is_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    lsh = RandomHyperplaneLSH(dim=64, bits=3, tables=2)
    a = sorted(map(tuple, lsh.topk(e, q, k=3).collect()))
    b = sorted(map(tuple, lsh.topk(e, q, k=3).collect()))
    assert a == b


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "id_a bigint, id_b bigint",
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_stream_dedup_and_stateful(spark, sf_dir):
    from mini_etl_project_spark.streaming.ops import (
        drain_to_table,
        events_stream,
        stateful_running_max,
        stream_dedup,
    )

    s = events_stream(spark, sf_dir)
    dedup_tbl = drain_to_table(stream_dedup(s), mode="append")
    n_dedup = spark.table(dedup_tbl).count()
    e = load_table(spark, sf_dir, "events")
    n_keys = e.select("user_id", "event_type").distinct().count()
    assert n_dedup == n_keys  # fixture fits inside one watermark window

    state_tbl = drain_to_table(stateful_running_max(s), mode="update")
    out = spark.table(state_tbl)
    got = {r.user_id: (r.n_seen, r.max_value) for r in out.collect()}
    exp = {
        r.user_id: (r.n, r.mx)
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    # update-mode emits one row per user per batch; the LAST state must
    # match the batch aggregate
    for uid, (n, mx) in exp.items():
        assert got[uid] == (n, mx)


def test_approx_agg_error_bounds(spark, sf_dir):
    """q_agg_approx now emits oracle-checkable bound flags (the sketch
    estimates run in-plan; the raw values are additionally re-bounded
    here against independently-computed exact answers)."""
    from mini_etl_project_spark.queries import QUERIES
    from pyspark.sql import functions as F

    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["n"], r["m"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("m"),
        )
        .collect()
    }
    approx = QUERIES["q_agg_approx"](spark, sf_dir).collect()
    assert len(approx) == len(exact)
    for r in approx:
        n_exact, _ = exact[r["l_returnflag"]]
        assert r["exact_parts"] == n_exact
        assert r["parts_within_3rsd"] == 1
        assert r["median_within_p45_p55"] == 1
    # the raw sketch values, re-derived here, still obey the HLL++ rsd
    raw = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.percentile_approx("l_extendedprice", 0.5).alias("am"),
    )
    for r in raw.collect():
        n_exact, med_exact = exact[r["l_returnflag"]]
        assert abs(r["ap"] - n_exact) / n_exact < 0.15
        assert abs(r["am"] - med_exact) / med_exact < 0.05


def test_ml_minhash_agrees_with_portable_pipeline(spark, sf_dir):
    """spark.ml MinHashLSH candidates vs the portable md5 pipeline on the
    planted corpus: the high-similarity planted pairs must be found by
    both (hash families differ, exact candidate sets need not)."""
    from mini_etl_project_spark.operators.dedup import ml_minhash_lsh_pairs
    from mini_etl_project_spark.queries.dedup_q import _planted_corpus

    corpus = _planted_corpus(spark, sf_dir)
    ml_pairs = {
        (r.id_a, r.id_b)
        for r in ml_minhash_lsh_pairs(
            corpus, "id", "text", jaccard_distance_threshold=0.5
        ).collect()
    }
    from mini_etl_project_spark.queries import QUERIES

    portable = {
        (r.id_a, r.id_b)
        for r in QUERIES["q_dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    overlap = len(ml_pairs & portable) / max(len(portable), 1)
    assert overlap >= 0.8, (len(ml_pairs), len(portable), overlap)


def test_ivf_recall_vs_exact(spark, sf_dir):
    from mini_etl_project_spark.operators.similarity import IVFIndex

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id) for r in topk_exact(e, queries, k=5).collect()
    }
    ivf = IVFIndex(n_cells=8, nprobe=3).fit(e)
    got = {(r.query_id, r.neighbor_id) for r in ivf.topk(e, queries, k=5).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.6, recall


def test_multimodal_stub_contract(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        decode_image(load_table(spark, sf_dir, "documents"))


def test_watermark_drops_late_data(spark, sf_dir, tmp_path):
    """Q30: with a 10-minute watermark, events arriving whole days late
    (second micro-batch) must be dropped by streaming dedup. Two files,
    maxFilesPerTrigger=1 → recent batch advances the watermark, late
    batch falls entirely below it."""
    import time

    from mini_etl_project_spark.session import load_table

    e = load_table(spark, sf_dir, "events").select("ts", "user_id", "event_type")
    recent = e.filter(F.col("ts") >= "2024-01-15")
    late = e.filter(F.col("ts") < "2024-01-10")
    stage = tmp_path / "stream_in"
    recent.coalesce(1).write.parquet(str(stage / "batch_a"))
    time.sleep(1.1)  # file mod-time ordering decides batch order
    late.coalesce(1).write.parquet(str(stage / "batch_b"))

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint, event_type string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(stage) + "/*")
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    import uuid

    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name).count()
    expected = recent.select("user_id", "event_type").distinct().count()
    late_keys = late.select("user_id", "event_type").distinct().count()
    assert late_keys > 0  # the late batch would add keys if not dropped
    assert got == expected, (got, expected)


def test_binary_file_ingestion(spark, tmp_path):
    """X5 ingestion path: spark.read.format('binaryFile') yields (path,
    modificationTime, length, content) rows with the raw bytes."""
    payload = b"\x89PNG fake-bytes \x00\x01\x02"
    f = tmp_path / "img.bin"
    f.write_bytes(payload)
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 1
    assert rows[0]["length"] == len(payload)
    assert bytes(rows[0]["content"]) == payload


def test_streaming_foreach_batch_sink(spark, sf_dir, tmp_path):
    """Q29 sink side: foreachBatch gives exactly-once-style custom sinks;
    drain the events stream into parquet via batch writes."""
    from mini_etl_project_spark.streaming.ops import events_stream, tumbling_agg

    out = str(tmp_path / "agg_parquet")
    agg = tumbling_agg(events_stream(spark, sf_dir))

    def write_batch(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    e = load_table(spark, sf_dir, "events")
    assert back.count() == (
        e.selectExpr("date_trunc('hour', ts) AS h", "event_type").distinct().count()
    )


def test_connected_components_chain_log_depth(spark):
    """Path compression: a 64-node chain (diameter 63) must collapse to
    one component within 10 rounds — pure propagation would need 63."""
    from mini_etl_project_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a bigint, id_b bigint"
    )
    rows = connected_components(pairs, max_iter=10).collect()
    assert len(rows) == 64
    assert {r["component"] for r in rows} == {0}


def test_jaccard_candidates_path_equals_allpairs(spark, sf_dir):
    """The candidate-restricted Jaccard path (scale path: expand candidate
    pairs by shingles, never join on raw shingle) must agree exactly with
    the all-pairs path filtered to the same candidates."""
    from pyspark.sql import functions as F

    from mini_etl_project_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_rows,
    )
    from mini_etl_project_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    corpus = d.select(F.col("doc_id").alias("id"), "text").unionByName(
        d.select((F.col("doc_id") + 5000).alias("id"),
                 F.substring("text", 15, 1 << 30).alias("text"))
    )
    sh = shingle_rows(corpus, "id", "text", k=5)
    cand = lsh_candidate_pairs(minhash_signatures(sh, 16), 4)

    fast = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["jaccard"])
        for r in jaccard_pairs(sh, candidates=cand, threshold=0.3).collect()
    }
    slow_all = jaccard_pairs(sh, candidates=None, threshold=0.3)
    slow = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["jaccard"])
        for r in slow_all.join(cand, ["id_a", "id_b"], "left_semi").collect()
    }
    assert fast == slow and fast


def test_pq_recall_and_compression(spark, sf_dir):
    """PQIndex: ADC over PQ codes with exact rerank recovers the exact
    top-k (two-stage search); codes are the compressed representation
    (m small ints per vector, each < k_codes)."""
    from mini_etl_project_spark.operators.similarity import PQIndex, topk_exact

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    pq = PQIndex(m=16, k_codes=64).fit(e)

    enc = pq.encode(e).select("vec_id", "codes").collect()
    assert all(len(r.codes) == 16 for r in enc)
    assert all(0 <= c < pq.k_codes for r in enc for c in r.codes)

    # Exact-L2 truth == exact-cosine truth would not hold in general, so
    # build L2 truth with the same rerank machinery at rerank >= corpus.
    n = e.count()
    truth = {
        (r.query_id, r.neighbor_id)
        for r in pq.topk(e, queries, k=5, rerank=n).collect()
    }
    two_stage = {
        (r.query_id, r.neighbor_id)
        for r in pq.topk(e, queries, k=5, rerank=25).collect()
    }
    raw_adc = {
        (r.query_id, r.neighbor_id)
        for r in pq.topk(e, queries, k=5).collect()
    }
    assert len(truth & two_stage) / len(truth) >= 0.85
    assert len(truth & raw_adc) / len(truth) >= 0.25  # pre-rerank floor

    # Deterministic: seeded training + stable tie-breaks.
    again = {
        (r.query_id, r.neighbor_id)
        for r in PQIndex(m=16, k_codes=64).fit(e).topk(e, queries, k=5, rerank=25).collect()
    }
    assert again == two_stage


def test_multimodal_resize_frames_audio(spark, sf_dir):
    """X5 plumbing beyond byte features: strided resize (binary→binary),
    1→N frame sampling (Arrow explode inside mapInPandas), and windowed
    audio features — all deterministic on byte payloads, all checked
    against driver-side recomputation on the same bytes."""
    from mini_etl_project_spark.operators.multimodal import (
        attach_binary,
        audio_window_features,
        resize_bytes,
        sample_frames,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    mm = attach_binary(d, "doc_id", "text")
    raw = {r["doc_id"]: bytes(r["payload"]) for r in mm.collect()}

    thumbs = {r["doc_id"]: r for r in resize_bytes(mm, 4, 4).collect()}
    assert set(thumbs) == set(raw)
    for doc_id, r in thumbs.items():
        assert len(bytes(r["thumb"])) == 16 and (r["out_w"], r["out_h"]) == (4, 4)
        n = len(raw[doc_id])
        expect = bytes(raw[doc_id][min(i * n // 16, n - 1)] for i in range(16))
        assert bytes(r["thumb"]) == expect

    frames = sample_frames(mm, frame_bytes=16, every_k=2).collect()
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        want_idx = list(range(0, len(raw[doc_id]) // 16, 2))
        assert sorted(r["frame_idx"] for r in rows) == want_idx
        for r in rows:
            fi = r["frame_idx"]
            assert bytes(r["frame"]) == raw[doc_id][fi * 16 : (fi + 1) * 16]

    aud = audio_window_features(mm, window=32).collect()
    assert aud, "no audio windows emitted"
    for r in aud[:50]:
        seg = raw[r["doc_id"]][r["window_idx"] * 32 : (r["window_idx"] + 1) * 32]
        assert r["peak_amp"] == max(seg)
        assert abs(r["mean_amp"] - sum(seg) / len(seg)) < 1e-9
