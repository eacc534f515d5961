"""Invariant tests for round-5 session-6 batch I: VAD burst structure,
patch grid accounting vs numpy, and span-corruption length laws."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def test_vad_burst_structure(spark):
    from mini_etl_project_spark.queries.streaming_q import (
        q_multimodal_audio_vad,
    )

    rows = q_multimodal_audio_vad(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        doc_id = r["doc_id"]
        n_samples = 1024 + (doc_id % 4) * 256
        assert r["n_frames"] == n_samples // 64
        # Loud blocks are every 3rd 128-sample block → 2 frames each,
        # never adjacent, so active frames pair up 2-per-segment.
        n_blocks = n_samples // 128
        expect_blocks = sum(
            1 for b in range(n_blocks) if (b + doc_id) % 3 == 0
        )
        assert r["n_segments"] == expect_blocks
        assert r["n_active"] == 2 * expect_blocks
        assert r["active_ppm"] == (1_000_000 * r["n_active"]) // r["n_frames"]


def test_patchify_grid_vs_numpy(spark):
    from mini_etl_project_spark.queries.streaming_q import (
        q_multimodal_patchify,
    )

    rows = q_multimodal_patchify(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[(r["py"], r["px"])] = r
    # Exact patch-count accounting per doc.
    for doc_id, patches in by_doc.items():
        h = 32 + (doc_id % 3) * 16
        w = 32 + (doc_id % 5) * 16
        assert len(patches) == (h // 16) * (w // 16)
    # Independent numpy recompute on a handful of docs.
    for doc_id in (0, 7, 59, 123, 199):
        h = 32 + (doc_id % 3) * 16
        w = 32 + (doc_id % 5) * 16
        y, x = np.mgrid[0:h, 0:w]
        img = ((doc_id + y * 31 + x * 17) % 256).astype(np.int64)
        for (py, px), r in by_doc[doc_id].items():
            block = img[py * 16 : py * 16 + 16, px * 16 : px * 16 + 16]
            assert r["p_sum"] == int(block.sum())
            assert r["p_min"] == int(block.min())
            assert r["p_max"] == int(block.max())


def test_span_corruption_length_laws(spark):
    from mini_etl_project_spark.queries.llm_q import (
        _SPAN_HASH,
        _SPAN_PCT,
        q_corpus_span_corruption,
    )

    rows = q_corpus_span_corruption(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        n = r["n_tokens"]
        flags = [(i * _SPAN_HASH) % 100 < _SPAN_PCT for i in range(n)]
        n_masked = sum(flags)
        n_spans = sum(
            1
            for i, f in enumerate(flags)
            if f and (i == 0 or not flags[i - 1])
        )
        assert r["n_masked"] == n_masked
        assert r["n_spans"] == n_spans
        # Sequence-length conservation: every token lands exactly once,
        # plus one sentinel on each side per span.
        assert r["input_len"] + r["target_len"] == n + 2 * n_spans
        assert 0 <= r["n_spans"] <= r["n_masked"] <= n
