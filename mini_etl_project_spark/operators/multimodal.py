"""Multimodal column support (X5): opaque binary payloads + typed metadata
+ Arrow-batched feature extraction.

The container has no image/audio codecs, so ``decode_image`` is an
explicit stub (NotImplementedError) — but everything Spark-side is real
and tested: BinaryType columns, struct metadata, ``mapInPandas`` batch
iteration with a declared output schema, deterministic byte-level feature
extraction whose results are oracle-checkable against SQL byte functions.

At 100 TB: payloads stay columnar in parquet; feature extraction is an
Arrow-batched map (no shuffle); metadata predicates (mime, n_bytes) prune
at the scan before any Python runs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, head_hex string, tail_byte int"


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize a multimodal-shaped frame from a text column: binary
    payload (utf-8 bytes) + struct metadata. Stand-in for real media
    ingestion via ``spark.read.format("binaryFile")``."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def extract_byte_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real UDF plumbing (batch iterator in, declared
    schema out), with deterministic features so tests can oracle them.
    """

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = pdf["payload"].map(len)
            out["head_hex"] = pdf["payload"].map(lambda b: bytes(b[:8]).hex())
            out["tail_byte"] = pdf["payload"].map(
                lambda b: int(b[-1]) if len(b) else -1
            )
            yield out

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """STUB — image decoding needs codecs not present in this container.

    The Spark-side contract (binary in, fixed-schema features out through
    ``mapInPandas``) is identical to :func:`extract_byte_features`; swap
    the body for PIL/torchvision when the runtime has them.
    """
    raise NotImplementedError(
        "image decode requires codec libraries not available in this "
        "environment; see extract_byte_features for the live plumbing"
    )


RESIZE_SCHEMA = "doc_id bigint, thumb binary, out_w int, out_h int"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"
AUDIO_SCHEMA = "doc_id bigint, window_idx int, mean_amp double, peak_amp int"


def resize_bytes(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize plumbing (binary→binary through Arrow), codec-free: the
    payload is treated as a row-major byte grid and downsampled by strided
    sampling to ``out_w × out_h`` bytes. With a real decoder this body
    becomes decode→PIL.resize→encode; the Spark contract (batch iterator
    of binary in, fixed-schema binary out, no shuffle) is THIS, unchanged.
    """

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = pdf[["doc_id"]].copy()
            thumbs = []
            for b in pdf["payload"]:
                raw = bytes(b)
                n = max(len(raw), 1)
                # strided sample: out_h*out_w evenly spaced source bytes
                idx = [
                    min((i * n) // (out_w * out_h), n - 1)
                    for i in range(out_w * out_h)
                ]
                thumbs.append(bytes(raw[i] for i in idx) if raw else b"")
            out["thumb"] = thumbs
            out["out_w"] = out_w
            out["out_h"] = out_h
            yield out

    return df.select("doc_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, frame_bytes: int = 64, every_k: int = 4) -> DataFrame:
    """Frame-sampling plumbing: the payload is chunked into fixed-size
    "frames" and every ``k``-th frame is emitted as its own ROW — the 1→N
    Arrow explode a real video sampler needs (one input row fans out to
    many output rows inside ``mapInPandas``; no UDTF, no shuffle)."""
    import pandas as pd

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                n_frames = len(raw) // frame_bytes
                for fi in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


def audio_window_features(df: DataFrame, window: int = 256) -> DataFrame:
    """Audio-feature plumbing: payload bytes as unsigned 8-bit samples,
    windowed mean/peak via vectorized numpy over Arrow batches — the same
    shape as a real spectral/RMS extractor (decode stays a stub; the
    numeric batch path is live and deterministic)."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            ids, widx, means, peaks = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(b), dtype=np.uint8)
                n_win = len(samples) // window
                for w in range(n_win):
                    seg = samples[w * window : (w + 1) * window]
                    ids.append(doc_id)
                    widx.append(w)
                    means.append(float(seg.mean()))
                    peaks.append(int(seg.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": widx,
                    "mean_amp": means,
                    "peak_amp": peaks,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, AUDIO_SCHEMA)
