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
