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

from pyspark.sql import Column, DataFrame
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


# -- Real header parsing (X5 upgrade): PNG IHDR / JPEG SOF / WAV fmt -------
# Codec-free but REAL work: media container headers are plain byte layouts,
# so dimensions and sample rates come out of pure JVM expressions (binary
# substring → hex → conv) — no Python in the hot path, fully codegen'd,
# and byte-slice-expressible in SQL for the DuckDB oracle.


def _be(payload, pos, nbytes):
    """Unsigned big-endian integer from ``nbytes`` at 1-based byte ``pos``
    (int or Column). Out-of-range slices hex to '' → conv yields NULL."""
    pos = pos if isinstance(pos, Column) else F.lit(pos)
    return F.conv(F.hex(F.substring(payload, pos, F.lit(nbytes))), 16, 10).cast(
        "bigint"
    )


def _le(payload, pos, nbytes):
    """Unsigned little-endian integer: per-byte extraction, summed shifted."""
    out = F.lit(0).cast("bigint")
    for i in range(nbytes):
        out = out + _be(payload, pos + i, 1) * (256**i)
    return out


def _is_sof(marker: Column) -> Column:
    """SOF0-SOF15 marker test, excluding the DHT/JPG/DAC pseudo-markers
    (FFC4/FFC8/FFCC) that share the SOF numeric range."""
    return (
        (marker >= 0xFFC0)
        & (marker <= 0xFFCF)
        & ~marker.isin(0xFFC4, 0xFFC8, 0xFFCC)
    )


def _with_jpeg_sof_offset(df: DataFrame, out_col: str, max_segments: int = 4) -> DataFrame:
    """Add ``out_col``: the 1-based offset of the first SOF marker, walking
    segment lengths from the byte after SOI. Bounded unroll — headers live
    in the first KB, so real at-scale parsing caps segment count the same
    way.

    Each walk step is staged as its own projection (withColumn) rather
    than one nested expression: inlining ``cur`` into the next step's
    marker/length/branch would copy its subtree ~6× per level —
    exponential in ``max_segments`` — and Catalyst's CollapseProject
    keeps multiply-referenced non-trivial aliases un-inlined, so the
    staged form stays linear."""
    out = df.withColumn(out_col, F.lit(3).cast("bigint"))  # byte after SOI
    marker_col = f"{out_col}__marker"
    for _ in range(max_segments):
        out = out.withColumn(marker_col, _be("payload", F.col(out_col), 2))
        # Lock in place on SOF (fixed point); otherwise skip marker + segment.
        out = out.withColumn(
            out_col,
            F.when(_is_sof(F.col(marker_col)), F.col(out_col)).otherwise(
                F.col(out_col) + 2 + _be("payload", F.col(out_col) + 2, 2)
            ),
        )
    out = out.withColumn(marker_col, _be("payload", F.col(out_col), 2))
    return out.withColumn(
        out_col, F.when(_is_sof(F.col(marker_col)), F.col(out_col))
    ).drop(marker_col)


MEDIA_META_COLS = (
    "doc_id",
    "media_kind",
    "width",
    "height",
    "channels",
    "sample_rate",
)


def parse_media_meta(df: DataFrame) -> DataFrame:
    """Parse container headers out of a BinaryType ``payload`` column into
    typed metadata — pure expressions, no UDF:

    - PNG  (``\\x89PNG\\r\\n\\x1a\\n``): IHDR width/height, big-endian 32-bit
      at bytes 17-20 / 21-24.
    - WAV  (``RIFF``+``WAVE``): channels (LE16 at 23-24), sample rate
      (LE32 at 25-28) from the canonical fmt chunk.
    - JPEG (``\\xff\\xd8``): segment walk to the first SOF marker; height
      (BE16 at sof+5), width (BE16 at sof+7).

    Unknown magic → ``media_kind`` NULL, all metadata NULL. At 100 TB this
    runs inside the scan's project (whole-stage codegen) — header metadata
    extraction costs no shuffle and no Python.
    """
    is_png = F.hex(F.substring("payload", 1, 8)) == "89504E470D0A1A0A"
    is_wav = (F.hex(F.substring("payload", 1, 4)) == "52494646") & (
        F.hex(F.substring("payload", 9, 4)) == "57415645"
    )
    is_jpeg = F.hex(F.substring("payload", 1, 2)) == "FFD8"
    staged = _with_jpeg_sof_offset(df, "__sof")
    sof = F.col("__sof")
    kind = (
        F.when(is_png, "png").when(is_wav, "wav").when(is_jpeg, "jpeg")
    )
    width = (
        F.when(is_png, _be("payload", 17, 4))
        .when(is_jpeg, _be("payload", sof + 7, 2))
        .cast("bigint")
    )
    height = (
        F.when(is_png, _be("payload", 21, 4))
        .when(is_jpeg, _be("payload", sof + 5, 2))
        .cast("bigint")
    )
    channels = F.when(is_wav, _le("payload", 23, 2)).cast("bigint")
    sample_rate = F.when(is_wav, _le("payload", 25, 4)).cast("bigint")
    return staged.select(
        "doc_id",
        kind.alias("media_kind"),
        width.alias("width"),
        height.alias("height"),
        channels.alias("channels"),
        sample_rate.alias("sample_rate"),
    )


def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media-header fixture: every row gets a spec-shaped
    PNG / WAV / JPEG header (by ``id % 3``) with dimensions derived from
    the id — built with pure expressions (hex concat → unhex) so the same
    payload is reproducible in any engine. The JPEG variant carries a real
    APP0 segment before SOF0, so parsers must walk segments, not assume a
    fixed offset."""
    i = F.col(id_col).cast("bigint")
    h2 = lambda c: F.lpad(F.hex(c.cast("bigint") % 256), 2, "0")  # noqa: E731
    h4be = lambda c: F.lpad(F.hex(c.cast("bigint") % 65536), 4, "0")  # noqa: E731
    h8be = lambda c: F.lpad(F.hex(c.cast("bigint")), 8, "0")  # noqa: E731

    png_w, png_h = 16 + i % 2048, 16 + (i * 7) % 1152
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        h8be(png_w),
        h8be(png_h),
    )
    rate = (1 + i % 5) * 8000
    wav_hex = F.concat(
        F.lit("52494646" + "24000000" + "57415645" + "666D7420"),
        F.lit("10000000" + "0100"),
        h2(1 + i % 2),
        F.lit("00"),
        h2(rate),
        h2(rate / F.lit(256)),
        F.lit("0000"),
    )
    jpg_w, jpg_h = 8 + (i * 3) % 4096, 8 + (i * 5) % 2160
    jpeg_hex = F.concat(
        F.lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "00" * 9),
        F.lit("FFC0" + "0011" + "08"),
        h4be(jpg_h),
        h4be(jpg_w),
    )
    payload_hex = (
        F.when(i % 3 == 0, png_hex).when(i % 3 == 1, wav_hex).otherwise(jpeg_hex)
    )
    return df.select(
        i.alias("doc_id"), F.unhex(payload_hex).alias("payload")
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
