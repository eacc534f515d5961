"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-corpus generator with partition planning and filter pushdown.

Demonstrates the engine's source-extension path beyond the built-in
readers (sources/readers.py): scan planning (``partitions()``), predicate
pushdown into a Python source (``pushFilters`` narrows the generated id
range, so filtered scans never materialize dropped rows), and Arrow
``RecordBatch`` emission (vectorized transfer, not row-at-a-time tuples).

The generated values are pure functions of the row id (md5 text, modular
score), so a DuckDB ``generate_series`` oracle reproduces the scan
bit-for-bit — the custom source is fully correctness-gated like every
other operator.

Scale: rows are produced per-partition with no driver materialization;
``partitions`` controls scan parallelism exactly like file splits.
"""

from __future__ import annotations

import dataclasses
import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

SCHEMA = "id bigint, doc string, score double"


@dataclasses.dataclass
class _Range(InputPartition):
    start: int
    end: int  # exclusive


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.lo = 0
        self.hi = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    # -- predicate pushdown into the generator ----------------------------
    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Narrow [lo, hi) for simple comparisons on ``id``; everything
        else is returned to Spark to evaluate post-scan."""
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col != "id":
                yield f
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.hi, self.lo)
        n = max(1, self.n_parts)
        step = max(1, (hi - lo + n - 1) // n) if hi > lo else 1
        return [
            _Range(s, min(s + step, hi)) for s in range(lo, hi, step)
        ] or [_Range(lo, lo)]

    def read(self, partition: _Range):
        import pyarrow as pa

        ids = list(range(partition.start, partition.end))
        yield pa.RecordBatch.from_pydict(
            {
                "id": pa.array(ids, pa.int64()),
                "doc": pa.array(
                    [
                        hashlib.md5(str(i).encode()).hexdigest()
                        for i in ids
                    ],
                    pa.string(),
                ),
                "score": pa.array(
                    [(i % 97) / 97.0 for i in ids], pa.float64()
                ),
            }
        )


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("synthetic_corpus").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticCorpusReader:
        return SyntheticCorpusReader(self.options)


def register(spark) -> None:
    """Idempotent registration (latest registration wins in Spark).

    Python-source filter pushdown is off by default; the flag is a
    runtime conf, so enabling it here covers plain driver sessions too.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticCorpusDataSource)


# -- Spark 4 Python STREAMING DataSource -----------------------------------
# The streaming half of the source-extension path: a bounded deterministic
# event stream via SimpleDataSourceStreamReader. Offsets are plain row
# positions; readBetweenOffsets regenerates any committed range
# deterministically, which is exactly the replayability contract a
# recovering micro-batch needs. After `rows` the reader returns empty
# batches with an unchanged offset, so processAllAvailable() terminates —
# a bounded replay, like the file-stream fixtures in streaming/ops.py.

try:  # pragma: no cover — import shape varies across Spark 4 minors
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = None  # type: ignore[assignment]

STREAM_SCHEMA = "id bigint, v bigint"


def _stream_rows(lo: int, hi: int):
    return iter([(i, (i * 37) % 100) for i in range(lo, hi)])


if SimpleDataSourceStreamReader is not None:

    class SyntheticStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options: dict) -> None:
            self.rows = int(options.get("rows", 2000))
            self.chunk = int(options.get("chunk", 512))

        def initialOffset(self) -> dict:
            return {"pos": 0}

        def read(self, start: dict):
            lo = start["pos"]
            hi = min(lo + self.chunk, self.rows)
            return _stream_rows(lo, hi), {"pos": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return _stream_rows(start["pos"], end["pos"])

        def commit(self, end: dict) -> None:
            pass

    class SyntheticStreamDataSource(DataSource):
        """``spark.readStream.format("synthetic_stream").option("rows", N)``."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_stream"

        def schema(self) -> str:
            return STREAM_SCHEMA

        def simpleStreamReader(self, schema) -> "SyntheticStreamReader":
            return SyntheticStreamReader(self.options)

    def register_stream(spark) -> None:
        spark.dataSource.register(SyntheticStreamDataSource)

else:  # pragma: no cover

    def register_stream(spark) -> None:
        raise NotImplementedError(
            "SimpleDataSourceStreamReader unavailable in this Spark build"
        )


# -- Spark 4 Python DataSource WRITE path (X170) ---------------------------
# The third leg of the source-extension API: a batch SINK.  Each task
# serializes its partition to one JSON-lines part file and returns a
# commit message (file, row count); the driver-side commit() writes a
# _MANIFEST only after every task succeeded — the standard two-phase
# file-sink contract (no reader sees a partial write, failed attempts
# leave only uncommitted part files).  abort() records the failure.

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclasses.dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


class JsonLinesSinkWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> _PartFile:
        _os.makedirs(self.path, exist_ok=True)
        part = _os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartFile(path=part, rows=n)

    def commit(self, messages) -> None:
        manifest = {
            "files": sorted(
                [{"path": m.path, "rows": m.rows} for m in messages],
                key=lambda d: d["path"],
            ),
            "total_rows": sum(m.rows for m in messages),
        }
        with open(
            _os.path.join(self.path, "_MANIFEST"), "w", encoding="utf-8"
        ) as fh:
            _json.dump(manifest, fh)

    def abort(self, messages) -> None:  # pragma: no cover — failure path
        with open(
            _os.path.join(self.path, "_ABORTED"), "w", encoding="utf-8"
        ) as fh:
            fh.write("aborted\n")


class JsonLinesSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonLinesSinkWriter:
        return JsonLinesSinkWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonLinesSinkDataSource)
