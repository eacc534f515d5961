"""Extract dispatch (reference R1–R6, ETL_PROJECT.py:203-226).

Suffix-dispatched multi-format ingestion returning a lazy Spark DataFrame.
CSV is read with an all-string schema on purpose: the pipeline's own
profiler decides logical types (never ``inferSchema`` — the reference's
type system is its own, SURVEY.md §1.2). Parquet is our scale-path
extension (columnar, predicate pushdown).

Excel has no core-Spark reader; files are inherently small/driver-side, so
a pandas shim feeds ``createDataFrame`` (R2 — compatibility shim, not a
scale path; SURVEY.md §7 hard-part 9).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def extract(spark: SparkSession, source: Any) -> DataFrame:
    """Read a DataFrame from a path (.csv/.json/.xlsx/.xls/.parquet), an
    in-memory dict (column-oriented), a pandas DataFrame, or a Spark
    DataFrame (passthrough — Spark frames are immutable, no copy needed).

    Raises ``ValueError`` for unsupported inputs (R6).
    """
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover
        pd = None

    if isinstance(source, DataFrame):
        return source
    if pd is not None and isinstance(source, pd.DataFrame):
        return spark.createDataFrame(source)
    if isinstance(source, dict):
        if pd is None:  # pragma: no cover
            raise ValueError("dict sources need pandas available")
        return spark.createDataFrame(pd.DataFrame(source))
    if isinstance(source, str):
        lower = source.lower()
        if lower.endswith(".csv"):
            # pandas-parity parsing: quoted fields may contain newlines
            # (multiLine) and escape quotes by doubling (escape='"').
            # multiLine disables record-level file splitting — fine for
            # the compat reader; bulk ingestion at scale should use
            # parquet or line-delimited formats anyway.
            return (
                spark.read.option("header", True)
                .option("inferSchema", False)
                .option("multiLine", True)
                .option("escape", '"')
                .csv(source)
            )
        if lower.endswith((".xlsx", ".xls")):
            if pd is None:  # pragma: no cover
                raise ValueError("Excel sources need pandas available")
            try:
                pdf = pd.read_excel(source)
            except ImportError as e:  # openpyxl/xlrd missing in container
                raise ValueError(f"Excel engine unavailable: {e}") from e
            return spark.createDataFrame(pdf)
        if lower.endswith(".json"):
            # Records-array files (the reference's pd.read_json shape) need
            # multiLine; line-delimited JSON is the Spark-native default.
            with open(source, "rb") as f:
                head = f.read(64).lstrip()
            multi = head.startswith(b"[")
            return spark.read.option("multiLine", multi).json(source)
        if lower.endswith(".parquet"):
            return spark.read.parquet(source)
        if lower.endswith(".orc"):
            # columnar alternative with the same pushdown/pruning story as
            # parquet (Spark-native ORC reader; predicate pushdown on)
            return spark.read.orc(source)
        if lower.endswith((".txt", ".text")):
            # one string column ("value") per line — the raw-corpus
            # ingestion shape; pair with functions/cleaning for parsing
            return spark.read.text(source)
        raise ValueError(f"unsupported file format: {source}")
    raise ValueError(f"unsupported data source type: {type(source).__name__}")


def read_csv_with_policy(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
):
    """CSV ingestion with an explicit malformed-row policy (X364).

    The three Spark contracts, surfaced as a first-class knob because a
    100 TB ingest ALWAYS contains malformed rows:

    - ``PERMISSIVE``: bad rows become nulls and the raw line is captured
      in ``corrupt_col`` (add it to the schema here — Spark only
      populates it when the column exists), so a quarantine split is one
      ``filter`` downstream;
    - ``DROPMALFORMED``: bad rows silently dropped (counted nowhere —
      pair with an Observation if the loss rate matters);
    - ``FAILFAST``: abort the job on the first bad row.

    An explicit schema is required: schema inference reads the data
    twice and silently widens types to cover the bad rows — the
    opposite of a policy.
    """
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError(f"unknown malformed-row mode: {mode}")
    full_schema = (
        f"{schema}, {corrupt_col} string" if mode == "PERMISSIVE" else schema
    )
    reader = (
        spark.read.option("header", True)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full_schema)
    )
    return reader.csv(path)
