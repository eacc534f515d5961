"""Registry-wide output contract: every query's result schema is scalar.

The driver canonicalizes query output through pandas (sort_values over
object columns), which cannot hash list/dict-valued cells — round 6's
only red row (q_fn_array_v34) was exactly this class of failure, with
correct values. This test freezes the fix: no registered query may emit
an Array/Map/Struct column. Plan-only (schema is resolved without
executing), so walking the whole registry is cheap.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

from mini_etl_project_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def test_no_nonscalar_output_columns(spark):
    bad: list[str] = []
    errors: list[str] = []
    for name, fn in sorted(QUERIES.items()):
        try:
            schema = fn(spark, SF).schema
        except Exception as e:  # noqa: BLE001 — collect, don't abort the walk
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
            # DECIMAL(p>18) degrades to float64 on the DuckDB side of the
            # driver's pandas canonicalizer while Spark keeps
            # decimal.Decimal — identical values hash-diverge (r7's one
            # red row, q_join_pvm_bridge). Serialize wide decimals to
            # VARCHAR in-plan (exact at any magnitude) on BOTH engines.
            if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18:
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not errors, "plan build failed for:\n" + "\n".join(errors[:10])
    assert not bad, (
        "non-transportable output columns (driver canonicalizer cannot "
        "hash these — serialize in-plan via array_join/to_json, and "
        "DECIMAL(p>18) via CAST AS VARCHAR on both engines):\n"
        + "\n".join(bad)
    )


def test_oracle_names_subset_and_unique():
    """Every oracle key resolves to a registered query (no orphan SQL),
    and registration raised on duplicates (the X204 shadowing class)."""
    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, f"oracle SQL with no registered query: {orphans}"


def test_coverage_doc_names_resolve():
    """Every `q_*` name cited in COVERAGE.md resolves to a registered
    query — a doc/registry drift (rename, removal) can't sit silently
    behind a stale inventory row (the X204 lesson, doc side)."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "COVERAGE.md")).read()
    cited = {
        n for n in re.findall(r"\bq_[a-z0-9_]+", text) if not n.endswith("_")
    }  # drop glob artifacts like `q_stream_*`
    # Documented env-gated registrations (absent in this container):
    gated = {"q_stream_stateful_v2"}  # protobuf-gated, streaming_q.py:411
    missing = sorted(n for n in cited - gated if n not in QUERIES)
    assert not missing, f"COVERAGE.md cites unregistered queries: {missing}"
