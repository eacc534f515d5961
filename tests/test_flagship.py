from __future__ import annotations

import duckdb
import pytest

from mini_etl_project_spark.queries import ORACLES, QUERIES


def oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    rel = con.sql(sql)
    return list(rel.columns), rel.fetchall()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_flagship_matches_oracle_exactly(spark, sf_dir):
    name = "q01_pricing_summary"
    df = QUERIES[name](spark, sf_dir)
    scols, srows = df.columns, [tuple(r) for r in df.collect()]
    dcols, drows = oracle_rows(ORACLES[name], sf_dir)
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    # exact value equality after column-name alignment + row sort
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    s = sorted(tuple(str(r[i]) for i in sidx) for r in srows)
    d = sorted(tuple(str(r[i]) for i in didx) for r in drows)
    assert s == d


def test_every_query_has_callable_signature():
    for name, fn in QUERIES.items():
        assert callable(fn), name
    for name in ORACLES:
        assert name in QUERIES
