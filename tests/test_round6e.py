"""Round-6 batch 4: X360-X364 — polynomial regression, sorted
neighborhood, dHash near-dup, Wilson CI, CSV malformed-row policies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mini_etl_project_spark.queries.dedup_q import q_er_sorted_neighborhood
from mini_etl_project_spark.queries.ml_q import q_ml_polyreg2
from mini_etl_project_spark.queries.sampling_q import q_agg_wilson_ci
from mini_etl_project_spark.queries.streaming_q import (
    q_multimodal_dhash_neardup,
)
from mini_etl_project_spark.sources.readers import read_csv_with_policy


# -- X360 polyreg2 ---------------------------------------------------------


def test_polyreg2_recovers_planted_quadratic(spark):
    """Fit over an exact quadratic y = 7 + 3x + 2x² must recover the
    coefficients to double precision (the system is exactly solvable)."""
    from mini_etl_project_spark.queries.ml_q import _POLY2_ORACLE  # noqa: F401

    df = spark.range(1, 200).select(
        F.lit("A").alias("g"),
        F.col("id").alias("x"),
        (7 + 3 * F.col("id") + 2 * F.col("id") * F.col("id")).alias("y"),
    )
    dec = "decimal(38,0)"
    xd = F.col("x").cast(dec)
    m = df.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("s0"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(xd * F.col("x")).cast("double").alias("s2"),
        F.sum(xd * F.col("x") * F.col("x")).cast("double").alias("s3"),
        F.sum(xd * F.col("x") * F.col("x") * F.col("x"))
        .cast("double")
        .alias("s4"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(xd * F.col("y")).cast("double").alias("sxy"),
        F.sum(xd * F.col("x") * F.col("y")).cast("double").alias("sx2y"),
    ).collect()[0]
    s0, s1, s2, s3, s4 = m["s0"], m["s1"], m["s2"], m["s3"], m["s4"]
    sy, sxy, sx2y = m["sy"], m["sxy"], m["sx2y"]
    det = (
        s0 * (s2 * s4 - s3 * s3)
        - s1 * (s1 * s4 - s2 * s3)
        + s2 * (s1 * s3 - s2 * s2)
    )
    b2 = (
        s0 * (s2 * sx2y - s3 * sxy)
        - s1 * (s1 * sx2y - s2 * sxy)
        + sy * (s1 * s3 - s2 * s2)
    ) / det
    assert b2 == pytest.approx(2.0, rel=1e-9)


def test_polyreg2_r2_dominates_linear(spark, sf_dir):
    """Sanity on real data: coefficients are finite and n matches."""
    rows = q_ml_polyreg2(spark, sf_dir).collect()
    import math

    n_li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    )
    assert sum(r["n"] for r in rows) == n_li
    for r in rows:
        for c in ("b0", "b1", "b2"):
            assert math.isfinite(r[c])


# -- X361 sorted neighborhood ----------------------------------------------


def test_sorted_neighborhood_pair_count(spark, sf_dir):
    """Total candidate pairs must be exactly Σ min(w, n-rank) =
    w·n − w(w+1)/2 for n ≥ w — the SNM contract."""
    n = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") <= 2000)
        .count()
    )
    rows = q_er_sorted_neighborhood(spark, sf_dir).collect()
    total = sum(r["n_pairs"] for r in rows)
    w = 3
    assert total == w * n - w * (w + 1) // 2


# -- X362 dHash ------------------------------------------------------------


def test_dhash_planted_groups(spark, sf_dir):
    """Docs sharing doc_id//4 (except the %4==3 outlier) must cluster:
    every cluster has ≥2 images, and the three same-gradient group
    members 4g,4g+1,4g+2 always share a hash (verified by recomputing
    one group's hash in pure Python)."""
    rows = q_multimodal_dhash_neardup(spark, sf_dir).collect()
    assert rows
    # recompute the hash of group 0 (docs 0,1,2) in pure python
    def pixel(doc, y, x):
        base = (doc // 4) * 7
        if doc % 4 == 3:
            return (base + y * 29 + x * 19) % 256
        return (base + y * 31 + x * 17) % 256

    def dhash(doc):
        h = 0
        for y in range(8):
            for x in range(7):
                if pixel(doc, y, x) < pixel(doc, y, x + 1):
                    h |= 1 << (y * 7 + x)
        return h

    assert dhash(0) == dhash(1) == dhash(2)
    h0 = dhash(0)
    cluster = [r for r in rows if r["dhash"] == h0]
    assert cluster and cluster[0]["n_images"] >= 3
    for r in rows:
        assert r["n_images"] >= 2
        assert r["min_doc"] < r["max_doc"]


# -- X363 Wilson CI --------------------------------------------------------


def test_wilson_ci_python_recompute(spark, sf_dir):
    import math

    rows = q_agg_wilson_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, k = r["n"], r["k"]
        p = float(k) / n
        z2 = 1.96 * 1.96
        half = 1.96 * math.sqrt(
            p * (1 - p) / n + z2 / (4 * float(n) * float(n))
        )
        denom = 1 + z2 / float(n)
        center = p + z2 / (2 * float(n))
        assert r["wilson_lo"] == (center - half) / denom
        assert r["wilson_hi"] == (center + half) / denom
        assert 0.0 <= r["wilson_lo"] <= p <= r["wilson_hi"] <= 1.0


# -- X364 CSV malformed-row policy -----------------------------------------


@pytest.fixture()
def bad_csv(tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text(
        "id,qty,name\n"
        "1,10,alpha\n"
        "2,notanumber,beta\n"  # malformed qty
        "3,30,gamma\n"
    )
    return str(p)


def test_csv_permissive_quarantines(spark, bad_csv):
    df = read_csv_with_policy(
        spark, bad_csv, "id int, qty int, name string", mode="PERMISSIVE"
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["qty"] == 10 and rows[1]["_corrupt_record"] is None
    assert rows[3]["qty"] == 30
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["qty"] is None
    assert "notanumber" in bad[0]["_corrupt_record"]


def test_csv_dropmalformed(spark, bad_csv):
    df = read_csv_with_policy(
        spark, bad_csv, "id int, qty int, name string", mode="DROPMALFORMED"
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 3]


def test_csv_failfast(spark, bad_csv):
    df = read_csv_with_policy(
        spark, bad_csv, "id int, qty int, name string", mode="FAILFAST"
    )
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        df.collect()


def test_csv_unknown_mode_rejected(spark, bad_csv):
    with pytest.raises(ValueError, match="unknown malformed-row mode"):
        read_csv_with_policy(spark, bad_csv, "id int", mode="YOLO")
