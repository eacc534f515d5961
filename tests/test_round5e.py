"""Property tests for round-5 session-4/5 operators: pointer-doubling
cycle detection vs direct simulation, max-min seeding invariants,
water-filling quota laws, and profile/ref-integrity sanity."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# -- cycle detection: pointer doubling == direct simulation ----------------
# The Spark plan and the oracle both implement the same math; this checks
# the MATH itself against a brute-force Python walk on random functional
# graphs (any n, any affine map — not just the fixture's 7v+3).


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=60),
    a=st.integers(min_value=1, max_value=97),
    c=st.integers(min_value=0, max_value=97),
)
def test_pointer_doubling_math_matches_simulation(n, a, c):
    succ = {v: (a * v + c) % n for v in range(n)}
    # direct: walk 2n steps
    land = {}
    pmin = {}
    for v in range(n):
        cur, mn = v, None
        for _ in range(2 * n):
            cur = succ[cur]
            mn = cur if mn is None else min(mn, cur)
        land[v] = cur
        pmin[v] = mn
    on_cycle = set(land.values())
    cycle_id = {v: pmin[land[v]] for v in range(n)}
    # doubling replay (the engine's recurrence) — depth 2^r ≥ 2n
    import math

    rounds = max(1, math.ceil(math.log2(2 * n)))
    s = dict(succ)
    m = dict(succ)
    for _ in range(rounds - 1):
        s2 = {v: s[s[v]] for v in range(n)}
        m2 = {v: min(m[v], m[s[v]]) for v in range(n)}
        s, m = s2, m2
    # outputs must agree even though depths differ (D-invariance ≥ n)
    assert set(s.values()) == on_cycle
    for v in range(n):
        assert m[s[v]] == cycle_id[v], (v, n, a, c)


# -- max-min seeding invariants --------------------------------------------


def test_maxmin_seeds_are_distinct_and_start_at_min(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_maxmin_seed

    rows = q_ml_maxmin_seed(spark, SF).collect()
    ids = [r["id"] for r in sorted(rows, key=lambda r: r["seed_rank"])]
    assert len(set(ids)) == 4, "seeds must be distinct points"
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert ids[0] == emb.agg(F.min("vec_id")).collect()[0][0]


# -- water-filling quota laws ----------------------------------------------


def test_lang_balance_quota_laws(spark):
    from mini_etl_project_spark.queries.llm_q import q_corpus_lang_balance

    out = {r["lang"]: r for r in q_corpus_lang_balance(spark, SF).collect()}
    d = spark.read.parquet(f"{SF}/documents.parquet")
    supply = {
        r["lang"]: r["sup"]
        for r in d.select(
            "lang",
            F.when(
                F.length(F.trim(F.col("text"))) == 0, F.lit(0)
            ).otherwise(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"),
        )
        .groupBy("lang")
        .agg(F.sum("t").alias("sup"))
        .collect()
    }
    budget = sum(supply.values()) // 2
    total_quota = sum(r["quota"] for r in out.values())
    assert total_quota <= budget, "water-filling must not exceed budget"
    for lang, r in out.items():
        assert r["quota"] <= supply[lang] + 0, (
            f"{lang}: quota {r['quota']} exceeds supply"
        )
        assert r["n_tokens_kept"] <= r["quota"]


# -- referential integrity: planted orphans are exactly recovered ----------


def test_ref_integrity_orphan_accounting(spark):
    from mini_etl_project_spark.queries.misc_q import q_quality_ref_integrity

    out = {
        r["relationship"]: r
        for r in q_quality_ref_integrity(spark, SF).collect()
    }
    clean = out["orders->customer"]
    assert clean["n_orphan_rows"] == 0 and clean["n_orphan_keys"] == 0
    dirty = out["lineitem->part"]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    planted = li.filter(F.col("l_orderkey") % 97 == 0).count()
    assert dirty["n_orphan_rows"] == planted
    assert 0 < dirty["n_orphan_keys"] <= dirty["n_orphan_rows"]


# -- grid isolation: levels partition the point set ------------------------


def test_grid_isolation_partitions_points(spark):
    from mini_etl_project_spark.queries.ml_q import q_ml_grid_isolation

    rows = q_ml_grid_isolation(spark, SF).collect()
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_points"] for r in rows) == n_emb
    assert all(0 <= r["iso_level"] <= 6 for r in rows)


# -- per-file bloom index: pruning + zero false negatives ------------------


def test_bloom_file_index_prunes_without_false_negatives(spark, tmp_path):
    from mini_etl_project_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable.create(str(tmp_path / "bt"))
    # 8 disjoint key ranges → 8 files, keys dense within each file
    df = spark.range(800).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") % 8).cast("int").alias("shard"),
        (F.col("id") * 7).cast("bigint").alias("v"),
    )
    t.append(
        df.repartitionByRange(8, "shard"), bloom_cols=["k"], n_files=8
    )
    all_files = t.plan_files()
    assert len(all_files) == 8
    # every present key must survive pruning AND be found (no false negs)
    for k in (0, 137, 799):
        planned = t.plan_files(bloom_eq=("k", k))
        got = (
            t.read(spark, bloom_eq=("k", k))
            .filter(F.col("k") == k)
            .count()
        )
        assert got == 1, f"bloom pruning lost key {k}"
        assert len(planned) >= 1
    # an absent key should prune most files (m/k sized for ~1% FP/file)
    absent_plans = [
        len(t.plan_files(bloom_eq=("k", k))) for k in range(100000, 100050)
    ]
    assert sum(absent_plans) <= 50 * 2, (
        f"bloom should prune nearly all files for absent keys: {absent_plans}"
    )
    # files without a bloom stay conservatively readable
    t.append(
        spark.range(5).select(
            (F.col("id") + 5000).cast("bigint").alias("k"),
            F.lit(9).cast("int").alias("shard"),
            F.lit(0).cast("bigint").alias("v"),
        )
    )  # no bloom_cols on this commit
    assert (
        t.read(spark, bloom_eq=("k", 5003)).filter(F.col("k") == 5003).count()
        == 1
    )


# -- business days: closed form == day-by-day count ∀ (dow, span) ----------


def test_business_days_closed_form_exhaustive():
    for s in range(7):          # start epoch-day offset → all weekdays
        dow0 = (s + 3) % 7      # Monday-indexed
        for n in range(0, 30):  # span lengths incl. multi-week
            brute = sum(
                1 for i in range(n) if (dow0 + i) % 7 < 5
            )
            weeks, rem = n // 7, n % 7
            partial = (
                min(rem, 5 - dow0) if dow0 <= 4 else 0
            ) + max(0, rem - (7 - dow0))
            assert 5 * weeks + partial == brute, (s, n)
