"""Deduplication queries over ``documents`` (X1, X2) — the full
MinHash+LSH pipeline AND SimHash, both fully oracle-checked (every hash is
md5-derived, so DuckDB reproduces signatures, bands, candidates, and
verified pairs bit-for-bit).

The corpus has no strong natural near-dups (max 5-gram Jaccard ≈ 0.3 —
measured), so the LSH query PLANTS deterministic near-duplicates: each doc
with id < 150 gets a copy (id + 10000) with its first 20 characters
removed. Both engines build the identical planted corpus; the check then
covers recall mechanics end-to-end, not just empty-set agreement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_project_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows,
    simhash,
)
from mini_etl_project_spark.queries import query
from mini_etl_project_spark.session import load_table

# -- X1 exact dedup on a normalization key ---------------------------------

_EXACT_ORACLE = """
WITH keyed AS (
  SELECT doc_id, source,
         md5(lower(trim(text))) AS text_key
  FROM documents),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY text_key ORDER BY doc_id) AS rn
  FROM keyed)
SELECT COUNT(*) AS n_docs,
       COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_unique,
       COUNT(CASE WHEN rn > 1 THEN 1 END) AS n_dropped
FROM ranked
"""


@query("q_dedup_exact", _EXACT_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("text_key").orderBy("doc_id")
    ranked = d.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("text_key")
    ).withColumn("rn", F.row_number().over(w))
    return ranked.agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_unique"),
        F.count(F.when(F.col("rn") > 1, 1)).alias("n_dropped"),
    )


# -- X2 MinHash + LSH banding + exact-Jaccard verification -----------------

_HASH64 = (
    "CAST(('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' || {v}), 1, 15)) "
    "AS BIGINT)"
)

_MINHASH_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 10000 AS id, substring(text, 21) AS text
  FROM documents WHERE doc_id < 150),
sh AS (
  SELECT DISTINCT id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(length(text)-4, 1)),
             i -> substring(text, i, 5)))) AS shingle
  FROM corpus),
hashes AS (
  SELECT id, seed.s AS seed,
         {_HASH64.format(seed='seed.s', v='shingle')} AS h
  FROM sh, (SELECT unnest(generate_series(0, 15)) AS s) seed),
sig AS (SELECT id, seed, MIN(h) AS minhash FROM hashes GROUP BY id, seed),
banded AS (
  SELECT id, CAST(FLOOR(seed / 4) AS INT) AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_key
  FROM sig GROUP BY id, CAST(FLOOR(seed / 4) AS INT)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  JOIN cand ON cand.id_a = a.id AND cand.id_b = b.id
  GROUP BY a.id, b.id)
SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b,
       CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
"""


def _planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    orig = d.select(F.col("doc_id").alias("id"), "text")
    mutated = d.select(
        (F.col("doc_id") + 10000).alias("id"),
        F.substring(F.col("text"), 21, 1 << 30).alias("text"),
    )
    return orig.unionByName(mutated)


@query("q_dedup_minhash_lsh", _MINHASH_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _planted_corpus(spark, sf_dir)
    sh = shingle_rows(corpus, "id", "text", k=5)
    sig = minhash_signatures(sh, num_hashes=16)
    cand = lsh_candidate_pairs(sig, rows_per_band=4)
    return jaccard_pairs(sh, candidates=cand, threshold=0.5)


# -- X2 SimHash fingerprints ----------------------------------------------

_SIMHASH_BITS = 32


def _simhash_oracle() -> str:
    h = _HASH64.format(seed="0", v="tok")
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)"
        for j in range(_SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
hashed AS (SELECT id, {h} AS h FROM toks),
bits AS (
  SELECT id, {bit_sums}
  FROM hashed GROUP BY id)
SELECT id, {fp} AS simhash FROM bits
"""


@query("q_dedup_simhash", _simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", bits=_SIMHASH_BITS)


# -- X2 SimHash near-dup pairs on the planted corpus (Hamming ≤ 6) ---------

_SIMHASH_PAIRS_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 10000 AS id, substring(text, 21) AS text
  FROM documents WHERE doc_id < 150),
toks AS (
  SELECT id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM corpus),
hashed AS (SELECT id, {_HASH64.format(seed="0", v="tok")} AS h FROM toks),
bits AS (
  SELECT id,
         {", ".join(f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(_SIMHASH_BITS))}
  FROM hashed GROUP BY id),
fp AS (
  SELECT id,
         {" + ".join(f"(CASE WHEN b{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)" for j in range(_SIMHASH_BITS))}
           AS simhash
  FROM bits)
SELECT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
"""


@query("q_dedup_simhash_pairs", _SIMHASH_PAIRS_ORACLE)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _planted_corpus(spark, sf_dir)
    fp = simhash(corpus, "id", "text", bits=_SIMHASH_BITS)
    a = fp.select(F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"))
    b = fp.select(F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )


# -- X2 exact set-similarity self-join via prefix filtering (AllPairs) -----
#
# The oracle is BRUTE FORCE (all pairs sharing >= 1 shingle, no filter):
# the prefix+length filters must be lossless, so the filtered Spark plan
# has to reproduce the unfiltered ground truth exactly.

_PREFIX_JOIN_ORACLE = """
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 10000 AS id, substring(text, 21) AS text
  FROM documents WHERE doc_id < 150),
sh AS (
  SELECT DISTINCT id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(length(text)-4, 1)),
             i -> substring(text, i, 5)))) AS shingle
  FROM corpus),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id)
SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b,
       CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
"""


@query("q_dedup_prefix_join", _PREFIX_JOIN_ORACLE)
def q_dedup_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.dedup import prefix_filter_pairs

    corpus = _planted_corpus(spark, sf_dir)
    sh = shingle_rows(corpus, "id", "text", k=5)
    cand = prefix_filter_pairs(sh, threshold=0.5)
    return jaccard_pairs(sh, candidates=cand, threshold=0.5)
