"""Training-data pipeline operators, round 3 (brief: "operations a
large-scale training-data pipeline would need"):

- sequence packing: GPT-style concat-and-chunk of documents into fixed
  token-budget context windows, per source shard;
- repetition filtering: Gopher-style duplicate-n-gram fraction, the
  standard low-quality-document signal;
- embedding quantization: symmetric int8 with per-vector scale, the
  storage layout ANN serving systems actually ship.

All three are pure-expression plans (no UDFs) with exact DuckDB oracles.

Scale notes: packing windows partition by the shard column — the global
concat order a single-node packer would use is replaced by per-shard
order, which is what a distributed writer does anyway (each output shard
is packed independently). Repetition and quantization are stateless
per-row projections — scan-parallel at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_etl_project_spark.operators.textops import tokens
from mini_etl_project_spark.queries import query
from mini_etl_project_spark.session import load_table

# -- sequence packing -------------------------------------------------------

_PACK_BUDGET = 512

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents),
c AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM t)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start // {_PACK_BUDGET} AS BIGINT) AS bin_id,
       CAST(start % {_PACK_BUDGET} AS BIGINT) AS bin_offset
FROM c
"""


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    text_col: str,
    budget: int = _PACK_BUDGET,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid end-to-end in a
    deterministic per-shard order and cut into ``budget``-token context
    windows (documents may straddle window boundaries — exactly what a
    pretraining data loader does). Returns each doc's window id and
    offset; a writer keyed on (shard, bin_id) then emits fixed-size
    training rows.

    One shuffle (the per-shard window); no single global order — each
    shard packs independently, which is also how a multi-writer job lays
    out files at 100 TB.
    """
    n_tokens = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(tokens(text_col))).cast("bigint")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = df.select(
        F.col(order_col), F.col(shard_col), n_tokens.alias("n_tokens")
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    c = t.select("*", start)
    return c.select(
        order_col,
        shard_col,
        "n_tokens",
        F.floor(F.col("start") / budget).cast("bigint").alias("bin_id"),
        (F.col("start") % budget).cast("bigint").alias("bin_offset"),
    )


@query("q_corpus_pack", _PACK_ORACLE)
def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, "source", "doc_id", "text")


# -- repetition filter ------------------------------------------------------

# Gopher uses ~0.2 for duplicate-line fraction on web text; the synthetic
# corpus tops out near 0.14 duplicate bigrams, so 0.1 keeps the flag
# column live (both branches exercised) in the oracle comparison.
_REP_THRESHOLD = 0.1

_REP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents),
b AS (
  SELECT doc_id, len(w) AS n_words,
         CASE WHEN len(w) >= 2 THEN
           list_transform(generate_series(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i + 1])
         END AS bg
  FROM t)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CASE WHEN bg IS NULL THEN NULL
            ELSE 1.0 - len(list_distinct(bg))::DOUBLE / len(bg) END
         AS dup_bigram_frac,
       CASE WHEN bg IS NULL THEN 0
            WHEN 1.0 - len(list_distinct(bg))::DOUBLE / len(bg)
                 > {_REP_THRESHOLD} THEN 1 ELSE 0 END AS flagged
FROM b
"""


def duplicate_bigram_fraction(text_col: Column | str) -> Column:
    """Gopher-style repetition signal: fraction of word bigrams that are
    duplicates (1 − distinct/total). NULL for documents under 2 words.
    Pure higher-order expressions; the integer ratio divides exactly the
    same in any engine."""
    w = tokens(text_col)
    n = F.size(w)
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(
            F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
        ),
    )
    return F.when(
        n >= 2,
        F.lit(1.0)
        - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams),
    )


@query("q_text_repetition", _REP_ORACLE)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    frac = duplicate_bigram_fraction("text")
    return d.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_words"),
        frac.alias("dup_bigram_frac"),
        F.when(frac > _REP_THRESHOLD, 1).otherwise(0).alias("flagged"),
    )


# -- eval-set decontamination ----------------------------------------------
# The standard pre-training decontamination pass: flag training documents
# sharing any exact word n-gram with a held-out evaluation set. The eval
# side's distinct-gram set is tiny relative to the corpus and broadcasts;
# the training side streams through the scan + one broadcast-hash join —
# no all-pairs anything, which is what makes this shape hold at 100 TB
# (eval sets are MBs even when the corpus is 100 TB).

_DECON_K = 3  # n-gram width; 3 keeps live signal on the synthetic corpus
_DECON_EVAL = 20  # doc_id < 20 plays the held-out eval set


def ngram_hits(
    train: DataFrame, eval_set: DataFrame, text_col: str, k: int = _DECON_K
) -> DataFrame:
    """Per-training-doc count of distinct word ``k``-grams that also occur
    anywhere in the eval set. Docs with ``n_hit_grams > 0`` are
    decontamination candidates."""
    toks = tokens(text_col)
    # Guard docs shorter than k tokens: F.sequence(1, n-(k-1)) DESCENDS
    # when n-(k-1) < 1 and F.slice then throws on start 0 — short docs
    # must yield no grams (NULL → explode drops the row), matching the
    # oracle's generate_series, which is empty for stop < start.
    grams = F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ),
    )
    t = train.select("doc_id", F.explode(grams).alias("gram"))
    e = eval_set.select(F.explode(grams).alias("gram")).distinct()
    return (
        t.join(F.broadcast(e), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").cast("bigint").alias("n_hit_grams"))
    )


_DECON_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(w) - {_DECON_K - 1}),
           i -> array_to_string(w[i:i + {_DECON_K - 1}], ' ')))) AS gram
  FROM d),
e AS (SELECT DISTINCT gram FROM g WHERE doc_id < {_DECON_EVAL}),
t AS (SELECT doc_id, gram FROM g WHERE doc_id >= {_DECON_EVAL})
SELECT t.doc_id, CAST(COUNT(DISTINCT t.gram) AS BIGINT) AS n_hit_grams
FROM t JOIN e USING (gram)
GROUP BY t.doc_id
"""


@query("q_corpus_decontaminate", _DECON_ORACLE)
def q_corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") >= _DECON_EVAL)
    eval_set = d.filter(F.col("doc_id") < _DECON_EVAL)
    return ngram_hits(train, eval_set, "text")


# -- weighted corpus mixing -------------------------------------------------
# Data mixing for training: sample documents with probability increasing
# in their source's weight, deterministically. Priority = min of w
# independent 60-bit hashes (the "min of w uniforms" race: between two
# docs with weights w and v, the lower minimum goes to the heavier source
# with probability w/(w+v)) — integer-only, so the oracle reproduces every
# draw exactly; no transcendental functions whose last-ulp behavior could
# differ between engines. Selection = global top-k by priority, which
# Spark executes as a distributed TakeOrdered (no single-partition sort).

_MIX_W_SEED = 7
_MIX_P_SEEDS = (101, 102, 103, 104)
_MIX_K = 100


def weighted_mix(
    df: DataFrame,
    id_col: str,
    shard_col: str,
    k: int = _MIX_K,
) -> DataFrame:
    """Deterministic weighted corpus sample of ``k`` docs; weight 1-4 is
    hash-derived from the shard (stand-in for a supplied mixing table)."""
    from mini_etl_project_spark.operators.textops import hash64

    w = 1 + hash64(F.col(shard_col), _MIX_W_SEED) % 4
    hs = [
        hash64(F.col(id_col).cast("string"), seed) for seed in _MIX_P_SEEDS
    ]
    priority = F.least(
        hs[0],
        F.when(w >= 2, hs[1]).otherwise(hs[0]),
        F.when(w >= 3, hs[2]).otherwise(hs[0]),
        F.when(w >= 4, hs[3]).otherwise(hs[0]),
    )
    return (
        df.select(
            F.col(id_col),
            F.col(shard_col),
            w.alias("weight"),
            priority.alias("priority"),
        )
        .orderBy("priority", id_col)
        .limit(k)
    )


def _h_sql(seed: int, expr: str) -> str:
    return (
        f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT"
    )


_MIX_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         1 + ({_h_sql(_MIX_W_SEED, 'source')} % 4) AS weight,
         {_h_sql(_MIX_P_SEEDS[0], 'doc_id')} AS h1,
         {_h_sql(_MIX_P_SEEDS[1], 'doc_id')} AS h2,
         {_h_sql(_MIX_P_SEEDS[2], 'doc_id')} AS h3,
         {_h_sql(_MIX_P_SEEDS[3], 'doc_id')} AS h4
  FROM documents)
SELECT doc_id, source, CAST(weight AS BIGINT) AS weight,
       LEAST(h1,
             CASE WHEN weight >= 2 THEN h2 ELSE h1 END,
             CASE WHEN weight >= 3 THEN h3 ELSE h1 END,
             CASE WHEN weight >= 4 THEN h4 ELSE h1 END) AS priority
FROM t
ORDER BY priority, doc_id
LIMIT {_MIX_K}
"""


@query("q_corpus_mix", _MIX_ORACLE)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return weighted_mix(d, "doc_id", "source")


# -- PII scrubbing ----------------------------------------------------------
# Classic pre-training scrub pass: regex-redact emails and IPv4s, count
# redactions. The synthetic corpus contains no PII, so both engines plant
# the same deterministic contact line per doc first — the redaction
# machinery (global replace, match counting) then runs on live matches.
# Patterns use only syntax with identical semantics in Java regex (Spark)
# and RE2 (DuckDB); DuckDB needs the explicit 'g' flag to match Spark's
# replace-all behavior.

_EMAIL_RE = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+[a-zA-Z0-9]"
_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@example.com from 10.0.' || (doc_id % 256) || '.7' AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}'))
            + len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT)
         AS n_redactions,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_IP_RE}', '<IP>', 'g') AS scrubbed
FROM aug
"""


def scrub_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Redact emails and IPv4 addresses; returns the scrubbed text and a
    per-doc redaction count. Stateless projection — scan-parallel."""
    t = F.col(text_col)
    n = (
        F.regexp_count(t, F.lit(_EMAIL_RE)) + F.regexp_count(t, F.lit(_IP_RE))
    ).cast("bigint")
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return df.select(
        "doc_id", n.alias("n_redactions"), scrubbed.alias("scrubbed")
    )


@query("q_text_pii_scrub", _PII_ORACLE)
def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256),
            F.lit(".7"),
        ).alias("t"),
    )
    return scrub_pii(aug, "t")


# -- int8 embedding quantization -------------------------------------------

# The query surface explodes the quantized vector to scalar rows
# (vec_id, scale, idx, q): the comparison harness canonicalizes via pandas
# and cannot hash array cells (repo convention at functions_q.py — arrays
# never cross the comparison boundary; round-3's one red row was this
# query returning array<int> directly).
_QUANT_ORACLE = """
WITH m AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS mx,
         embedding
  FROM embeddings),
c AS (
  SELECT vec_id, mx, embedding,
         unnest(generate_series(1, len(embedding))) AS idx
  FROM m)
SELECT vec_id,
       mx / 127.0 AS scale,
       CAST(idx AS BIGINT) AS idx,
       CASE WHEN mx = 0 THEN 0
            ELSE CAST(floor(CAST(embedding[CAST(idx AS INT)] AS DOUBLE)
                            * 127.0 / mx + 0.5) AS INTEGER)
       END AS q
FROM c
"""


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization with per-vector scale: q = round(x /
    scale), scale = max|x| / 127. Rounding is floor(v + 0.5) — identical
    half-up behavior in every engine (library ``round`` functions differ
    on ties). 4× storage reduction for float32 embeddings; the dequantized
    dot is within 1/127 relative error, standard for ANN candidate scans.
    """
    mx = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    staged = df.withColumn("__mx", mx)
    qvec = F.when(
        F.col("__mx") == 0,
        F.transform(F.col(vec_col), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * 127.0 / F.col("__mx") + F.lit(0.5)
            ).cast("int"),
        )
    )
    return staged.select(
        "vec_id",
        (F.col("__mx") / 127.0).alias("scale"),
        qvec.alias("qvec"),
    )


@query("q_embed_quantize", _QUANT_ORACLE)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(e)
    # posexplode so only scalar columns reach the hash compare; idx is
    # 1-based to match the oracle's generate_series.
    return q.select("vec_id", "scale", F.posexplode("qvec")).select(
        "vec_id",
        "scale",
        (F.col("pos") + 1).cast("bigint").alias("idx"),
        F.col("col").alias("q"),
    )
