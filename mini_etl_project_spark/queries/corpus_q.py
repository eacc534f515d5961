"""X-composite: the full LLM pretraining-corpus preparation pipeline as
ONE declarative plan — quality filter → exact dedup → MinHash/LSH
near-dup removal → per-(lang, source) corpus stats.

This is the shape a 100 TB training-data job actually takes, built from
the engine's own operators (operators/textops.py, operators/dedup.py) and
checked end-to-end against a single DuckDB statement. The corpus is the
documents table plus planted exact copies (doc_id+20000) and truncated
near-copies (doc_id+10000), so every stage provably removes something.

Scale posture: the quality scorer is pure expression arithmetic (one
pass, no shuffle); exact dedup is one window over the text hash; near-dup
is the banded-LSH ladder (no all-pairs — candidates come from band-bucket
joins, exact Jaccard only on candidates); the final drop is a broadcast
anti-join on the (tiny) near-dup id set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_etl_project_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows,
)
from mini_etl_project_spark.operators.textops import quality_score, tokens
from mini_etl_project_spark.queries import query
from mini_etl_project_spark.queries.helpers import sql_davg
from mini_etl_project_spark.session import load_table

# Portable 60-bit hash (see operators/textops.py::hash64).
_HASH64 = (
    "CAST(('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' || {v}), 1, 15)) "
    "AS BIGINT)"
)

_STOPS_SQL = "'the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'"

_PRETRAIN_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id AS id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 20000 AS id, text, lang, source
  FROM documents WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 10000 AS id, substring(text, 21) AS text, lang, source
  FROM documents WHERE doc_id < 100),
scored AS (
  SELECT id, text, lang, source,
         LENGTH(text) AS n_chars,
         LEN(string_split_regex(trim(text), '\\s+')) AS n_tok,
         LEN(list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> lower(t) IN ({_STOPS_SQL}))) AS stop_hits
  FROM corpus),
quality AS (
  SELECT id, text, lang, source, n_tok,
         (LEAST(n_chars / 500.0, 1.0)
          + (CASE WHEN CAST(n_chars AS DOUBLE) / GREATEST(n_tok, 1) >= 3
                   AND CAST(n_chars AS DOUBLE) / GREATEST(n_tok, 1) <= 10
                  THEN 1.0 ELSE 0.5 END)
          + (CASE WHEN CAST(stop_hits AS DOUBLE) / GREATEST(n_tok, 1) >= 0.01
                   AND CAST(stop_hits AS DOUBLE) / GREATEST(n_tok, 1) <= 0.6
                  THEN 1.0 ELSE 0.5 END)) / 3 AS quality
  FROM scored),
kept AS (
  SELECT * FROM quality WHERE quality >= 0.6 AND n_tok >= 5),
exact_ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY md5(lower(trim(text))) ORDER BY id) AS rn
  FROM kept),
uniq AS (SELECT id, text, lang, source, n_tok, quality
         FROM exact_ranked WHERE rn = 1),
sh AS (
  SELECT DISTINCT id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(length(text)-4, 1)),
             i -> substring(text, i, 5)))) AS shingle
  FROM uniq),
hashes AS (
  SELECT id, seed.s AS seed,
         {_HASH64.format(seed='seed.s', v='shingle')} AS h
  FROM sh, (SELECT unnest(generate_series(0, 15)) AS s) seed),
sig AS (SELECT id, seed, MIN(h) AS minhash FROM hashes GROUP BY id, seed),
banded AS (
  SELECT id, CAST(FLOOR(seed / 4) AS INT) AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed))
           AS band_key
  FROM sig GROUP BY id, CAST(FLOOR(seed / 4) AS INT)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
neardup AS (
  SELECT DISTINCT b.id AS id
  FROM cand
  JOIN sizes sa ON sa.id = cand.id_a
  JOIN sizes sb ON sb.id = cand.id_b
  JOIN (SELECT a.id AS ia, b.id AS ib, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id) i ON i.ia = cand.id_a AND i.ib = cand.id_b
  JOIN uniq b ON b.id = cand.id_b
  WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.5)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       {sql_davg('quality', 'mean_quality')}
FROM uniq
WHERE id NOT IN (SELECT id FROM neardup)
GROUP BY lang, source
"""


@query("q_corpus_pretrain", _PRETRAIN_ORACLE)
def q_corpus_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    corpus = (
        d.select(F.col("doc_id").alias("id"), "text", "lang", "source")
        .unionByName(
            d.filter(F.col("doc_id") < 50).select(
                (F.col("doc_id") + 20000).alias("id"), "text", "lang", "source"
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") < 100).select(
                (F.col("doc_id") + 10000).alias("id"),
                F.substring(F.col("text"), 21, 1 << 30).alias("text"),
                "lang",
                "source",
            )
        )
    )

    # Stage 1: quality scoring + filter (pure expressions, no shuffle).
    kept = corpus.select(
        "id",
        "text",
        "lang",
        "source",
        F.size(tokens("text")).alias("n_tok"),
        quality_score("text").alias("quality"),
    ).filter((F.col("quality") >= 0.6) & (F.col("n_tok") >= 5))

    # Stage 2: exact dedup, deterministic keep-first (one window over the
    # text hash — single shuffle).
    w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("id")
    uniq = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # Stage 3: MinHash → LSH bands → exact Jaccard on candidates only;
    # drop the higher id of each confirmed pair.
    sh = shingle_rows(uniq, "id", "text", k=5)
    sig = minhash_signatures(sh, num_hashes=16)
    cand = lsh_candidate_pairs(sig, rows_per_band=4)
    pairs = jaccard_pairs(sh, candidates=cand, threshold=0.5)
    neardup = pairs.select(F.col("id_b").alias("id")).distinct()
    final = uniq.join(F.broadcast(neardup), "id", "left_anti")

    # Stage 4: corpus stats per (lang, source).
    return final.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        (
            F.sum(F.col("quality").cast("decimal(38,6)")).cast("double")
            / F.count(F.col("quality"))
        ).alias("mean_quality"),
    )


# -- Quality gate: multi-signal filter decision + survival accounting -------
#
# The composed filtering step a pretraining pipeline actually ships:
# three independent quality signals (length band, alpha-token ratio,
# max-line-repetition) combined into one keep/drop decision, with
# per-source survival rates and per-signal rejection counts so corpus
# owners can see WHICH gate bites. One pass of stateless expressions +
# one keyed aggregate.

_QUALITY_GATE_ORACLE = """
WITH sig AS (
  SELECT source,
         n_chars BETWEEN 120 AND 20000 AS ok_len,
         CAST(len(regexp_extract_all(text, '[A-Za-z]{2,}')) AS DOUBLE)
           / GREATEST(len(regexp_extract_all(trim(text), '\\S+')), 1)
           >= 0.6 AS ok_alpha,
         COALESCE((
           SELECT MAX(cnt) FROM (
             SELECT COUNT(*) AS cnt
             FROM unnest(string_split(text, chr(10))) AS t(line)
             WHERE trim(line) <> ''
             GROUP BY line)
         ), 0) <= 2 AS ok_rep
  FROM documents)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN ok_len AND ok_alpha AND ok_rep
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT)
         AS rej_len,
       CAST(SUM(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS BIGINT)
         AS rej_alpha,
       CAST(SUM(CASE WHEN NOT ok_rep THEN 1 ELSE 0 END) AS BIGINT)
         AS rej_rep,
       CAST(SUM(CASE WHEN ok_len AND ok_alpha AND ok_rep
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS survival_rate
FROM sig GROUP BY source
"""


@query("q_corpus_quality_gate", _QUALITY_GATE_ORACLE)
def q_corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ok_len = F.col("n_chars").between(120, 20000)
    ok_alpha = (
        F.regexp_count("text", F.lit(r"[A-Za-z]{2,}")).cast("double")
        / F.greatest(
            F.regexp_count(F.trim("text"), F.lit(r"\S+")), F.lit(1)
        )
    ) >= 0.6
    # max repetition of any non-empty line within the doc, expression-only
    lines = F.filter(
        F.split("text", "\n"), lambda x: F.trim(x) != ""
    )
    max_rep = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(lines),
                lambda u: F.size(F.filter(lines, lambda x: x == u)),
            )
        ),
        F.lit(0),
    )
    ok_rep = max_rep <= 2
    sig = d.select(
        "source",
        ok_len.alias("ok_len"),
        ok_alpha.alias("ok_alpha"),
        ok_rep.alias("ok_rep"),
    )
    keep = F.col("ok_len") & F.col("ok_alpha") & F.col("ok_rep")
    return sig.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(keep.cast("long")).cast("bigint").alias("n_kept"),
        F.sum((~F.col("ok_len")).cast("long")).cast("bigint").alias("rej_len"),
        F.sum((~F.col("ok_alpha")).cast("long"))
        .cast("bigint")
        .alias("rej_alpha"),
        F.sum((~F.col("ok_rep")).cast("long")).cast("bigint").alias("rej_rep"),
        (F.sum(keep.cast("long")).cast("double") / F.count("*")).alias(
            "survival_rate"
        ),
    )


# -- X154 fixed-size overlapping chunking (training-sample windowing) ------
#
# The standard pretraining preprocessing step the reference's single-node
# pipeline cannot express at scale: split every document into fixed-size
# token windows (size 24, stride 16) so long documents become multiple
# training samples with overlap for context continuity.
#
# Scale posture: the whole operator is ONE stateless projection — the
# chunk list is built with sequence/transform/slice (JVM higher-order
# functions), per-chunk hashes and the per-doc signature fold with
# transform + concat_ws, and the token accounting with aggregate().  No
# explode, no shuffle, no UDF: at 100 TB this is a map-only stage that
# rides whatever partitioning the scan already has.

_CHUNK_SIZE = 24
_CHUNK_STRIDE = 16

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\\s+') AS toks,
         LEN(string_split_regex(trim(text), '\\s+')) AS n
  FROM documents),
idx AS (
  SELECT doc_id, n, toks,
         UNNEST(range(0, CAST(FLOOR((n-1)/{_CHUNK_STRIDE}) AS BIGINT)+1)) AS i
  FROM t),
chunks AS (
  SELECT doc_id, n, i,
         toks[i*{_CHUNK_STRIDE}+1 : i*{_CHUNK_STRIDE}+{_CHUNK_SIZE}] AS chunk
  FROM idx)
SELECT doc_id,
       MAX(n) AS n_tokens,
       COUNT(*) AS n_chunks,
       CAST(SUM(LEN(chunk)) AS BIGINT) AS sum_chunk_tokens,
       md5(string_agg(md5(array_to_string(chunk, ' ')), '' ORDER BY i))
         AS chunks_sig
FROM chunks GROUP BY doc_id
"""


@query("q_corpus_chunk_overlap", _CHUNK_ORACLE)
def q_corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", tokens("text").alias("toks")
    ).withColumn("n", F.size("toks"))
    chunked = t.withColumn(
        "chunks",
        F.expr(
            f"transform(sequence(0, int(floor((n-1)/{_CHUNK_STRIDE}))),"
            f" i -> slice(toks, i*{_CHUNK_STRIDE}+1, {_CHUNK_SIZE}))"
        ),
    )
    return chunked.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.size("chunks").cast("bigint").alias("n_chunks"),
        F.expr(
            "cast(aggregate(chunks, 0L, (acc, c) -> acc + size(c)) as bigint)"
        ).alias("sum_chunk_tokens"),
        F.md5(
            F.concat_ws(
                "", F.expr("transform(chunks, c -> md5(array_join(c, ' ')))")
            )
        ).alias("chunks_sig"),
    )


# -- X291 first-occurrence passage dedup -----------------------------------
#
# RefinedWeb-style sub-document dedup: every document is cut into 3-word
# passages (shuffle-free — ``slice`` over the split array, one generated
# index per passage, no explode of words), each passage keeps only its
# globally FIRST occurrence (minimum packed (doc_id, seg) over the
# corpus), and the survivors are reassembled in order. The global argmin
# is one groupBy on the passage text + one join back — the only
# corpus-wide exchange, keyed by content hash, exactly the shape that
# scales. Output pins both the accounting and the reassembled bytes
# (md5), so a wrong keep/drop or a wrong order fails the gate.

_PASSAGE_W = 3

_PASSAGE_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
segs AS (
  SELECT doc_id, t.k AS seg,
         array_to_string(
           list_slice(arr, t.k * {_PASSAGE_W} + 1,
                      t.k * {_PASSAGE_W} + {_PASSAGE_W}), ' ') AS s
  FROM docs, unnest(generate_series(
        0, CAST(CEIL(len(arr) / {_PASSAGE_W}.0) AS BIGINT) - 1)) t(k)),
firsts AS (
  SELECT s, MIN(doc_id * 1000 + seg) AS first_packed FROM segs GROUP BY s),
flagged AS (
  SELECT g.doc_id, g.seg, g.s,
         CASE WHEN g.doc_id * 1000 + g.seg = f.first_packed
              THEN 1 ELSE 0 END AS kept
  FROM segs g JOIN firsts f ON f.s = g.s)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped,
       md5(COALESCE(string_agg(CASE WHEN kept = 1 THEN s END, ' '
                               ORDER BY seg), '')) AS kept_md5
FROM flagged GROUP BY doc_id
"""


@query("q_corpus_passage_dedup", _PASSAGE_ORACLE)
def q_corpus_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = _PASSAGE_W
    docs = d.select("doc_id", F.split("text", " ").alias("arr"))
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("arr") / float(w)).cast("bigint")
                    - F.lit(1),
                ),
                lambda k: F.concat_ws(
                    " ", F.slice(F.col("arr"), k * w + 1, w)
                ),
            )
        ).alias("seg", "s"),
    )
    firsts = segs.groupBy("s").agg(
        F.min(F.col("doc_id") * 1000 + F.col("seg")).alias("first_packed")
    )
    flagged = segs.join(firsts, "s").select(
        "doc_id",
        "seg",
        "s",
        F.when(
            F.col("doc_id") * 1000 + F.col("seg") == F.col("first_packed"),
            1,
        )
        .otherwise(0)
        .alias("kept"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_segs"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        (F.count("*") - F.sum("kept")).cast("bigint").alias("n_dropped"),
        F.md5(
            F.coalesce(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("kept") == 1,
                                    F.struct("seg", "s"),
                                )
                            )
                        ),
                        lambda x: x["s"],
                    ),
                ),
                F.lit(""),
            )
        ).alias("kept_md5"),
    )


# -- X342: temperature-scaled corpus mixing --------------------------------
# The multilingual-pretraining sampling rule: source weights ∝ n^α with
# α = 0.5 — upsampling the tail without letting the head dominate. The
# only non-rational op is sqrt (IEEE correctly rounded in both engines);
# the weight normalization and target allocation mirror op-for-op, and
# the final target counts use exact floor division over a decimal-summed
# denominator.

_TEMP_MIX_ORACLE = """
WITH src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source),
w AS (
  SELECT source, n, SQRT(CAST(n AS DOUBLE)) AS wt FROM src),
tot AS (
  SELECT CAST(SUM(CAST(wt AS DECIMAL(38,12))) AS DOUBLE) AS z,
         CAST(SUM(n) AS BIGINT) AS total_docs
  FROM w)
SELECT w.source, w.n,
       w.wt / tot.z AS sample_prob,
       CAST(FLOOR(w.wt / tot.z * tot.total_docs) AS BIGINT)
         AS target_docs
FROM w, tot
"""


@query("q_corpus_temperature_mix", _TEMP_MIX_ORACLE)
def q_corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = src.withColumn("wt", F.sqrt(F.col("n").cast("double")))
    tot = w.agg(
        F.sum(F.col("wt").cast("decimal(38,12)")).cast("double").alias("z"),
        F.sum("n").cast("bigint").alias("total_docs"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        (F.col("wt") / F.col("z")).alias("sample_prob"),
        F.floor(F.col("wt") / F.col("z") * F.col("total_docs"))
        .cast("bigint")
        .alias("target_docs"),
    )


# -- X343: preference-pair construction (RLHF-style chosen/rejected) -------
# Build (chosen, rejected) training pairs per (source, lang) prompt
# group: highest- vs lowest-scoring document under a deterministic
# integer quality score (length + distinct-token bonus − repetition
# penalty), doc_id tie-break. Keyed argmax/argmin via min/max over
# (score, doc_id) structs — one groupBy, no windows over facts.

_PREF_ORACLE = """
WITH scored AS (
  SELECT source, lang, doc_id,
         CAST(
           len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> ''))
           + 2 * len(list_distinct(
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '')))
         AS BIGINT) AS score
  FROM documents),
best AS (
  SELECT source, lang,
         MAX(struct_pack(s := score, d := -doc_id)) AS b,
         MIN(struct_pack(s := score, d := doc_id)) AS w2,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM scored GROUP BY source, lang)
SELECT source, lang, n_docs,
       CAST(-(b.d) AS BIGINT) AS chosen_doc,
       CAST(b.s AS BIGINT) AS chosen_score,
       CAST(w2.d AS BIGINT) AS rejected_doc,
       CAST(w2.s AS BIGINT) AS rejected_score
FROM best
"""


@query("q_corpus_preference_pairs", _PREF_ORACLE)
def q_corpus_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
    )
    scored = d.select(
        "source",
        "lang",
        "doc_id",
        (F.size(toks) + 2 * F.size(F.array_distinct(toks)))
        .cast("bigint")
        .alias("score"),
    )
    best = scored.groupBy("source", "lang").agg(
        F.max(
            F.struct(
                F.col("score").alias("s"), (-F.col("doc_id")).alias("d")
            )
        ).alias("b"),
        F.min(
            F.struct(F.col("score").alias("s"), F.col("doc_id").alias("d"))
        ).alias("w2"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    return best.select(
        "source",
        "lang",
        "n_docs",
        (-F.col("b.d")).cast("bigint").alias("chosen_doc"),
        F.col("b.s").cast("bigint").alias("chosen_score"),
        F.col("w2.d").cast("bigint").alias("rejected_doc"),
        F.col("w2.s").cast("bigint").alias("rejected_score"),
    )


# -- X344: JSONL round-trip fidelity ---------------------------------------
# Serialization audit for interchange with JSONL-based tooling: pack each
# document row to a JSON string, parse it back with the declared schema,
# and prove field-level identity — the md5 of the reconstructed fields
# equals the md5 of the originals, counted per source. Catches quoting,
# unicode-escape, and null-handling drift between writers and readers.

_JSONL_ORACLE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN md5(CAST(doc_id AS VARCHAR) || '|' || text)
                          = md5(CAST(doc_id AS VARCHAR) || '|' || text)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
FROM documents GROUP BY source
"""


@query("q_corpus_jsonl_roundtrip", _JSONL_ORACLE)
def q_corpus_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    packed = d.select(
        "source",
        "doc_id",
        "text",
        F.to_json(F.struct("doc_id", "text", "lang")).alias("line"),
    )
    parsed = packed.select(
        "source",
        "doc_id",
        "text",
        F.from_json(
            "line", "doc_id bigint, text string, lang string"
        ).alias("back"),
    )
    ok = F.md5(
        F.concat(F.col("back.doc_id").cast("string"), F.lit("|"),
                 F.col("back.text"))
    ) == F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias(
            "n_roundtrip_ok"
        ),
    )


# -- X402 Mixture drift: total variation + Hellinger ------------------------
#
# The corpus-mixture health check a training pipeline runs between two
# snapshots: has the source composition drifted? Snapshot A = even
# doc_ids, snapshot B = odd. Total variation distance stays EXACT
# integer — TV = sum|a_i*B - b_i*A| / (2AB), numerator in
# DECIMAL(38,0) (a_i*B ~ 1e24 at 100 TB). The Hellinger affinity
# sum sqrt(a_i*b_i) needs sqrt (correctly rounded per IEEE in both
# engines), accumulated in source order via a sequential fold over the
# BOUNDED per-source aggregate (sources are a small domain; the fact
# scan never sees a float sum). Both engines build bit-identical
# doubles, so the drift scores hash-match. KL/JS are deliberately NOT
# used: ln() is not correctly rounded and differs across libms — TV +
# Hellinger carry the same signal with portable arithmetic.

_MIXDRIFT_ORACLE = """
WITH s AS (
  SELECT source,
         CAST(COUNT(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT) AS a,
         CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT) AS b
  FROM documents GROUP BY source),
t AS (
  SELECT CAST(SUM(a) AS BIGINT) AS a_tot, CAST(SUM(b) AS BIGINT) AS b_tot,
         CAST(COUNT(*) AS BIGINT) AS k_sources
  FROM s),
d AS (
  SELECT CAST(SUM(ABS(CAST(s.a AS DECIMAL(38,0)) * t.b_tot
                      - CAST(s.b AS DECIMAL(38,0)) * t.a_tot))
              AS DECIMAL(38,0)) AS tv_num,
         list_aggregate(
           list(sqrt((CAST(((CAST(s.a AS DECIMAL(38,0)) * s.b) - (CAST(s.a AS DECIMAL(38,0)) * s.b) % 1073741824) / 1073741824 AS DOUBLE) * 1073741824.0 + CAST((CAST(s.a AS DECIMAL(38,0)) * s.b) % 1073741824 AS DOUBLE)))
                ORDER BY s.source),
           'sum') AS bh_raw
  FROM s, t)
SELECT t.k_sources, t.a_tot, t.b_tot,
       (CAST(((d.tv_num) - (d.tv_num) % 1073741824) / 1073741824 AS DOUBLE) * 1073741824.0 + CAST((d.tv_num) % 1073741824 AS DOUBLE))
         / (2.0 * CAST(t.a_tot AS DOUBLE) * CAST(t.b_tot AS DOUBLE))
         AS tv_dist,
       d.bh_raw / sqrt(CAST(t.a_tot AS DOUBLE) * CAST(t.b_tot AS DOUBLE))
         AS bh_affinity,
       sqrt(GREATEST(
         1.0 - d.bh_raw
                 / sqrt(CAST(t.a_tot AS DOUBLE) * CAST(t.b_tot AS DOUBLE)),
         0.0)) AS hellinger
FROM t, d
"""


@query("q_corpus_mixture_drift", _MIXDRIFT_ORACLE)
def q_corpus_mixture_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.queries.helpers import dec_to_double

    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.when(F.col("doc_id") % 2 == 0, 1))
        .cast("bigint")
        .alias("a"),
        F.count(F.when(F.col("doc_id") % 2 == 1, 1))
        .cast("bigint")
        .alias("b"),
    )
    t = s.agg(
        F.sum("a").cast("bigint").alias("a_tot"),
        F.sum("b").cast("bigint").alias("b_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k_sources"),
    )
    st = s.crossJoin(F.broadcast(t))
    ab = F.col("a").cast("decimal(38,0)") * F.col("b")
    d = st.agg(
        F.sum(
            F.abs(
                F.col("a").cast("decimal(38,0)") * F.col("b_tot")
                - F.col("b").cast("decimal(38,0)") * F.col("a_tot")
            )
        )
        .cast("decimal(38,0)")
        .alias("tv_num"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("source"), F.sqrt(dec_to_double(ab)).alias("r")
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, row: acc + row["r"],
        ).alias("bh_raw"),
    )
    ad = F.col("a_tot").cast("double")
    bd = F.col("b_tot").cast("double")
    bh = F.col("bh_raw") / F.sqrt(ad * bd)
    return t.crossJoin(F.broadcast(d)).select(
        "k_sources",
        "a_tot",
        "b_tot",
        (dec_to_double("tv_num") / (F.lit(2.0) * ad * bd)).alias("tv_dist"),
        bh.alias("bh_affinity"),
        F.sqrt(F.greatest(F.lit(1.0) - bh, F.lit(0.0))).alias("hellinger"),
    )


# -- X427 Prefix-cache-aware grouping ---------------------------------------
#
# Modern LLM serving/training caches KV state per shared prompt
# prefix, so batch order matters: examples that share a prefix should
# sit adjacent. This surface orders the corpus by (prefix-key hash,
# doc_id) — the prefix key is the first 3 whitespace tokens — and
# audits the win: adjacent-pair same-prefix counts under the naive
# doc_id order vs the grouped order, plus the reusable-token mass.
# Ordering at scale is the grouped global_rank (range partitions, no
# single-partition sort); adjacency is a rank -> rank+1 self-join
# (the established adjacent-pair shape); counts are exact integers.

_PFX_TOKENS = 3


_PFX_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         array_to_string((string_split(text, ' '))[1:{_PFX_TOKENS}], ' ')
           AS pfx,
         CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
base AS (
  SELECT doc_id, pfx,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS r
  FROM d),
grp AS (
  SELECT doc_id, pfx, n_tokens,
         ROW_NUMBER() OVER (
           ORDER BY CAST(('0x' || substr(md5(pfx), 1, 15)) AS BIGINT),
                    doc_id) AS r
  FROM d),
adj_base AS (
  SELECT CAST(COUNT(CASE WHEN a.pfx = b.pfx THEN 1 END) AS BIGINT) AS same
  FROM base a JOIN base b ON b.r = a.r + 1),
adj_grp AS (
  SELECT CAST(COUNT(CASE WHEN a.pfx = b.pfx THEN 1 END) AS BIGINT) AS same,
         CAST(SUM(CASE WHEN a.pfx = b.pfx THEN {_PFX_TOKENS} ELSE 0 END)
              AS BIGINT) AS reuse_tokens
  FROM grp a JOIN grp b ON b.r = a.r + 1)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_docs,
       adj_base.same AS adjacent_same_baseline,
       adj_grp.same AS adjacent_same_grouped,
       adj_grp.reuse_tokens AS reuse_tokens_grouped
FROM adj_base, adj_grp
"""


@query("q_corpus_prefix_grouping", _PFX_ORACLE)
def q_corpus_prefix_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.rank import global_rank
    from mini_etl_project_spark.queries.sampling_q import hash60

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, _PFX_TOKENS), " ").alias("pfx"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    base = global_rank(
        d.select("doc_id", "pfx"), order=[F.col("doc_id")], rank_col="r"
    )
    grp = global_rank(
        d.withColumn("h", hash60(F.col("pfx"))),
        order=[F.col("h"), F.col("doc_id")],
        rank_col="r",
    )

    def adjacent(df):
        a = df.select(F.col("r").alias("ra"), F.col("pfx").alias("pa"))
        b = df.select(F.col("r").alias("rb"), F.col("pfx").alias("pb"))
        return a.join(b, b.rb == a.ra + 1)

    adj_base = adjacent(base).agg(
        F.count(F.when(F.col("pa") == F.col("pb"), 1))
        .cast("bigint")
        .alias("adjacent_same_baseline")
    )
    adj_grp = adjacent(grp).agg(
        F.count(F.when(F.col("pa") == F.col("pb"), 1))
        .cast("bigint")
        .alias("adjacent_same_grouped"),
        F.sum(
            F.when(F.col("pa") == F.col("pb"), _PFX_TOKENS).otherwise(0)
        )
        .cast("bigint")
        .alias("reuse_tokens_grouped"),
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        n.crossJoin(F.broadcast(adj_base)).crossJoin(F.broadcast(adj_grp))
    )


# -- X430 Span-level extraction F1 ------------------------------------------
#
# The NER/extraction scorecard: two extractors emit token-position
# spans and the audit reports micro precision/recall/F1 of extractor
# B against reference A, per source. Extractor A tags tokens in
# {table, part}; extractor B tags {table, hash} — token positions
# come from ONE posexplode of the whitespace split (the engine's
# tokenizer primitive), true/false positives and false negatives are
# conditional counts on the exploded scan, and P/R/F1 quantize to
# exact integer ppm (2*tp*1e6 DIV (2*tp+fp+fn) — no float ratios).

_SPANF1_ORACLE = """
WITH t AS (
  SELECT d.source, tok.t AS tok
  FROM documents d,
       LATERAL (SELECT UNNEST(string_split(d.text, ' ')) AS t) tok),
c AS (
  SELECT source,
         CAST(COUNT(CASE WHEN tok = 'table' THEN 1 END) AS BIGINT) AS tp,
         CAST(COUNT(CASE WHEN tok = 'hash' THEN 1 END) AS BIGINT) AS fp,
         CAST(COUNT(CASE WHEN tok = 'part' THEN 1 END) AS BIGINT) AS fn
  FROM t GROUP BY source)
SELECT source, tp, fp, fn,
       CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_ppm,
       CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS recall_ppm,
       CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm
FROM c
"""


@query("q_corpus_span_f1", _SPANF1_ORACLE)
def q_corpus_span_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    c = t.groupBy("source").agg(
        F.count(F.when(F.col("tok") == "table", 1)).cast("bigint").alias("tp"),
        F.count(F.when(F.col("tok") == "hash", 1)).cast("bigint").alias("fp"),
        F.count(F.when(F.col("tok") == "part", 1)).cast("bigint").alias("fn"),
    )
    return c.select(
        "source",
        "tp",
        "fp",
        "fn",
        F.expr("CAST(tp * 1000000 DIV (tp + fp) AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.expr("CAST(tp * 1000000 DIV (tp + fn) AS BIGINT)").alias(
            "recall_ppm"
        ),
        F.expr(
            "CAST(2 * tp * 1000000 DIV (2 * tp + fp + fn) AS BIGINT)"
        ).alias("f1_ppm"),
    )


# =============================================================================
# Round-9 LLM-pipeline wave (X507-X509): curriculum ordering,
# conversation assembly, and the perplexity quality filter.
# =============================================================================

_TOKS9 = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


# -- X507 curriculum ordering ---------------------------------------------------
#
# Curriculum learning's data side: order the corpus easy -> hard and cut
# it into three training phases. Difficulty here is the integer
# mean-word-length milli-score (n_chars*1000 DIV n_tokens — exact, no
# doubles); phases are equal-frequency thirds of the GLOBAL difficulty
# rank with (difficulty, doc_id) tie-break, so the assignment is total,
# deterministic, and partitioning-independent. Emits per-phase
# accounting (doc count, token budget, difficulty band) — what a
# curriculum scheduler consumes. The global rank is the distributed
# range-partition rank (operators/rank.py), never a single-partition
# sort at scale.

_CURRICULUM_ORACLE = f"""
WITH d AS (
  SELECT doc_id, LEN({_TOKS9}) AS n_tok,
         LENGTH(text) * 1000 // GREATEST(LEN({_TOKS9}), 1) AS difficulty
  FROM documents
  WHERE LEN({_TOKS9}) > 0),
ranked AS (
  SELECT doc_id, n_tok, difficulty,
         ROW_NUMBER() OVER (ORDER BY difficulty, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM d)
SELECT CAST((rn - 1) * 3 // n AS BIGINT) AS phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS token_budget,
       CAST(MIN(difficulty) AS BIGINT) AS min_difficulty,
       CAST(MAX(difficulty) AS BIGINT) AS max_difficulty
FROM ranked GROUP BY 1
"""


@query("q_corpus_curriculum", _CURRICULUM_ORACLE)
def q_corpus_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.rank import global_rank

    doc = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
    )
    d = doc.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.expr(
            "CAST(LENGTH(text) * 1000 DIV GREATEST(SIZE("
            "FILTER(SPLIT(TRIM(text), '\\\\s+'), t -> t != ''))"
            ", 1) AS BIGINT)"
        ).alias("difficulty"),
    ).filter(F.col("n_tok") > 0)
    ranked = global_rank(
        d, order=[F.col("difficulty"), F.col("doc_id")], rank_col="rn",
        n_col="n",
    )
    return (
        ranked.select(
            F.expr("CAST((rn - 1) * 3 DIV n AS BIGINT)").alias("phase"),
            "n_tok",
            "difficulty",
        )
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("token_budget"),
            F.min("difficulty").cast("bigint").alias("min_difficulty"),
            F.max("difficulty").cast("bigint").alias("max_difficulty"),
        )
    )


# -- X508 conversation assembly --------------------------------------------------
#
# The SFT-data primitive: assemble each user's event stream into an
# ordered multi-turn conversation record with role tags and a
# reproducible transcript fingerprint (md5 of the order-pinned
# role:type:cents serialization — ties on ts pinned by event_id, the
# house rule). Grouped collect + sort stays keyed on user_id; at 100 TB
# this is one shuffle on the conversation key, which is the minimum any
# conversation assembler pays.

_CONV_ORACLE = """
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('click', 'view') THEN 'user'
              ELSE 'assistant' END AS role,
         event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(CASE WHEN role = 'user' THEN 1 END) AS BIGINT)
         AS n_user_turns,
       CAST(COUNT(CASE WHEN role = 'assistant' THEN 1 END) AS BIGINT)
         AS n_assistant_turns,
       md5(string_agg(role || ':' || event_type || ':'
                      || CAST(cents AS VARCHAR),
                      '|' ORDER BY ts, event_id)) AS transcript_fp
FROM t GROUP BY user_id
"""


@query("q_corpus_conversation_assembly", _CONV_ORACLE)
def q_corpus_conversation_assembly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    role = F.when(
        F.col("event_type").isin("click", "view"), F.lit("user")
    ).otherwise(F.lit("assistant"))
    t = ev.select(
        "user_id",
        "ts",
        "event_id",
        role.alias("role"),
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    line = F.concat_ws(
        ":", F.col("role"), F.col("event_type"), F.col("cents").cast("string")
    )
    return (
        t.select(
            "user_id",
            "role",
            F.struct("ts", "event_id", line.alias("line")).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.count(F.when(F.col("role") == "user", 1))
            .cast("bigint")
            .alias("n_user_turns"),
            F.count(F.when(F.col("role") == "assistant", 1))
            .cast("bigint")
            .alias("n_assistant_turns"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(F.collect_list("s")),
                        lambda s: s["line"],
                    ),
                )
            ).alias("transcript_fp"),
        )
    )


# -- X509 perplexity quality filter ----------------------------------------------
#
# The CCNet-style pretraining gate: score every document's mean
# surprisal under the corpus unigram LM (X491's machinery — one
# portable ln per VOCAB word) and DROP everything above the corpus mean
# (the "high-perplexity tail" rule), reporting per-(lang, source)
# survival accounting. The corpus-mean threshold is a distributed qsum
# over per-doc surprisals (full precision, order-independent), so the
# whole filter is oracle-exact end to end. Two corpus scans (LM
# estimate + scoring) — the floor any LM-filter pays.

_PPLX_FILTER_ORACLE = f"""
WITH toks AS (SELECT doc_id, lang, source, {_TOKS9} AS tk FROM documents),
tw AS (
  SELECT doc_id, u.i AS i, u.w AS w
  FROM (SELECT doc_id,
               UNNEST(list_transform(generate_series(1, LEN(tk)),
                                     i -> struct_pack(i := i,
                                                      w := tk[i]))) AS u
        FROM toks)),
ucnt AS (SELECT w AS uw, CAST(COUNT(*) AS BIGINT) AS cu FROM tw GROUP BY 1),
utot AS (SELECT CAST(SUM(cu) AS BIGINT) AS tu FROM ucnt),
pv AS (
  SELECT uw, CAST(cu AS DOUBLE) / CAST(tu AS DOUBLE) AS v
  FROM ucnt CROSS JOIN utot),
lns AS ({{LN_LAYER}}),
perdoc AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         -(list_reduce(list(l.lnv ORDER BY t.i), (a, x) -> a + x))
           / CAST(COUNT(*) AS DOUBLE) AS surp
  FROM tw t JOIN lns l ON t.w = l.uw
  GROUP BY 1),
thresh AS (
  SELECT {{QSUM_S}} / CAST(COUNT(*) AS DOUBLE) AS mean_surp,
         CAST(COUNT(*) AS BIGINT) AS n_scored
  FROM perdoc)
SELECT d.lang, d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(CASE WHEN p.surp <= t.mean_surp THEN 1 END) AS BIGINT)
         AS n_kept,
       CAST(COUNT(CASE WHEN p.surp <= t.mean_surp THEN 1 END) * 1000000
            // COUNT(*) AS BIGINT) AS survival_ppm
FROM perdoc p
JOIN documents d USING (doc_id)
CROSS JOIN thresh t
GROUP BY 1, 2
"""


def _pplx_filter_oracle() -> str:
    from mini_etl_project_spark.queries.helpers import (
        sql_ln_layer,
        sql_qsum_expr,
    )

    return _PPLX_FILTER_ORACLE.replace(
        "{LN_LAYER}", sql_ln_layer("pv", "uw")
    ).replace("{QSUM_S}", sql_qsum_expr("surp"))


@query("q_corpus_perplexity_filter", _pplx_filter_oracle())
def q_corpus_perplexity_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mini_etl_project_spark.queries.helpers import (
        fold_sum,
        pln_finish,
        pln_k,
        pln_red,
        qsum,
    )

    doc = load_table(spark, sf_dir, "documents")
    toks = doc.select(
        "doc_id",
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
        ).alias("tk"),
    )
    tw = toks.select("doc_id", F.posexplode("tk").alias("i", "w"))
    ucnt = tw.groupBy(F.col("w").alias("uw")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cu")
    )
    utot = ucnt.agg(F.sum("cu").cast("bigint").alias("tu"))
    pv = ucnt.crossJoin(F.broadcast(utot)).select(
        "uw",
        (F.col("cu").cast("double") / F.col("tu").cast("double")).alias("v"),
    )
    lns = (
        pv.withColumn("red", pln_red(F.col("v")))
        .withColumn("kk", pln_k(F.col("v")))
        .select("uw", pln_finish(F.col("red"), F.col("kk")).alias("lnv"))
    )
    j = tw.join(F.broadcast(lns), tw["w"] == lns["uw"]).select(
        "doc_id", "i", "lnv"
    )
    perdoc = (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct("i", F.col("lnv").alias("l")))
            ).alias("ps"),
        )
        .select(
            "doc_id",
            (
                (-fold_sum(F.transform("ps", lambda p: p["l"])))
                / F.col("n_tokens").cast("double")
            ).alias("surp"),
        )
        # consumed by the threshold aggregate AND the survival join —
        # checkpoint so the two corpus scans happen exactly once
        .localCheckpoint(eager=True)
    )
    thresh = perdoc.agg(
        qsum("surp", "qs"), F.count(F.lit(1)).cast("bigint").alias("n_scored")
    ).select(
        (F.col("qs") / F.col("n_scored").cast("double")).alias("mean_surp")
    )
    kept = F.count(
        F.when(F.col("surp") <= F.col("mean_surp"), 1)
    ).cast("bigint")
    return (
        perdoc.join(doc.select("doc_id", "lang", "source"), "doc_id")
        .crossJoin(F.broadcast(thresh))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            kept.alias("n_kept"),
            F.expr(
                "CAST(COUNT(CASE WHEN surp <= mean_surp THEN 1 END)"
                " * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("survival_ppm"),
        )
    )


# -- X513-X515: RLHF/SFT candidate-selection primitives ----------------------
#
# The reward-model stage of a training-data pipeline: per prompt
# (user_id), n candidate generations (events) each carrying a reward
# (value, held exactly as cents). Three selection primitives a 100 TB
# post-training corpus job needs, each a SINGLE keyed shuffle with
# output bounded by |prompts|:
#
# - X513 best-of-n rejection sampling: keep the argmax-reward candidate
#   (deterministic tie-break: smallest event_id) and report the
#   acceptance margin over the runner-up.
# - X514 DPO preference pairs: (chosen, rejected) = (argmax, argmin)
#   per prompt, strictly positive reward gap required (equal-reward
#   pairs carry no preference signal).
# - X515 GRPO group-relative advantage: z-score of the best candidate
#   against its OWN prompt's candidate group (mean/std ddof=1), the
#   group-normalized advantage GRPO-style RL training uses. Moments
#   come from exact integer/decimal sums (the q_ml_cohens_d lane), so
#   mean/sd/z are single correctly-rounded double ops on bit-identical
#   inputs — engine-portable without qsum.

_BESTOFN_ORACLE = """
WITH c AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC,
                                     event_id) AS rn
  FROM events)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       MAX(CASE WHEN rn = 1 THEN event_id END) AS best_event_id,
       MAX(CASE WHEN rn = 1 THEN cents END) AS best_cents,
       MAX(CASE WHEN rn = 1 THEN cents END)
         - MAX(CASE WHEN rn = 2 THEN cents END) AS margin_cents
FROM c GROUP BY user_id
"""


@query("q_corpus_best_of_n", _BESTOFN_ORACLE)
def q_corpus_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X513: best-of-n rejection sampling. One window shuffle on the
    prompt key; the following groupBy rides the same hash partitioning
    (no second exchange). Output = one row per prompt."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("user_id").orderBy(
        F.col("cents").desc(), F.col("event_id").asc()
    )
    c = ev.select("user_id", "event_id", cents.alias("cents")).withColumn(
        "rn", F.row_number().over(w)
    )
    best = F.max(F.when(F.col("rn") == 1, F.col("cents")))
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.max(F.when(F.col("rn") == 1, F.col("event_id"))).alias(
            "best_event_id"
        ),
        best.alias("best_cents"),
        (best - F.max(F.when(F.col("rn") == 2, F.col("cents")))).alias(
            "margin_cents"
        ),
    )


_DPO_ORACLE = """
WITH c AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC,
                                     event_id) AS rn_hi,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ROUND(value * 100) AS BIGINT) ASC,
                                     event_id) AS rn_lo
  FROM events
  WHERE value IS NOT NULL),
p AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         MAX(CASE WHEN rn_hi = 1 THEN event_id END) AS chosen_event_id,
         MAX(CASE WHEN rn_hi = 1 THEN cents END) AS chosen_cents,
         MAX(CASE WHEN rn_lo = 1 THEN event_id END) AS rejected_event_id,
         MAX(CASE WHEN rn_lo = 1 THEN cents END) AS rejected_cents
  FROM c GROUP BY user_id)
SELECT user_id, n_candidates, chosen_event_id, chosen_cents,
       rejected_event_id, rejected_cents,
       chosen_cents - rejected_cents AS gap_cents
FROM p
WHERE n_candidates >= 2 AND chosen_cents - rejected_cents >= 1
"""


@query("q_corpus_dpo_pairs", _DPO_ORACLE)
def q_corpus_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X514: DPO preference-pair construction. ONE groupBy (struct
    min/max carry the argmin/argmax with their tie-breaks — no window,
    no self-join); map-side partials make it a straight keyed agg.

    NULL rewards are filtered EXPLICITLY on both engines (round-11 ADVICE
    pin): Spark's min(struct) sorts NULL cents first while DuckDB's ORDER
    BY defaults to NULLS LAST — without the filter the NULL convention
    would be an accident of the data rather than part of the contract."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    c = ev.filter(F.col("value").isNotNull()).select(
        "user_id", "event_id", cents.alias("cents")
    )
    # struct ordering is lexicographic: max picks highest cents, then
    # highest -event_id = SMALLEST event_id (mirrors the oracle's
    # ORDER BY cents DESC, event_id); min picks lowest cents, then
    # smallest event_id directly.
    hi = F.max(F.struct(F.col("cents"), (-F.col("event_id")).alias("nid")))
    lo = F.min(F.struct(F.col("cents"), F.col("event_id").alias("pid")))
    p = c.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        hi.alias("hi"),
        lo.alias("lo"),
    )
    return (
        p.select(
            "user_id",
            "n_candidates",
            (-F.col("hi.nid")).alias("chosen_event_id"),
            F.col("hi.cents").alias("chosen_cents"),
            F.col("lo.pid").alias("rejected_event_id"),
            F.col("lo.cents").alias("rejected_cents"),
            (F.col("hi.cents") - F.col("lo.cents")).alias("gap_cents"),
        )
        .filter((F.col("n_candidates") >= 2) & (F.col("gap_cents") >= 1))
    )


def _grpo_oracle() -> str:
    from mini_etl_project_spark.queries.helpers import sql_dec_to_double

    num = sql_dec_to_double(
        "CAST(q AS DECIMAL(38,0)) * n - CAST(s AS DECIMAL(38,0)) * s"
    )
    return f"""
WITH c AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC,
                                     event_id) AS rn
  FROM events),
g AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(CAST(cents AS DECIMAL(28,0)) * cents) AS DECIMAL(38,0))
           AS q,
         MAX(CASE WHEN rn = 1 THEN event_id END) AS best_event_id,
         MAX(CASE WHEN rn = 1 THEN cents END) AS best_cents
  FROM c GROUP BY user_id),
pos AS (
  SELECT c.user_id,
         CAST(COUNT(CASE WHEN c.cents * g.n > g.s THEN 1 END) AS BIGINT)
           AS n_pos
  FROM c JOIN g USING (user_id) GROUP BY c.user_id)
SELECT g.user_id,
       g.n AS n_candidates,
       g.s AS sum_cents,
       g.best_event_id,
       g.best_cents,
       pos.n_pos,
       CASE WHEN CAST(q AS DECIMAL(38,0)) * n
                 - CAST(s AS DECIMAL(38,0)) * s = 0 THEN NULL
            ELSE (CAST(g.best_cents AS DOUBLE) - CAST(s AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 / sqrt({num} / CAST(n AS DOUBLE)
                        / (CAST(n AS DOUBLE) - 1.0))
       END AS adv_best
FROM g JOIN pos USING (user_id)
WHERE g.n >= 2
"""


@query("q_corpus_grpo_advantage", _grpo_oracle())
def q_corpus_grpo_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X515: GRPO group-relative advantage of the best candidate.
    Moments per prompt from ONE keyed agg (exact BIGINT/DECIMAL sums);
    n_pos (candidates above their group mean) compares in exact
    integers (cents*n > s avoids any double compare); the z itself is
    three correctly-rounded double ops on bit-identical inputs. The
    per-candidate re-join for n_pos rides the same hash partitioning.
    Zero-variance groups yield NULL advantage (decimal-exact gate)."""
    from mini_etl_project_spark.queries.helpers import dec_to_double

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    c = ev.select("user_id", "event_id", cents.alias("cents"))
    # Group moments as WINDOW aggregates over the prompt key instead of
    # a groupBy + re-join: the per-row n_pos comparison then reads its
    # own group's (n, s) in place — ONE scan, ONE key shuffle (both
    # window specs and the groupBy share the user_id partitioning).
    wp = Window.partitionBy("user_id")
    wo = wp.orderBy(F.col("cents").desc(), F.col("event_id").asc())
    c2 = c.select(
        "user_id",
        "cents",
        "event_id",
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n"),
        F.sum("cents").over(wp).cast("bigint").alias("s"),
        F.sum(F.col("cents").cast("decimal(28,0)") * F.col("cents"))
        .over(wp)
        .cast("decimal(38,0)")
        .alias("q"),
        F.row_number().over(wo).alias("rn"),
    )
    g = c2.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("q").alias("q"),
        F.max(F.when(F.col("rn") == 1, F.col("event_id"))).alias(
            "best_event_id"
        ),
        F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias("best_cents"),
        F.count(F.when(F.col("cents") * F.col("n") > F.col("s"), 1))
        .cast("bigint")
        .alias("n_pos"),
    )
    num_dec = (
        F.col("q") * F.col("n") - F.col("s").cast("decimal(38,0)") * F.col("s")
    ).cast("decimal(38,0)")
    nd = F.col("n").cast("double")
    adv = (
        F.col("best_cents").cast("double") - F.col("s").cast("double") / nd
    ) / F.sqrt(dec_to_double(num_dec) / nd / (nd - F.lit(1.0)))
    return g.filter(F.col("n") >= 2).select(
        "user_id",
        F.col("n").alias("n_candidates"),
        F.col("s").alias("sum_cents"),
        "best_event_id",
        "best_cents",
        "n_pos",
        F.when(num_dec == 0, F.lit(None).cast("double"))
        .otherwise(adv)
        .alias("adv_best"),
    )
