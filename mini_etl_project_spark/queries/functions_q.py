"""Scalar function coverage — SURVEY.md §2.B Q20 (strings), Q21 (dates),
Q22 (math), Q23 (arrays), Q24 (JSON), Q25 (conditional/null).

Oracle-parity notes (empirically verified):

- ``round()`` is intentionally absent from checked outputs — Spark rounds
  the shortest decimal string (HALF_UP on ``BigDecimal.valueOf``), DuckDB
  rounds the binary double; they disagree on values like 2.675.
- libm-dependent functions (pow/exp/ln) are avoided in checked outputs;
  ``sqrt`` is IEEE-correctly-rounded and therefore portable.
- Array numerics go float→double (exact) with decimal-exact summation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_project_spark.queries import query
from mini_etl_project_spark.queries.helpers import DEC
from mini_etl_project_spark.session import load_table

# -- Q20 string functions --------------------------------------------------

_STRING_ORACLE = """
SELECT p_partkey,
       UPPER(p_brand)                         AS brand_upper,
       LOWER(p_type)                          AS type_lower,
       LENGTH(p_name)                         AS name_len,
       SUBSTRING(p_name, 1, 8)                AS name_prefix,
       p_brand || '/' || p_type               AS brand_type,
       REPLACE(p_type, ' ', '_')              AS type_snake,
       TRIM(p_name)                           AS name_trim,
       LPAD(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
       CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green,
       REGEXP_EXTRACT(p_type, '([A-Z]+)', 1)  AS first_upper_run
FROM part
"""


@query("q_fn_string", _STRING_ORACLE)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_upper_run"),
    )


# -- Q21 date functions ----------------------------------------------------

_DATE_ORACLE = """
SELECT YEAR(o_orderdate)  AS order_year,
       MONTH(o_orderdate) AS order_month,
       COUNT(*) AS n_orders,
       MIN(CAST(o_orderdate AS DATE)) AS first_day,
       CAST(MAX(DATE_TRUNC('month', o_orderdate)) AS TIMESTAMP) AS month_start,
       CAST(MIN(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS DATE) AS first_due
FROM orders
GROUP BY 1, 2
"""


@query("q_fn_date", _DATE_ORACLE)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
            F.max(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
            F.min(F.date_add(F.col("o_orderdate").cast("date"), 30)).alias("first_due"),
        )
    )


_DATEDIFF_ORACLE = """
SELECT l_orderkey, l_linenumber,
       DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
         AS days_to_ship,
       DAYOFWEEK(l_shipdate) + 1 AS ship_dow, -- DuckDB: Sun=0; Spark: Sun=1
       DAYOFYEAR(l_shipdate) AS ship_doy,
       LAST_DAY(CAST(l_shipdate AS DATE)) AS ship_month_end
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_linenumber = 1 AND l_orderkey % 7 = 0
"""


@query("q_fn_datediff", _DATEDIFF_ORACLE)
def q_fn_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 7 == 0))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_ship"
            ),
            F.dayofweek("l_shipdate").alias("ship_dow"),
            F.dayofyear("l_shipdate").alias("ship_doy"),
            F.last_day(F.col("l_shipdate").cast("date")).alias("ship_month_end"),
        )
    )


# -- Q22 math functions ----------------------------------------------------

_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ABS(l_extendedprice - 30000.0)        AS price_dev,
       CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_bucket,
       CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct,
       SQRT(l_extendedprice)                 AS price_sqrt,
       GREATEST(l_tax, l_discount)           AS max_rate,
       LEAST(l_tax, l_discount)              AS min_rate,
       CAST(l_partkey % 10 AS BIGINT)        AS partkey_mod,
       CAST(SIGN(l_extendedprice - 30000.0) AS DOUBLE) AS dev_sign
FROM lineitem
WHERE l_orderkey % 13 = 0
"""


@query("q_fn_math", _MATH_ORACLE)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 13 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("price_dev"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        (F.col("l_partkey") % 10).cast("bigint").alias("partkey_mod"),
        F.signum(F.col("l_extendedprice") - 30000.0).alias("dev_sign"),
    )


# -- Q25 conditional / null functions --------------------------------------

_COND_ORACLE = """
SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END                       AS bal_tier,
       COUNT(*)                                   AS n_customers,
       COUNT(NULLIF(c_mktsegment, 'BUILDING'))    AS n_non_building,
       COUNT(*) - COUNT(NULLIF(c_mktsegment, 'BUILDING')) AS n_building,
       MIN(COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'zzz')) AS min_seg
FROM customer
GROUP BY 1
"""


@query("q_fn_conditional", _COND_ORACLE)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    non_building = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        c.groupBy(
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("bal_tier")
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.count(non_building).alias("n_non_building"),
            (F.count("*") - F.count(non_building)).alias("n_building"),
            F.min(F.coalesce(non_building, F.lit("zzz"))).alias("min_seg"),
        )
    )


# -- Q23 array functions (over embeddings) ---------------------------------
# float32 → double is exact, so per-element access matches bit-for-bit;
# whole-vector sums use decimal-exact accumulation via explode.

_ARRAY_ORACLE = """
SELECT vec_id,
       LEN(embedding)                             AS dim,
       CAST(embedding[1]  AS DOUBLE)              AS first_elem,
       CAST(embedding[64] AS DOUBLE)              AS last_elem,
       CAST(LIST_CONTAINS(embedding, 0.0) AS INT) AS has_zero
FROM embeddings
WHERE vec_id % 5 = 0
"""


@query("q_fn_array_access", _ARRAY_ORACLE)
def q_fn_array_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") % 5 == 0).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", 64).cast("double").alias("last_elem"),
        F.array_contains("embedding", 0.0).cast("int").alias("has_zero"),
    )


_ARRAY_AGG_ORACLE = """
SELECT vec_id,
       COUNT(*) AS dim,
       CAST(SUM(CAST(CAST(elem AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE)
         AS vec_sum,
       CAST(SUM(CAST(CAST(elem AS DOUBLE) * CAST(elem AS DOUBLE)
                     AS DECIMAL(38,10))) AS DOUBLE) AS vec_sqnorm,
       CAST(MAX(CAST(elem AS DOUBLE)) AS DOUBLE) AS vec_max
FROM (SELECT vec_id, UNNEST(embedding) AS elem FROM embeddings
      WHERE vec_id < 100)
GROUP BY vec_id
"""


@query("q_fn_array_agg", _ARRAY_AGG_ORACLE)
def q_fn_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    elem = F.col("elem").cast("double")
    return (
        e.filter(F.col("vec_id") < 100)
        .select("vec_id", F.explode("embedding").alias("elem"))
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("dim"),
            F.sum(elem.cast("decimal(38,10)")).cast("double").alias("vec_sum"),
            F.sum((elem * elem).cast("decimal(38,10)")).cast("double").alias("vec_sqnorm"),
            F.max(elem).alias("vec_max"),
        )
    )


# -- Q24 JSON functions (over events.props) --------------------------------

_JSON_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(CASE WHEN CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) > 50
                  THEN 1 END) AS n_high_k
FROM events
GROUP BY event_type
"""


@query("q_fn_json", _JSON_ORACLE)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k > 50, 1)).alias("n_high_k"),
    )


# -- Q24 structured JSON: from_json → typed struct -------------------------

_JSON_STRUCT_ORACLE = """
SELECT k_value, COUNT(*) AS n
FROM (SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_value
      FROM events)
GROUP BY k_value
"""


@query("q_fn_json_struct", _JSON_STRUCT_ORACLE)
def q_fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        F.from_json("props", "k BIGINT").alias("p")
    )
    return parsed.groupBy(F.col("p.k").alias("k_value")).agg(F.count("*").alias("n"))


# -- Q23+ array higher-order functions (transform/filter/exists/aggregate) --
# The HOFs run JVM-side inside codegen; the oracle recomputes each result
# relationally (unnest + conditional aggregation) — no reliance on DuckDB
# list-lambda parity.

_HOF_ORACLE = """
SELECT e.vec_id,
       CAST(SUM(CASE WHEN CAST(x.v AS DOUBLE) > 0 THEN 1 ELSE 0 END) AS INTEGER)
         AS n_pos,
       BOOL_OR(ABS(CAST(x.v AS DOUBLE)) > 2.0) AS any_big,
       CAST(SUM(CAST(CAST(x.v AS DOUBLE) * CAST(x.v AS DOUBLE)
                AS DECIMAL(38,10))) AS DOUBLE) AS sum_sq
FROM embeddings e, unnest(e.embedding) x(v)
GROUP BY e.vec_id
"""


@query("q_fn_array_hof", _HOF_ORACLE)
def q_fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.functions.vectors import sqnorm_exact

    e = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(arr, lambda x: x.cast("double") > 0)).alias("n_pos"),
        F.exists(arr, lambda x: F.abs(x.cast("double")) > 2.0).alias("any_big"),
        sqnorm_exact("embedding").alias("sum_sq"),
    )


# -- Q24+ MapType operators -------------------------------------------------
# Build a map per row, filter it by value, explode to (key, value) rows —
# the map itself never crosses the comparison boundary (map iteration
# order is engine-defined), only its relational image does.

_MAP_ORACLE = """
SELECT p_partkey, kv.k AS metric, kv.v AS val
FROM (
  SELECT p_partkey, unnest([
    struct_pack(k := 'size',  v := CAST(p_size AS DOUBLE)),
    struct_pack(k := 'price', v := p_retailprice),
    struct_pack(k := 'half',  v := p_retailprice / 2.0)
  ]) AS kv
  FROM part
)
WHERE kv.v > 10.0
"""


@query("q_fn_map", _MAP_ORACLE)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    m = F.map_from_arrays(
        F.array(F.lit("size"), F.lit("price"), F.lit("half")),
        F.array(
            F.col("p_size").cast("double"),
            F.col("p_retailprice"),
            F.col("p_retailprice") / 2.0,
        ),
    )
    kept = F.map_filter(m, lambda k, v: v > 10.0)
    return p.select("p_partkey", F.explode(kept).alias("metric", "val"))


# -- Q20+ regexp family (extract_all / count via size / global replace) ----
# DuckDB regexp_replace needs the 'g' flag for replace-all parity with
# Spark; both engines use RE2-compatible character classes here.

_REGEXP_ORACLE = """
SELECT p_partkey,
       len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
       regexp_extract_all(p_name, '[a-z]+')[1] AS first_word,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
FROM part
"""


@query("q_fn_regexp", _REGEXP_ORACLE)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), 0)
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.get(words, 0).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
    )


# -- Q20+ URL functions (web-corpus normalization: host/path/query parts) --
#
# Spark side uses the native parse_url expression; the oracle decomposes
# the same (deterministic, synthesized) URLs with regexes. Domain-level
# grouping is the first step of every web-scale corpus filter.

_URL_ORACLE = """
WITH urls AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || lang || '/'
           || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&n='
           || CAST(n_chars AS VARCHAR) AS url
  FROM documents)
SELECT doc_id,
       regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
FROM urls
"""


@query("q_fn_url", _URL_ORACLE)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# -- Q22+ bitwise scalar expressions and bit-aggregates --------------------
#
# bit_and/bit_or/bit_xor aggregates are order- and partitioning-
# independent by construction (commutative + associative on int64), so
# they need no decimal trick.

_BITWISE_ORACLE = """
WITH masked AS (
  SELECT event_type,
         event_id & 1023 AS low10,
         (event_id >> 3) & 255 AS mid8
  FROM events)
SELECT event_type,
       COUNT(*) AS n,
       BIT_AND(low10) AS all_and,
       BIT_OR(low10) AS any_or,
       BIT_XOR(low10) AS parity,
       BIT_OR(mid8) AS mid_or
FROM masked GROUP BY event_type
"""


@query("q_fn_bitwise", _BITWISE_ORACLE)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    masked = e.select(
        "event_type",
        F.col("event_id").bitwiseAND(F.lit(1023)).alias("low10"),
        F.shiftright("event_id", 3).bitwiseAND(F.lit(255)).alias("mid8"),
    )
    return masked.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.bit_and("low10").alias("all_and"),
        F.bit_or("low10").alias("any_or"),
        F.bit_xor("low10").alias("parity"),
        F.bit_or("mid8").alias("mid_or"),
    )


# -- Q20+ edit distance (fuzzy matching for entity resolution) -------------

_LEVENSHTEIN_ORACLE = """
SELECT p_partkey,
       levenshtein(p_name, p_type) AS d_name_type,
       levenshtein(p_name, reverse(p_name)) AS d_palindrome,
       CASE WHEN levenshtein(p_brand, 'Brand#33') <= 2 THEN 1 ELSE 0 END
         AS near_brand33
FROM part
"""


@query("q_fn_levenshtein", _LEVENSHTEIN_ORACLE)
def q_fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("d_name_type"),
        F.levenshtein(F.col("p_name"), F.reverse(F.col("p_name"))).alias(
            "d_palindrome"
        ),
        F.when(
            F.levenshtein(F.col("p_brand"), F.lit("Brand#33")) <= 2, 1
        )
        .otherwise(0)
        .alias("near_brand33"),
    )


# -- Q24+ VARIANT type (semi-structured data without a schema) -------------
#
# Spark 4's open variant type: parse once, extract typed paths lazily —
# the engine-native way to hold heterogenous JSON at scale (no per-row
# schema inference, columnar-shreddable). The oracle reads the same JSON
# with DuckDB's json functions.

_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END
         AS missing_is_null
FROM events
"""


@query("q_fn_variant", _VARIANT_ORACLE)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "int").alias("k_int"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
        F.when(F.variant_get("v", "$.missing", "string").isNull(), 1)
        .otherwise(0)
        .alias("missing_is_null"),
    )


# -- Q24+ JSON key profiling (schema-drift detection) ----------------------
#
# Which keys exist in a semi-structured column, how often: explode
# json_object_keys and count. Every third event gets a planted extra key
# so drift is actually present. The monitoring query that catches producer
# schema changes before they break a pipeline.

_JSON_KEYS_ORACLE = """
WITH drifted AS (
  SELECT CASE WHEN event_id % 3 = 0
              THEN replace(props, '}', ',"extra": 1}')
              ELSE props END AS props
  FROM events),
keyed AS (SELECT unnest(json_keys(props)) AS key FROM drifted)
SELECT key, COUNT(*) AS n_events
FROM keyed GROUP BY key
"""


@query("q_fn_json_keys", _JSON_KEYS_ORACLE)
def q_fn_json_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    drifted = e.select(
        F.when(
            F.col("event_id") % 3 == 0,
            F.regexp_replace("props", "\\}", ',"extra": 1}'),
        )
        .otherwise(F.col("props"))
        .alias("props")
    )
    keyed = drifted.select(
        F.explode(F.json_object_keys("props")).alias("key")
    )
    return keyed.groupBy("key").agg(F.count("*").alias("n_events"))


# -- Q25+ try_* error-safe expressions (ANSI-mode survival) ----------------
#
# Spark 4 runs ANSI mode by default: bare division by zero or bad casts
# THROW. The try_* family returns NULL instead — the posture every
# pipeline expression in this repo uses so plans survive dirty data under
# any session config. The oracle mirrors with NULLIF/TRY_CAST.

_TRY_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice / l_quantity AS unit_price,
       l_extendedprice / NULLIF(l_quantity - l_quantity, 0) AS div_zero,
       TRY_CAST(l_returnflag AS INTEGER) AS bad_cast,
       TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS good_cast
FROM lineitem
"""


@query("q_fn_try", _TRY_ORACLE)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", "l_quantity").alias("unit_price"),
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_zero"),
        F.try_to_number("l_returnflag", F.lit("9")).cast("int").alias("bad_cast"),
        F.try_to_number(
            F.col("l_linenumber").cast("string"), F.lit("9")
        ).cast("int").alias("good_cast"),
    )


# -- Binary codecs: base64 / hex roundtrips ---------------------------------
#
# Stateless projections (perfectly scan-parallel); the roundtrip column
# proves decode(unbase64(base64(x))) is the identity inside the engine,
# not just that two encoders happen to agree.

_BINARY_CODEC_ORACLE = """
SELECT p_partkey,
       base64(encode(p_name)) AS b64,
       hex(p_name) AS hx,
       decode(from_base64(base64(encode(p_name)))) = p_name AS roundtrip_ok
FROM part
"""


@query("q_fn_binary_codec", _BINARY_CODEC_ORACLE)
def q_fn_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    enc = F.encode("p_name", "UTF-8")
    return p.select(
        "p_partkey",
        F.base64(enc).alias("b64"),
        F.hex("p_name").alias("hx"),
        (F.decode(F.unbase64(F.base64(enc)), "UTF-8") == F.col("p_name")).alias(
            "roundtrip_ok"
        ),
    )


# -- Advanced string functions ----------------------------------------------
#
# split_part / translate / lpad / rpad / repeat / reverse — the string-
# manipulation surface beyond the basic trim/case family (q_fn_string).
# All stateless JVM-side expressions.

_STRING_ADV_ORACLE = """
SELECT p_partkey,
       split_part(p_type, ' ', 2) AS type_mid,
       translate(p_brand, '#', '-') AS brand_dash,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       rpad(p_mfgr_short, 6, '.') AS mfgr_pad,
       repeat(substr(p_name, 1, 2), 2) AS name2x2,
       reverse(p_brand) AS brand_rev
FROM (SELECT *, substr(p_brand, 1, 5) AS p_mfgr_short FROM part)
"""


@query("q_fn_string_advanced", _STRING_ADV_ORACLE)
def q_fn_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").withColumn(
        "p_mfgr_short", F.substring("p_brand", 1, 5)
    )
    return p.select(
        "p_partkey",
        F.split_part("p_type", F.lit(" "), F.lit(2)).alias("type_mid"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad("p_mfgr_short", 6, ".").alias("mfgr_pad"),
        F.repeat(F.substring("p_name", 1, 2), 2).alias("name2x2"),
        F.reverse("p_brand").alias("brand_rev"),
    )


# -- Calendar arithmetic -----------------------------------------------------
#
# month truncation, last-day, quarter, ISO week / ISO weekday, and
# month-shift with end-of-month clamping — the calendar surface a
# time-partitioned warehouse leans on. (Engine parity notes: Spark
# weekday()+1 == DuckDB isodow; DATE + INTERVAL in DuckDB yields a
# timestamp, cast back to DATE; both engines clamp Jan 31 + 1 month to
# Feb 28.)

_CALENDAR_ORACLE = """
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS month_start,
       last_day(o_orderdate) AS month_end,
       quarter(o_orderdate) AS qtr,
       weekofyear(o_orderdate) AS iso_week,
       isodow(o_orderdate) AS iso_dow,
       CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
       datediff('day', DATE '2020-01-01', o_orderdate) AS days_since_2020
FROM orders
"""


@query("q_fn_calendar", _CALENDAR_ORACLE)
def q_fn_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.add_months("o_orderdate", 1).alias("next_month"),
        F.datediff("o_orderdate", F.lit("2020-01-01").cast("date")).alias(
            "days_since_2020"
        ),
    )


# -- Struct (nested row) operations -----------------------------------------
#
# named_struct construction, field access, nested structs, and struct
# COMPARISON as a grouped min/max (the tuple-extremum idiom the arg-agg
# family builds on). Output is flattened to scalars — nested values never
# cross the comparison harness (repo convention for arrays/structs).

_STRUCT_OPS_ORACLE = """
WITH s AS (
  SELECT o_orderkey,
         {'pri': o_orderpriority, 'price_c':
           CAST(ROUND(o_totalprice * 100) AS BIGINT)} AS meta
  FROM orders)
SELECT meta.pri AS pri,
       COUNT(*) AS n,
       MIN(meta.price_c) AS min_price_c,
       MAX(meta.price_c) AS max_price_c
FROM s GROUP BY meta.pri
"""


@query("q_fn_struct_ops", _STRUCT_OPS_ORACLE)
def q_fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = o.select(
        "o_orderkey",
        F.named_struct(
            F.lit("pri"),
            F.col("o_orderpriority"),
            F.lit("price_c"),
            F.round(F.col("o_totalprice") * 100).cast("bigint"),
        ).alias("meta"),
    )
    return s.groupBy(F.col("meta.pri").alias("pri")).agg(
        F.count("*").alias("n"),
        F.min("meta.price_c").alias("min_price_c"),
        F.max("meta.price_c").alias("max_price_c"),
    )


# -- Array set algebra -------------------------------------------------------
#
# array_union / array_intersect / array_except between each document's
# token set and a reference vocabulary, exploded to scalar (doc, op,
# pos, token) rows — the harness never hashes array cells (repo
# convention), and array_sort pins the order set operations leave
# undefined in both engines.

_ARRAY_SETOPS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_sort(list_distinct(string_split_regex(trim(text), '\\s+')))
           AS t
  FROM documents WHERE doc_id < 40 AND text IS NOT NULL),
ref AS (SELECT ['data', 'the', 'model', 'training'] AS v),
ops AS (
  SELECT doc_id,
         list_sort(list_distinct(t || v)) AS u,
         list_sort(list_intersect(t, v)) AS i,
         list_sort(list_filter(t, x -> NOT list_contains(v, x))) AS e
  FROM toks, ref),
stacked AS (
  SELECT doc_id, 'union' AS op, u AS arr FROM ops
  UNION ALL SELECT doc_id, 'intersect', i FROM ops
  UNION ALL SELECT doc_id, 'except', e FROM ops)
SELECT doc_id, op, CAST(g.pos AS INT) AS pos, arr[CAST(g.pos AS INT)] AS token
FROM stacked, LATERAL unnest(generate_series(1, len(arr))) g(pos)
"""


@query("q_fn_array_setops", _ARRAY_SETOPS_ORACLE)
def q_fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mini_etl_project_spark.operators.textops import tokens

    # a NULL text has no token set — and the engines disagree on NULL
    # list algebra (DuckDB's || treats a NULL list as empty, Spark's
    # array_union propagates NULL) — excluded on both (r12 NULL audit).
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 40) & F.col("text").isNotNull()
    )
    ref = F.array(*[F.lit(x) for x in ["data", "the", "model", "training"]])
    toks = d.select(
        "doc_id",
        F.array_sort(F.array_distinct(tokens("text"))).alias("t"),
        ref.alias("v"),
    )
    ops = toks.select(
        "doc_id",
        F.array_sort(F.array_union("t", "v")).alias("u"),
        F.array_sort(F.array_intersect("t", "v")).alias("i"),
        F.array_sort(F.array_except("t", "v")).alias("e"),
    )
    stacked = (
        ops.select("doc_id", F.lit("union").alias("op"), F.col("u").alias("arr"))
        .unionByName(
            ops.select(
                "doc_id", F.lit("intersect").alias("op"), F.col("i").alias("arr")
            )
        )
        .unionByName(
            ops.select(
                "doc_id", F.lit("except").alias("op"), F.col("e").alias("arr")
            )
        )
    )
    return stacked.select(
        "doc_id", "op", F.posexplode("arr").alias("pos0", "token")
    ).select("doc_id", "op", (F.col("pos0") + 1).cast("int").alias("pos"), "token")


# -- XML parsing (from_xml, Spark 4 built-in) --------------------------------
#
# A deterministic XML document is built per order from its columns, then
# parsed back with from_xml against an explicit schema. The oracle
# computes the expected parsed fields straight from the base columns —
# so the check pins that Spark's XML parser inverts the construction
# exactly (element order, nesting, numeric casts).

_XML_ORACLE = """
SELECT o_orderkey,
       o_orderpriority AS pri,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
       o_custkey AS cust
FROM orders WHERE o_orderkey % 31 = 0
"""


@query("q_fn_xml", _XML_ORACLE)
def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 31 == 0
    )
    xml = F.concat(
        F.lit("<o><pri>"),
        F.col("o_orderpriority"),
        F.lit("</pri><cents>"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.lit("</cents><cust>"),
        F.col("o_custkey").cast("string"),
        F.lit("</cust></o>"),
    )
    schema = StructType(
        [
            StructField("pri", StringType()),
            StructField("cents", LongType()),
            StructField("cust", LongType()),
        ]
    )
    parsed = o.select(
        "o_orderkey", F.from_xml(xml, schema).alias("x")
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.pri").alias("pri"),
        F.col("x.cents").alias("cents"),
        F.col("x.cust").alias("cust"),
    )


# -- CSV line parsing (from_csv / to_csv roundtrip) -------------------------
#
# to_csv serializes a struct to one CSV line; from_csv parses it back
# under an explicit schema — the embedded-delimiter quoting path is
# exercised via part names containing spaces (and a planted comma).

_CSV_INLINE_ORACLE = """
SELECT p_partkey,
       p_name || ',x' AS name_out,
       CAST(p_size AS BIGINT) AS size_out
FROM part WHERE p_partkey % 17 = 0
"""


@query("q_fn_csv_inline", _CSV_INLINE_ORACLE)
def q_fn_csv_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_partkey") % 17 == 0
    )
    line = F.to_csv(
        F.struct(
            F.concat(F.col("p_name"), F.lit(",x")).alias("n"),
            F.col("p_size").cast("long").alias("s"),
        )
    )
    parsed = p.select(
        "p_partkey",
        F.from_csv(line, "n string, s bigint").alias("c"),
    )
    return parsed.select(
        "p_partkey",
        F.col("c.n").alias("name_out"),
        F.col("c.s").alias("size_out"),
    )


# -- Collation-aware comparison (Spark 4 COLLATE) ----------------------------
#
# Case-insensitive grouping via the UTF8_LCASE collation — Spark 4's
# collation engine — checked against the explicit lower() rewrite the
# oracle (and any collation-less engine) uses. Mixed-case keys are
# planted so the collation actually merges groups.

_COLLATION_ORACLE = """
WITH src AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
              ELSE lower(p_brand) END AS brand_mixed
  FROM part)
SELECT lower(brand_mixed) AS brand_ci, COUNT(*) AS n
FROM src GROUP BY brand_ci
"""


@query("q_fn_collation", _COLLATION_ORACLE)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_brand")
    ).otherwise(F.lower("p_brand"))
    src = p.select(mixed.alias("brand_mixed"))
    ci = F.expr("brand_mixed COLLATE UTF8_LCASE")
    return src.groupBy(ci.alias("k")).agg(F.count("*").alias("n")).select(
        # normalize the emitted key for the comparison boundary (collation
        # groups preserve an arbitrary representative's case)
        F.lower("k").alias("brand_ci"),
        "n",
    )


# -- X159 ANSI interval arithmetic -----------------------------------------
#
# Day-time INTERVAL literals in timestamp arithmetic, plus epoch-grid
# snapping, all at full microsecond precision: the timestamp algebra a
# time-series warehouse leans on.  Microsecond integers (unix_micros /
# epoch_us) keep every derived column integer-exact across engines — no
# float epoch, no timezone ambiguity (session TZ pinned UTC).

_INTERVAL_ORACLE = """
SELECT event_id,
       ts + INTERVAL 90 MINUTE AS plus_90m,
       ts - INTERVAL 1 DAY AS minus_1d,
       ts + INTERVAL '26:30:00' AS plus_dts,
       make_timestamp(epoch_us(ts) - epoch_us(ts) % 900000000)
         AS snapped_15m,
       CAST((epoch_us(ts)
             - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 3600000000
         AS BIGINT) AS hours_since_anchor
FROM events
"""


@query("q_fn_interval_arith", _INTERVAL_ORACLE)
def q_fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    anchor_us = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("plus_90m"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("minus_1d"),
        (F.col("ts") + F.expr("INTERVAL '1 02:30:00' DAY TO SECOND")).alias(
            "plus_dts"
        ),
        F.timestamp_micros(
            F.unix_micros("ts") - F.unix_micros("ts") % 900000000
        ).alias("snapped_15m"),
        ((F.unix_micros("ts") - anchor_us) / 3600000000)
        .cast("bigint")
        .alias("hours_since_anchor"),
    )


# -- X182 AES column encryption roundtrip ----------------------------------
#
# Column-level encryption (the PII-at-rest pattern): every document body
# encrypts with AES-128-ECB (the deterministic mode — GCM's random IV
# would break both the oracle and any equality-joinable ciphertext) and
# must decrypt back byte-identically.  DuckDB has no AES, so the oracle
# pins the INVARIANTS instead: roundtrip equality always holds and the
# PKCS#7 ciphertext length is exactly 16·(⌊n/16⌋+1) for the pure-ASCII
# corpus.  Stateless projection; the JVM does the crypto.

_AES_KEY = "0123456789abcdef"

_AES_ORACLE = """
SELECT doc_id,
       LENGTH(text) AS n_chars,
       1 AS roundtrip_ok,
       CAST(16 * ((LENGTH(text) // 16) + 1) AS BIGINT) AS cipher_bytes
FROM documents
"""


@query("q_fn_aes_roundtrip", _AES_ORACLE)
def q_fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    enc = F.expr(f"aes_encrypt(text, '{_AES_KEY}', 'ECB')")
    dec = F.expr(
        f"cast(aes_decrypt(aes_encrypt(text, '{_AES_KEY}', 'ECB'),"
        f" '{_AES_KEY}', 'ECB') as string)"
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        # null-safe equality: aes of a NULL body is NULL, and NULL
        # decrypts back to NULL — the roundtrip holds VACUOUSLY (the
        # oracle's constant 1), where plain == would emit NULL (r12
        # NULL audit).
        dec.eqNullSafe(F.col("text")).cast("int").alias("roundtrip_ok"),
        F.octet_length(enc).cast("bigint").alias("cipher_bytes"),
    )


# -- X194 Luhn checksum validation -----------------------------------------
#
# Spark's built-in luhn_check against a from-first-principles oracle:
# 16-digit account numbers derive deterministically from order keys
# (≈10 % carry a valid check digit by construction), Spark validates
# with the native function, and the oracle re-implements the Luhn
# algorithm as pure digit arithmetic — doubling every second digit from
# the right, folding >9 to digit-sum, total ≡ 0 (mod 10).

_LUHN_DIGIT_SQL = " + ".join(
    (
        f"CAST(substring(card, {17 - i}, 1) AS INT)"
        if i % 2 == 1
        else (
            f"CASE WHEN 2 * CAST(substring(card, {17 - i}, 1) AS INT) > 9"
            f" THEN 2 * CAST(substring(card, {17 - i}, 1) AS INT) - 9"
            f" ELSE 2 * CAST(substring(card, {17 - i}, 1) AS INT) END"
        )
    )
    for i in range(1, 17)
)

_LUHN_ORACLE = f"""
WITH cards AS (
  SELECT o_orderkey,
         lpad(CAST((o_orderkey * 7919) % 1000000000000000 AS VARCHAR),
              15, '0') || CAST(o_orderkey % 10 AS VARCHAR) AS card
  FROM orders)
SELECT o_orderkey, card,
       CAST(({_LUHN_DIGIT_SQL}) % 10 = 0 AS INT) AS is_valid
FROM cards
"""


@query("q_fn_luhn", _LUHN_ORACLE)
def q_fn_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    card = F.concat(
        F.lpad(
            ((F.col("o_orderkey") * 7919) % 1000000000000000).cast("string"),
            15,
            "0",
        ),
        (F.col("o_orderkey") % 10).cast("string"),
    )
    return o.select(
        "o_orderkey",
        card.alias("card"),
        F.expr("cast(luhn_check(card) as int)").alias("is_valid"),
    ).select("o_orderkey", "card", "is_valid")


# -- X211 email validation classes -----------------------------------------
#
# Synthetic contact addresses derive from customer names with three
# deterministic corruption classes (missing @, double dots, bad TLD);
# an RE2-safe validity pattern classifies each, and counts per class
# must agree.  The pattern avoids lookarounds/backrefs — portable to
# both regex engines by construction.

_EMAIL_RE = "^[a-z0-9._]+@[a-z0-9-]+([.][a-z0-9-]+)*[.][a-z]{2,}$"

_EMAIL_ORACLE = f"""
WITH mk AS (
  SELECT c_custkey,
         CASE c_custkey % 4
           WHEN 0 THEN lower(replace(c_name, '#', '.')) || '@example.com'
           WHEN 1 THEN lower(replace(c_name, '#', '.')) || 'example.com'
           WHEN 2 THEN lower(replace(c_name, '#', '..')) || '@example.com'
           ELSE lower(replace(c_name, '#', '.')) || '@example.c0m'
         END AS email
  FROM customer)
SELECT c_custkey, email,
       CAST(regexp_matches(email, '{_EMAIL_RE}') AS INT) AS is_valid
FROM mk
"""


@query("q_fn_email_validate", _EMAIL_ORACLE)
def q_fn_email_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit(".")))
    dbl = F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("..")))
    email = (
        F.when(F.col("c_custkey") % 4 == 0, F.concat(base, F.lit("@example.com")))
        .when(F.col("c_custkey") % 4 == 1, F.concat(base, F.lit("example.com")))
        .when(F.col("c_custkey") % 4 == 2, F.concat(dbl, F.lit("@example.com")))
        .otherwise(F.concat(base, F.lit("@example.c0m")))
    )
    return c.select(
        "c_custkey",
        email.alias("email"),
        email.rlike(_EMAIL_RE).cast("int").alias("is_valid"),
    )


# -- X218 IPv4 functions ---------------------------------------------------
#
# Network-log enrichment primitives: int<->dotted-quad conversion, subnet
# masking, RFC-1918 private-range classification — all integer bit
# arithmetic (shiftright/AND), so both engines agree bit-for-bit. The
# "log" IPs are deterministic 32-bit values derived from the stable
# 60-bit row hash. One groupBy on the first octet (bounded 256 groups)
# keeps the output small at any scale; a conversion round-trip count
# proves the string codec both ways.

_IPV4_ORACLE = """
WITH ips AS (
  SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 4294967296 AS ip
  FROM events),
parts AS (
  SELECT ip,
         (ip >> 24) & 255 AS o1, (ip >> 16) & 255 AS o2,
         (ip >> 8) & 255 AS o3, ip & 255 AS o4
  FROM ips),
fmt AS (
  SELECT ip, o1,
         CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.'
           || CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS dotted,
         CASE WHEN o1 = 10 THEN 1
              WHEN o1 = 172 AND o2 >= 16 AND o2 <= 31 THEN 1
              WHEN o1 = 192 AND o2 = 168 THEN 1
              ELSE 0 END AS is_private,
         (ip >> 16) << 16 AS net16
  FROM parts),
back AS (
  SELECT o1, is_private, ip, net16,
         CAST(string_split(dotted, '.')[1] AS BIGINT) * 16777216
           + CAST(string_split(dotted, '.')[2] AS BIGINT) * 65536
           + CAST(string_split(dotted, '.')[3] AS BIGINT) * 256
           + CAST(string_split(dotted, '.')[4] AS BIGINT) AS ip_back
  FROM fmt)
SELECT CAST(o1 AS BIGINT) AS octet1,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(is_private) AS BIGINT) AS n_private,
       CAST(COUNT(DISTINCT net16) AS BIGINT) AS n_net16,
       CAST(SUM(CASE WHEN ip_back = ip THEN 1 ELSE 0 END) AS BIGINT)
         AS n_roundtrip
FROM back GROUP BY o1
"""


@query("q_fn_ipv4", _IPV4_ORACLE)
def q_fn_ipv4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    ips = e.select((h % F.lit(4294967296)).alias("ip"))
    parts = ips.select(
        "ip",
        F.shiftright("ip", 24).bitwiseAND(F.lit(255)).alias("o1"),
        F.shiftright("ip", 16).bitwiseAND(F.lit(255)).alias("o2"),
        F.shiftright("ip", 8).bitwiseAND(F.lit(255)).alias("o3"),
        F.col("ip").bitwiseAND(F.lit(255)).alias("o4"),
    )
    fmt = parts.select(
        "ip",
        "o1",
        F.concat_ws(
            ".",
            F.col("o1").cast("string"),
            F.col("o2").cast("string"),
            F.col("o3").cast("string"),
            F.col("o4").cast("string"),
        ).alias("dotted"),
        F.when(F.col("o1") == 10, 1)
        .when(
            (F.col("o1") == 172)
            & (F.col("o2") >= 16)
            & (F.col("o2") <= 31),
            1,
        )
        .when((F.col("o1") == 192) & (F.col("o2") == 168), 1)
        .otherwise(0)
        .alias("is_private"),
        F.expr("shiftleft(shiftright(ip, 16), 16)").alias("net16"),
    )
    sp = F.split(F.col("dotted"), "\\.")
    back = fmt.select(
        "o1",
        "is_private",
        "ip",
        "net16",
        (
            sp.getItem(0).cast("bigint") * 16777216
            + sp.getItem(1).cast("bigint") * 65536
            + sp.getItem(2).cast("bigint") * 256
            + sp.getItem(3).cast("bigint")
        ).alias("ip_back"),
    )
    return back.groupBy(F.col("o1").cast("bigint").alias("octet1")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("is_private").cast("bigint").alias("n_private"),
        F.countDistinct("net16").cast("bigint").alias("n_net16"),
        F.sum(F.when(F.col("ip_back") == F.col("ip"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip"),
    )


# -- X269 deterministic name-based UUIDs (v3, RFC 4122) --------------------
#
# Surrogate-key generation that is reproducible across engines and runs:
# UUIDv3 = md5(namespace ‖ name) with the version nibble forced to 3 and
# the variant nibble to (n & 3) | 8 — both re-expressed as pure string
# ops (translate does the variant arithmetic), so DuckDB derives the
# identical key. The uniqueness proof (distinct UUIDs = distinct names)
# rides the same aggregate.

_UUID5_ORACLE = """
WITH h AS (
  SELECT c_custkey,
         md5('mini-etl-ns:' || CAST(c_custkey AS VARCHAR)) AS x
  FROM customer),
u AS (
  SELECT c_custkey,
         substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-3'
           || substr(x, 15, 3) || '-'
           || translate(substr(x, 17, 1),
                        '0123456789abcdef', '89ab89ab89ab89ab')
           || substr(x, 19, 2) || '-' || substr(x, 21, 12) AS uuid
  FROM h)
SELECT substr(uuid, 1, 1) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT uuid) AS BIGINT) AS n_distinct,
       MIN(uuid) AS first_uuid
FROM u GROUP BY bucket
"""


@query("q_fn_uuid5", _UUID5_ORACLE)
def q_fn_uuid5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    x = F.md5(
        F.concat(F.lit("mini-etl-ns:"), F.col("c_custkey").cast("string"))
    )
    u = c.select(
        F.concat(
            F.substring(x, 1, 8),
            F.lit("-"),
            F.substring(x, 9, 4),
            F.lit("-3"),
            F.substring(x, 15, 3),
            F.lit("-"),
            F.translate(
                F.substring(x, 17, 1),
                "0123456789abcdef",
                "89ab89ab89ab89ab",
            ),
            F.substring(x, 19, 2),
            F.lit("-"),
            F.substring(x, 21, 12),
        ).alias("uuid")
    )
    return u.groupBy(F.substring("uuid", 1, 1).alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("uuid").cast("bigint").alias("n_distinct"),
        F.min("uuid").alias("first_uuid"),
    )


# -- X272 business-day arithmetic (closed form, no calendar explode) -------
#
# Weekday counting between dates WITHOUT generating a row per day (the
# tempting sequence-explode is a 7× row blowup at scale): business days
# in [start, start+n) = 5·(n DIV 7) + partial(dow(start), n MOD 7),
# where the partial-week term is the split CASE over the Monday-indexed
# start weekday — pure integer arithmetic on epoch days, mirrored
# exactly. Spans derive deterministically from order keys; the result
# aggregates per span length so every (dow × rem) combination in the
# data is pinned.

_BIZDAYS_ORACLE = """
WITH spans AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS s,
         o_orderkey % 20 AS n
  FROM orders),
calc AS (
  SELECT n, (s + 3) % 7 AS dow0, n // 7 AS weeks, n % 7 AS rem
  FROM spans),
biz AS (
  SELECT n,
         5 * weeks
         + (CASE WHEN dow0 <= 4 THEN LEAST(rem, 5 - dow0) ELSE 0 END)
         + GREATEST(0, rem - (7 - dow0)) AS bdays
  FROM calc)
SELECT CAST(n AS BIGINT) AS span_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(bdays) AS BIGINT) AS business_days_sum,
       CAST(MIN(bdays) AS BIGINT) AS min_bdays,
       CAST(MAX(bdays) AS BIGINT) AS max_bdays
FROM biz GROUP BY n
"""


@query("q_fn_business_days", _BIZDAYS_ORACLE)
def q_fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spans = o.select(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("s"),
        (F.col("o_orderkey") % 20).alias("n"),
    )
    calc = spans.select(
        "n",
        ((F.col("s") + 3) % 7).alias("dow0"),
        F.expr("n DIV 7").alias("weeks"),
        (F.col("n") % 7).alias("rem"),
    )
    bdays = (
        5 * F.col("weeks")
        + F.when(
            F.col("dow0") <= 4,
            F.least(F.col("rem"), 5 - F.col("dow0")),
        ).otherwise(F.lit(0))
        + F.greatest(F.lit(0), F.col("rem") - (7 - F.col("dow0")))
    )
    return (
        calc.select("n", bdays.alias("bdays"))
        .groupBy(F.col("n").cast("bigint").alias("span_days"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("bdays").cast("bigint").alias("business_days_sum"),
            F.min("bdays").cast("bigint").alias("min_bdays"),
            F.max("bdays").cast("bigint").alias("max_bdays"),
        )
    )


# -- X301 geohash encoding -------------------------------------------------
#
# Standard geohash (Niemeyer): quantize lon/lat to 15 bits each against
# their world ranges, interleave starting with longitude, emit the 30-bit
# word as 6 base-32 characters.  Coordinates derive deterministically from
# supplier keys in centi-degrees so both engines start from identical
# integers; quantization and bit interleave are pure integer DIV/%
# arithmetic (no floats anywhere), generated as the same expression tree
# for Spark and the DuckDB oracle.  Stateless projection — embarrassingly
# parallel at any scale; the prefix column is the bucketing key a
# proximity join would shuffle on.

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_bits_sql(div: str) -> str:
    terms = []
    for j in range(15):
        nb = 1 << (14 - j)
        terms.append(f"((lon_i {div} {nb}) % 2) * {1 << (29 - 2 * j)}")
        terms.append(f"((lat_i {div} {nb}) % 2) * {1 << (28 - 2 * j)}")
    return " + ".join(terms)


def _gh_chars_sql(div: str) -> str:
    return " || ".join(
        f"substring('{_B32}', CAST((gh_bits {div} {1 << (25 - 5 * c)}) % 32"
        f" AS INT) + 1, 1)"
        for c in range(6)
    )


_GEOHASH_ORACLE = f"""
WITH pts AS (
  SELECT s_suppkey,
         (s_suppkey * 37) % 18000 AS lat_c,
         (s_suppkey * 73) % 36000 AS lon_c
  FROM supplier),
quant AS (
  SELECT s_suppkey, lat_c, lon_c,
         (lat_c * 32768) // 18000 AS lat_i,
         (lon_c * 32768) // 36000 AS lon_i
  FROM pts),
bits AS (
  SELECT s_suppkey, lat_c, lon_c, {_gh_bits_sql('//')} AS gh_bits
  FROM quant),
enc AS (
  SELECT s_suppkey, lat_c, lon_c, {_gh_chars_sql('//')} AS geohash6
  FROM bits)
SELECT s_suppkey,
       CAST(lat_c - 9000 AS BIGINT) AS lat_e2,
       CAST(lon_c - 18000 AS BIGINT) AS lon_e2,
       geohash6,
       substring(geohash6, 1, 4) AS prefix4
FROM enc
"""


@query("q_fn_geohash", _GEOHASH_ORACLE)
def q_fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    df = sup.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 37) % 18000).alias("lat_c"),
        ((F.col("s_suppkey") * 73) % 36000).alias("lon_c"),
    ).selectExpr(
        "s_suppkey",
        "lat_c",
        "lon_c",
        "(lat_c * 32768) DIV 18000 AS lat_i",
        "(lon_c * 32768) DIV 36000 AS lon_i",
    )
    df = df.withColumn("gh_bits", F.expr(_gh_bits_sql("DIV")))
    df = df.withColumn("geohash6", F.expr(_gh_chars_sql("DIV")))
    return df.select(
        "s_suppkey",
        (F.col("lat_c") - 9000).cast("bigint").alias("lat_e2"),
        (F.col("lon_c") - 18000).cast("bigint").alias("lon_e2"),
        "geohash6",
        F.substring("geohash6", 1, 4).alias("prefix4"),
    )


# -- X345: mask() PII redaction builtin ------------------------------------
# Spark 3.4's mask(): uppercase→X, lowercase→x, digits→n, punctuation
# kept — plus a custom-char variant. The oracle reproduces the exact
# character-class mapping with chained regexp_replace, making the
# builtin's contract itself the thing under test.

_MASK_ORACLE = """
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS masked_default,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', '*', 'g'), '[a-z]', '*', 'g'), '[0-9]', '#', 'g')
         AS masked_custom
FROM customer WHERE c_custkey <= 500
"""


@query("q_fn_mask", _MASK_ORACLE)
def q_fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 500
    )
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("masked_default"),
        F.expr("mask(c_name, '*', '*', '#', NULL)").alias("masked_custom"),
    )


# -- X346: Spark 3.4+ array mutation functions -----------------------------
# array_insert / array_compact / array_prepend / array_append over a
# constructed per-row array (with a planted NULL). The oracle rebuilds
# each with DuckDB list primitives (slice-concat for insert, list_filter
# for compact), pinning the newer API's edge semantics — 1-based insert
# position, null passthrough — against an independent implementation.

_ARRAY34_ORACLE = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         [CAST(ROUND(l_quantity) AS BIGINT), NULL,
          CAST(l_partkey AS BIGINT)] AS arr
  FROM lineitem WHERE l_orderkey <= 1000)
SELECT l_orderkey, l_linenumber,
       array_to_string(list_transform(list_filter(arr, x -> x IS NOT NULL),
         x -> COALESCE(CAST(x AS VARCHAR), 'N')), ',') AS compacted,
       array_to_string(list_transform(list_prepend(CAST(-1 AS BIGINT), arr),
         x -> COALESCE(CAST(x AS VARCHAR), 'N')), ',') AS prepended,
       array_to_string(list_transform(list_append(arr, CAST(99 AS BIGINT)),
         x -> COALESCE(CAST(x AS VARCHAR), 'N')), ',') AS appended,
       array_to_string(list_transform(
         list_concat(list_concat(arr[1:1], [CAST(7 AS BIGINT)]), arr[2:]),
         x -> COALESCE(CAST(x AS VARCHAR), 'N')), ',') AS inserted_at_2
FROM base
"""


def _arr_str(col):
    """Serialize an array<bigint> to a canonical string for transport.

    The driver's result canonicalizer sorts rows through pandas, which
    cannot hash list-valued cells (r6's only red row). Array semantics
    stay in-plan; only the *output* is flattened — NULL elements map to
    the sentinel 'N' so nullability survives the round-trip.
    """
    return F.array_join(
        F.transform(col, lambda x: F.coalesce(x.cast("string"), F.lit("N"))),
        ",",
    )


@query("q_fn_array_v34", _ARRAY34_ORACLE)
def q_fn_array_v34(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") <= 1000
    )
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        F.array(
            F.round("l_quantity").cast("bigint"),
            F.lit(None).cast("bigint"),
            F.col("l_partkey").cast("bigint"),
        ).alias("arr"),
    )
    return base.select(
        "l_orderkey",
        "l_linenumber",
        _arr_str(F.array_compact("arr")).alias("compacted"),
        _arr_str(
            F.array_prepend("arr", F.lit(-1).cast("bigint"))
        ).alias("prepended"),
        _arr_str(
            F.array_append("arr", F.lit(99).cast("bigint"))
        ).alias("appended"),
        _arr_str(
            F.array_insert("arr", 2, F.lit(7).cast("bigint"))
        ).alias("inserted_at_2"),
    )


# -- X348: Damerau-Levenshtein distance (unrestricted) ---------------------
#
# Spark ships levenshtein() but not Damerau's transposition-aware
# variant — the one record-linkage actually wants (typos are mostly
# adjacent swaps). Implemented as an Arrow-batched pandas UDF running
# the Lowrance-Wagner full algorithm (true DL, a metric — not the
# restricted OSA), checked cell-for-cell against DuckDB's native
# damerau_levenshtein, which is also unrestricted ('CA'→'ABC' = 2, the
# case that separates the two). Integer output — no float drift
# possible. Per-pair cost is O(len²) inside the batch; the scan is a
# pruned 2-column projection, so the 100 TB posture is "embarrassingly
# parallel UDF over a pruned scan".

_DAMERAU_ORACLE = """
SELECT p_partkey,
       CAST(damerau_levenshtein(p_name,
            translate(p_name, 'aeio', 'eaoi')) AS BIGINT) AS d_vowel_swap,
       CAST(damerau_levenshtein(p_brand, p_type) AS BIGINT)
         AS d_brand_type,
       CAST(damerau_levenshtein('CA', 'ABC') AS BIGINT) AS d_probe
FROM part WHERE p_partkey <= 2000
"""


def _damerau_dl(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (Lowrance-Wagner)."""
    la, lb = len(a), len(b)
    maxdist = la + lb
    # charmap of last row index (1-based) where each char occurred in a
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0  # last column (1-based) in b matching a[i-1] on this row
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


@query("q_fn_damerau", _DAMERAU_ORACLE)
def q_fn_damerau(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("bigint")
    def dl(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_damerau_dl(x, y) for x, y in zip(a, b)], dtype="int64"
        )

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 2000)
    return p.select(
        "p_partkey",
        dl(
            F.col("p_name"),
            F.translate("p_name", "aeio", "eaoi"),
        ).alias("d_vowel_swap"),
        dl(F.col("p_brand"), F.col("p_type")).alias("d_brand_type"),
        dl(F.lit("CA"), F.lit("ABC")).alias("d_probe"),
    )


# -- X405: Jaro-Winkler similarity ------------------------------------------
#
# The other half of the record-linkage string toolbox (X348 covers
# edit distance): Jaro's windowed character matching with Winkler's
# common-prefix boost. Spark has no builtin, so this is an
# Arrow-batched pandas UDF implementing the standard algorithm —
# validated BIT-EXACT against DuckDB's native jaro_winkler_similarity
# on ~100k adversarial pairs (short strings, tiny alphabets) before
# landing. Two semantics quirks pinned by literal probe columns: the
# empty-vs-empty pair scores 0.0 (not 1.0), and the match window
# clamps at 0 so equal single-char strings score 1.0. The similarity
# is a small fixed sequence of IEEE double ops ((m/la + m/lb +
# (m-t)/m)/3, then j + l*0.1*(1-j) when j > 0.7), identical in both
# engines, so raw doubles hash-match — no ppm scaling needed.
# 100 TB posture: embarrassingly parallel UDF over a pruned 2-column
# scan; per-pair cost O(len^2) worst case inside the Arrow batch.

_JW_ORACLE = """
SELECT p_partkey,
       jaro_winkler_similarity(p_name,
            translate(p_name, 'aeio', 'eaoi')) AS jw_vowel_swap,
       jaro_winkler_similarity(p_brand, p_type) AS jw_brand_type,
       jaro_winkler_similarity('martha', 'marhta') AS jw_probe_classic,
       jaro_winkler_similarity('DWAYNE', 'DUANE') AS jw_probe_boost,
       jaro_winkler_similarity('', '') AS jw_probe_empty,
       jaro_winkler_similarity('e', 'e') AS jw_probe_single
FROM part WHERE p_partkey <= 2000
"""


def _jaro(s1: str, s2: str) -> float:
    """Jaro similarity, DuckDB-compatible: empty -> 0.0, window >= 0,
    and UTF-8 BYTE comparison units (DuckDB's native implementation
    walks bytes, not codepoints — 'café' vs 'cafe' differs in TWO byte
    positions; pinned by test_jaro_winkler_duckdb_builtin_parity's
    non-ASCII cases)."""
    b1, b2 = s1.encode("utf-8"), s2.encode("utf-8")
    return _jaro_bytes(b1, b2)


def _jaro_bytes(s1: bytes, s2: bytes) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    f1 = [False] * l1
    f2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def _jaro_winkler(s1: str, s2: str) -> float:
    j = _jaro(s1, s2)
    if j > 0.7:
        l = 0
        for a, b in zip(s1.encode("utf-8")[:4], s2.encode("utf-8")[:4]):
            if a != b:
                break
            l += 1
        j = j + l * 0.1 * (1.0 - j)
    return j


@query("q_fn_jaro_winkler", _JW_ORACLE)
def q_fn_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 2000)
    return p.select(
        "p_partkey",
        jw(
            F.col("p_name"), F.translate("p_name", "aeio", "eaoi")
        ).alias("jw_vowel_swap"),
        jw(F.col("p_brand"), F.col("p_type")).alias("jw_brand_type"),
        jw(F.lit("martha"), F.lit("marhta")).alias("jw_probe_classic"),
        jw(F.lit("DWAYNE"), F.lit("DUANE")).alias("jw_probe_boost"),
        jw(F.lit(""), F.lit("")).alias("jw_probe_empty"),
        jw(F.lit("e"), F.lit("e")).alias("jw_probe_single"),
    )


# -- X440: Hamming distance + character-set Jaccard -------------------------
#
# Two more record-linkage primitives Spark lacks as builtins — but
# unlike X348/X405 these need NO Python at all: hamming over a
# fixed-width slice unrolls to 8 JVM-side equality terms, and
# DuckDB's jaccard() (distinct-character-set overlap) is
# split -> array_distinct -> array_intersect/array_union — every op
# whole-stage-codegen'd, the preferred path per the repo's UDF
# policy. Inputs are ASCII columns (DuckDB's builtins walk UTF-8
# bytes — the X405 lesson — so the surface pins ASCII and the
# docstring says why); probes cover the equal-set and disjoint edges.

_HAMJAC_W = 8

_HAMJAC_ORACLE = f"""
SELECT p_partkey,
       CAST(hamming(substr(p_name, 1, {_HAMJAC_W}),
                    substr(translate(p_name, 'aeio', 'eaoi'), 1,
                           {_HAMJAC_W})) AS BIGINT) AS ham_vowel,
       jaccard(p_name, p_brand) AS jac_name_brand,
       jaccard(p_name, p_type) AS jac_name_type,
       jaccard('abc', 'cba') AS jac_probe_same_set,
       jaccard('abc', 'xyz') AS jac_probe_disjoint
FROM part WHERE p_partkey <= 2000
"""


@query("q_fn_hamming_jaccard", _HAMJAC_ORACLE)
def q_fn_hamming_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    def ham(a: F.Column, b: F.Column) -> F.Column:
        total = None
        for i in range(1, _HAMJAC_W + 1):
            t = (
                F.substring(a, i, 1) != F.substring(b, i, 1)
            ).cast("int")
            total = t if total is None else total + t
        return total.cast("bigint")

    def charset(c: F.Column) -> F.Column:
        # split('abc', '') -> [a, b, c]; distinct set of characters
        return F.array_distinct(F.split(c, ""))

    def jac(a: F.Column, b: F.Column) -> F.Column:
        sa, sb = charset(a), charset(b)
        inter = F.size(F.array_intersect(sa, sb)).cast("double")
        union = F.size(F.array_union(sa, sb)).cast("double")
        return inter / union

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 2000)
    name8 = F.substring("p_name", 1, _HAMJAC_W)
    vow8 = F.substring(
        F.translate("p_name", "aeio", "eaoi"), 1, _HAMJAC_W
    )
    return p.select(
        "p_partkey",
        ham(name8, vow8).alias("ham_vowel"),
        jac(F.col("p_name"), F.col("p_brand")).alias("jac_name_brand"),
        jac(F.col("p_name"), F.col("p_type")).alias("jac_name_type"),
        jac(F.lit("abc"), F.lit("cba")).alias("jac_probe_same_set"),
        jac(F.lit("abc"), F.lit("xyz")).alias("jac_probe_disjoint"),
    )


# -- X469 bool/bit aggregate family ------------------------------------------
#
# The SQL:2016 logical/bitwise aggregates: bool_and / bool_or (EVERY /
# ANY) and bit_and / bit_or / bit_xor per order-priority group over
# derived flags and key bits. All are idempotent-or-associative integer
# lattice operations — trivially partition-order independent, so both
# engines agree bit-for-bit with no decimal machinery.

_BOOLBIT_ORACLE = """
SELECT o_orderpriority AS pri,
       bool_and(o_totalprice > 1000.0) AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_finished,
       CAST(bit_and(o_orderkey % 4096) AS BIGINT) AS band,
       CAST(bit_or(o_orderkey % 4096) AS BIGINT) AS bor,
       CAST(bit_xor(o_orderkey % 4096) AS BIGINT) AS bxor,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY pri
"""


@query("q_fn_bool_bit_aggs", _BOOLBIT_ORACLE)
def q_fn_bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    kb = F.expr("o_orderkey % 4096")
    return o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bit_and(kb).cast("bigint").alias("band"),
        F.bit_or(kb).cast("bigint").alias("bor"),
        F.bit_xor(kb).cast("bigint").alias("bxor"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# -- X470 try_* error-safe function family ------------------------------------
#
# Spark 4 runs ANSI mode by default, where bad casts / division by zero
# / out-of-range access THROW; the try_* family is the sanctioned
# per-expression escape hatch a cleaning pipeline needs. Each column
# exercises one member against inputs that would raise: the oracle
# mirrors with DuckDB's TRY_CAST / NULLIF guards. (The ANSI pin itself
# is tests/test_ansi_contract.py; this row proves the recovery path.)

_TRY_ORACLE = """
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS pri_as_int,
       CAST(o_totalprice AS DOUBLE) / NULLIF(o_orderkey % 10, 0)
         AS safe_div,
       TRY_CAST(substr(o_orderdate::VARCHAR, 1, 4) AS BIGINT) AS year_num,
       CASE WHEN o_orderkey % 3 + 1 <= 2
            THEN ['a','b'][CAST(o_orderkey % 3 + 1 AS INTEGER)] END
         AS maybe_elem
FROM orders
WHERE o_orderkey <= 200
"""


@query("q_fn_try_family", _TRY_ORACLE)
def q_fn_try_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("pri_as_int"),
        F.expr(
            "try_divide(CAST(o_totalprice AS DOUBLE), o_orderkey % 10)"
        ).alias("safe_div"),
        F.expr(
            "try_cast(substr(CAST(o_orderdate AS STRING), 1, 4) AS BIGINT)"
        ).alias("year_num"),
        F.expr(
            "try_element_at(array('a','b'), CAST(o_orderkey % 3 + 1 AS INT))"
        ).alias("maybe_elem"),
    )


# -- X473 Spark 4.1 convenience function surface -------------------------------
#
# The 4.1 additions a migrating SQL user reaches for first: monthname /
# dayname (locale-pinned English abbreviations — DuckDB mirrors via
# strftime %b/%a) and the null↔zero bridges zeroifnull / nullifzero
# (DuckDB mirrors with COALESCE / NULLIF). Stateless projection.

_V41_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%b') AS mon_name,
       strftime(o_orderdate, '%a') AS day_name,
       COALESCE(NULLIF(o_orderkey % 7, 0), 0) AS mod7_zero_kept,
       NULLIF(o_orderkey % 7, 0) AS mod7_zero_nulled
FROM orders WHERE o_orderkey <= 500
"""


@query("q_fn_v41_datetime_null", _V41_ORACLE)
def q_fn_v41_datetime_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.expr("monthname(o_orderdate)").alias("mon_name"),
        F.expr("dayname(o_orderdate)").alias("day_name"),
        F.expr("zeroifnull(nullifzero(o_orderkey % 7))").alias(
            "mod7_zero_kept"
        ),
        F.expr("nullifzero(o_orderkey % 7)").alias("mod7_zero_nulled"),
    )
