"""User-defined function surface — SURVEY.md §2.B Q26 (pandas UDF), Q27
(grouped-agg UDAF via applyInPandas), Q28 (Python UDTF).

UDFs are the engine's escape hatch, not its hot path — but the machinery
must work and be provably correct, so each variant computes something an
oracle can replicate: elementwise double arithmetic (deterministic per
element through Arrow), exact integer aggregation (order-independent), and
a deterministic table function.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_project_spark.queries import query
from mini_etl_project_spark.session import load_table

# -- Q26 scalar pandas UDF (Arrow-vectorized) ------------------------------

_PANDAS_UDF_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge_udf
FROM lineitem
WHERE l_orderkey % 17 = 0
"""


@query("q_udf_pandas_scalar", _PANDAS_UDF_ORACLE)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # elementwise IEEE double ops — identical to the SQL expression
        return price * (1.0 - disc) * (1.0 + tax)

    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 17 == 0).select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge_udf"),
    )


# -- Q27 grouped-aggregate UDAF via applyInPandas --------------------------
# Exact integer aggregation (quantities are integral doubles) so the
# result is order-independent — a float sum in pandas would not be.

_UDAF_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_udf_grouped_agg", _UDAF_ORACLE)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [len(pdf)],
                "total_qty": [int(pdf["l_quantity"].astype("int64").sum())],
                "min_price": [pdf["l_extendedprice"].min()],
                "max_price": [pdf["l_extendedprice"].max()],
            }
        )

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").applyInPandas(
        agg,
        "l_returnflag string, n_rows bigint, total_qty bigint, "
        "min_price double, max_price double",
    )


# -- Q28 Python UDTF (lateral table function) ------------------------------

_UDTF_ORACLE = """
SELECT p_partkey, t.word, t.idx
FROM (SELECT p_partkey, string_split(p_type, ' ') AS ws FROM part
      WHERE p_partkey % 29 = 0),
     LATERAL (SELECT ws[i] AS word, i AS idx
              FROM unnest(generate_series(1, len(ws))) u(i)) t
"""


@query("q_udtf_split_words", _UDTF_ORACLE)
def q_udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, idx int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" "), start=1):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("udtf_part")
    return spark.sql(
        """
        SELECT p_partkey, t.word, t.idx
        FROM udtf_part, LATERAL split_words(p_type) t
        WHERE p_partkey % 29 = 0
        """
    )
