"""mini_etl_project_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference AutoETL pipeline (``/root/reference/ETL_PROJECT.py``), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, designed for a
multi-executor cluster at 100 TB scale while remaining testable on
``local[*]``.

Layout (see SURVEY.md §7):

- ``session``    — SparkSession factory (AQE on, UTC, Arrow on)
- ``sources``    — extract/load dispatchers (CSV/JSON/Parquet/Excel/JDBC)
- ``functions``  — reusable Column-expression builders (dates, cleaning,
                   text, vectors)
- ``plans``      — the profile→plan AutoETL core (profiling, cleaning plan,
                   imputation, outliers, summary, report)
- ``operators``  — query/extension operators (dedup, similarity, top-k,
                   as-of join, text analysis)
- ``streaming``  — Structured Streaming operators over the events table
"""

__version__ = "0.1.0"

from mini_etl_project_spark.plans.pipeline import AutoETLPipeline  # noqa: E402
from mini_etl_project_spark.session import (  # noqa: E402
    get_spark,
    load_table,
    load_tables,
    register_views,
)
from mini_etl_project_spark.sources.readers import extract  # noqa: E402
from mini_etl_project_spark.sources.writers import load  # noqa: E402

__all__ = [
    "AutoETLPipeline",
    "extract",
    "get_spark",
    "load",
    "load_table",
    "load_tables",
    "register_views",
]
