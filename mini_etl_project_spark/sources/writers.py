"""Load dispatch (reference R20–R23, ETL_PROJECT.py:304-324).

Two modes per sink:

- **distributed** (default, the 100 TB path): ``df.write`` produces a
  partitioned directory; CSV/JSON/Parquet all scale.
- **compat single-file** (``single_file=True``): byte-shape parity with the
  reference's one-file outputs via a guarded ``toPandas`` shim — refuses
  above ``max_driver_rows`` so a 100 TB frame can never be collected by
  accident.

SQLite (R23) is inherently a single-connection driver-side sink; the shim
writes table ``cleaned_data`` with overwrite semantics like the reference.
A JDBC path (``df.write.jdbc``) is the cluster-side equivalent when a
driver jar is available (none in this container).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

DEFAULT_MAX_DRIVER_ROWS = 5_000_000


def _to_pandas_guarded(df: DataFrame, max_rows: int):
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"single-file/driver sink refused: {n} rows > {max_rows} cap; "
            "use distributed mode"
        )
    return df.toPandas()


def load(
    df: DataFrame,
    output_path: str | None = None,
    db_connection: Any = None,
    single_file: bool = True,
    max_driver_rows: int = DEFAULT_MAX_DRIVER_ROWS,
) -> DataFrame:
    """Persist ``df`` to a path (by suffix) and/or a SQLite connection.

    Returns the input frame (like the reference's ``load``).
    """
    if output_path is not None:
        lower = output_path.lower()
        if lower.endswith(".parquet"):
            df.write.mode("overwrite").parquet(output_path)
        elif lower.endswith(".csv"):
            if single_file:
                _to_pandas_guarded(df, max_driver_rows).to_csv(
                    output_path, index=False
                )
            else:
                df.write.mode("overwrite").option("header", True).csv(output_path)
        elif lower.endswith(".json"):
            if single_file:
                _to_pandas_guarded(df, max_driver_rows).to_json(
                    output_path, orient="records", indent=2
                )
            else:
                df.write.mode("overwrite").json(output_path)
        elif lower.endswith((".xlsx", ".xls")):
            _to_pandas_guarded(df, max_driver_rows).to_excel(
                output_path, index=False
            )
        else:
            raise ValueError(f"unsupported output format: {output_path}")
    if db_connection is not None:
        _to_pandas_guarded(df, max_driver_rows).to_sql(
            "cleaned_data", db_connection, if_exists="replace", index=False
        )
    return df
