"""SQL surface: register the engine's tables as views so users can work
in plain Spark SQL instead of (or alongside) the DataFrame API.

Both APIs build the same logical plans — `tests/test_sql_api.py` pins a
DataFrame query and its SQL twin to identical results — so the choice
is ergonomic, not semantic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans.registry import load
from .schemas import TEST_TABLES
from .sink import read_log_table


def register_test_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose every driver test table as a temp view named after it."""
    for t in TEST_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TEST_TABLES)


def register_log_table(spark: SparkSession, path: str,
                       view: str = "logs") -> None:
    """Expose a written log table (sink.py layout) as a view. Dotted
    reference column names stay queryable via backticks:
    SELECT `function.name` FROM logs."""
    read_log_table(spark, path).createOrReplaceTempView(view)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
