"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query (full parse kernel over
Kinesis-class messages synthesized from the sf0.001 events table).
queries()/oracle_sql() expose every implemented operator from
SURVEY.md §2 with DuckDB-checkable SQL equivalents.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import registry
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import (  # noqa: F401
    analytics,
    logsim,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["log_parse_severity"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omissions -> rows-only check)."""
    return dict(registry.ORACLES)
