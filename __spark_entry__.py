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
    llmops,
    logsim,
    relational,
    relational_tpch,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0. Honors SPARK_GRAFT_SF_DIR so
    the same entry benches at any scale (defaults to the smoke-test sf)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    name = "log_pipeline_e2e" if "log_pipeline_e2e" in registry.QUERIES else "log_parse_severity"
    return registry.QUERIES[name](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omissions -> rows-only check)."""
    return dict(registry.ORACLES)
