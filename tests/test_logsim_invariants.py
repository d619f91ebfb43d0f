"""Pin the data invariants the logsim oracles rely on (ADVICE r1): the
events.props column must stay non-null valid JSON without a string
'message' key and without structured-pattern matches — otherwise the
Spark kernel and the DuckDB oracle could diverge for data (not engine)
reasons and the failure would be misattributed."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.functions import (
    STRUCTURED_LOG_PATTERN,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import load


def test_events_props_invariants(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    checks = events.select(
        F.count(F.when(F.col("props").isNull(), 1)).alias("null_props"),
        F.count(F.when(F.try_parse_json("props").isNull(), 1)).alias("bad_json"),
        F.count(
            F.when(
                F.expr(
                    "schema_of_variant(try_variant_get(try_parse_json(props), '$.message'))"
                )
                == "STRING",
                1,
            )
        ).alias("string_message_key"),
        F.count(F.when(F.col("props").rlike(STRUCTURED_LOG_PATTERN), 1)).alias(
            "structured_matches"
        ),
    ).collect()[0]
    assert checks.null_props == 0
    assert checks.bad_json == 0
    assert checks.string_message_key == 0  # would flip rows into the JSON branch
    assert checks.structured_matches == 0


def test_events_platform_prefix_absent(spark, sf_dir):
    """No synthesized message class accidentally collides with the
    platform-message prefixes (S9 would silently drop them)."""
    events = load(spark, sf_dir, "events")
    n = events.filter(
        F.col("props").startswith("START RequestId")
        | F.col("props").startswith("END RequestId")
        | F.col("props").startswith("REPORT RequestId")
    ).count()
    assert n == 0
