"""Bucketed-join plan test: the lineitem⋈orders join on bucketed tables
must run WITHOUT an Exchange (shuffle) on either side — the write-time
partitioning contract that makes repeated fact-fact joins affordable at
scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import load


@pytest.fixture()
def no_broadcast(spark):
    """Force a non-broadcast join so the Exchange assertion is
    meaningful on the small test tables."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    write_bucketed(
        load(spark, sf_dir, "orders"), "b_orders", "o_orderkey", num_buckets=8
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", num_buckets=8
    )
    joined = read_bucketed(spark, "b_lineitem").join(
        read_bucketed(spark, "b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # co-located buckets: no shuffle
    # equivalent unbucketed join MUST shuffle — proves the assertion bites
    plain = load(spark, sf_dir, "lineitem").join(
        load(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
    # and the contents agree
    assert joined.count() == plain.count()


def test_bucketed_aggregation_has_no_exchange(spark, sf_dir, no_broadcast):
    agg = (
        read_bucketed(spark, "b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
