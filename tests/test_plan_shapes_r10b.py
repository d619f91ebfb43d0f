"""Physical-plan pins for the round-10 second/third-pass queries: the
shapes that matter at 100 TB, asserted so refactors can't silently
regress them."""

from __future__ import annotations

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import (  # noqa: F401
    analytics,
    llmops,
    relational_tpch,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import QUERIES


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_skipgram_pairs_are_narrow_no_cartesian(spark, sf_dir):
    plan = plan_of(QUERIES["corpus_skipgram_pmi"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # pair extraction is array slicing, never a positions self-join:
    # the only joins are the marginal lookups after aggregation
    assert "arrays_zip" in plan or "slice" in plan


def test_cooccurrence_broadcasts_marginals_and_takeordered(spark, sf_dir):
    plan = plan_of(QUERIES["brand_cooccurrence_lift"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # part dim + marginals


def test_rolling_active_users_broadcasts_spine(spark, sf_dir):
    plan = plan_of(QUERIES["events_rolling_active_users"](spark, sf_dir))
    # the inequality (range) join must ride a BROADCAST nested loop on
    # the tiny day spine, never a full cartesian of two big sides
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_histogram_single_broadcast_bounds(spark, sf_dir):
    plan = plan_of(QUERIES["events_value_histogram"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_q6_is_one_scan_stage(spark, sf_dir):
    plan = plan_of(QUERIES["forecast_revenue_change"](spark, sf_dir))
    assert "Join" not in plan  # pure scan->filter->agg
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any("l_shipdate" in ln for ln in scan_lines)  # pushed filter


def test_mad_broadcasts_per_type_medians(spark, sf_dir):
    plan = plan_of(QUERIES["events_mad_anomalies"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_gapfill_spine_from_bounds_not_events(spark, sf_dir):
    plan = plan_of(QUERIES["events_daily_gapfill"](spark, sf_dir))
    # the spine explodes a per-type bounds aggregate (sequence), and the
    # left join to the daily rollup must not be a cartesian
    assert "sequence(" in plan
    assert "CartesianProduct" not in plan
