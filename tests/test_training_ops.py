"""Plan-shape pins for the training-data operators added in round 6:
the scale properties (narrow hash-split, no cartesian in contamination,
narrow multimodal chain) are asserted on the executed plan, same
contract as test_relational.py."""

from __future__ import annotations

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
    corpus_contamination,
    corpus_train_split,
    multimodal_frame_sample,
    multimodal_resize,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_train_split_is_narrow_single_shuffle(spark, sf_dir):
    df = corpus_train_split(spark, sf_dir)
    plan = plan_of(df)
    # md5 bucketing is pure JVM column work: no Python eval anywhere,
    # and the ONLY exchange is the final groupBy's (partial agg before it)
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan or "HashAggregate" in plan


def test_contamination_no_cartesian(spark, sf_dir):
    df = corpus_contamination(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_chains_are_narrow(spark, sf_dir):
    # resize -> re-decode is two back-to-back mapInPandas stages with no
    # exchange between them (the only exchanges are the intentional
    # _docs spread and the final aggregate's)
    plan = plan_of(multimodal_resize(spark, sf_dir))
    assert plan.count("MapInPandas") == 2
    between = plan.split("MapInPandas")[1]
    assert "Exchange" not in between
    assert plan.count("Exchange") == 2

    plan2 = plan_of(multimodal_frame_sample(spark, sf_dir))
    assert plan2.count("MapInPandas") == 1
    # _docs spread + countDistinct's two-phase exchange pair; nothing else
    assert plan2.count("Exchange") == 3
