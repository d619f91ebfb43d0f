"""Physical-plan pins for the round-7 third-pass operators: the shapes
that matter at 100 TB, asserted so a refactor can't silently regress
them into broadcast-less shuffles or cartesian products.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.heavyhitters import (
    heavy_hitters,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.importance import (
    importance_scores,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.scd import scd2_apply
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
    knn_graph,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _items(spark):
    return spark.createDataFrame(
        [(f"tok_{i % 7}",) for i in range(500)], "token string"
    )


def test_heavy_hitters_recount_is_broadcast_no_smj(spark):
    plan = plan_of(heavy_hitters(_items(spark), "token", k=5))
    # the candidate set must BROADCAST into the tagging join — a
    # sort-merge join here would shuffle the full stream by token
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_importance_bucket_stats_join_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma", i % 2 == 0) for i in range(50)],
        "doc_id long, text string, t boolean",
    )
    plan = plan_of(importance_scores(docs, F.col("t")))
    # the 4096-row bucket-stats table rides a broadcast; the token
    # stream must never shuffle on bucket
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scd2_apply_is_one_join(spark):
    import datetime

    dim = spark.createDataFrame(
        [(1, "a", datetime.datetime(2020, 1, 1), None)],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [(1, "b", datetime.datetime(2021, 1, 1))],
        "k long, attr string, eff_ts timestamp",
    )
    plan = plan_of(scd2_apply(dim, upd, ["k"], ["attr"]))
    # close/open/insert/no-op all derive from ONE full-outer equi join
    # executed ONCE (struct-array + explode, not filter+union per row
    # class, which would re-run the join and re-scan both inputs 3x)
    n_joins = plan.count("Join ")
    assert n_joins == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_graph_rescore_joins_are_equi(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    plan = plan_of(knn_graph(df, k=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the per-source top-k runs a PARTITIONED window (keyed by src),
    # never an unpartitioned global-sort WindowExec
    assert "Window" in plan
    import re

    win = re.search(r"Window \[[^\]]*\], \[(\w+)", plan)
    assert win is not None and win.group(1) == "src"
