"""TF-IDF / centroid / anomaly queries: result sanity + plan shape.

Same contract as test_relational.py: the plan assertions pin the scale
properties (broadcast scalar join, top-k without global sort, no window
function in the anomaly path), not just the values.
"""

from __future__ import annotations

import math

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.analytics import (
    events_daily_anomalies,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
    embedding_centroids,
    tfidf_top_terms,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tfidf_topk_plan_and_monotonicity(spark, sf_dir):
    df = tfidf_top_terms(spark, sf_dir)
    plan = plan_of(df)
    # corpus-size scalar joins via broadcast, final 25 is top-k not sort
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 25
    scores = [r.tfidf for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.df <= r.total_tf  # a doc counts >=1 occurrence
        assert r.tfidf >= 0.0


def test_embedding_centroids_shape_and_unit_scale(spark, sf_dir):
    rows = embedding_centroids(spark, sf_dir).collect()
    labels = {r.label for r in rows}
    dims = {r.dim for r in rows}
    assert dims == set(range(64))
    assert len(rows) == len(labels) * 64
    # same n for every dim of a label (vectors are rectangular)
    n_by_label = {}
    for r in rows:
        n_by_label.setdefault(r.label, set()).add(r.n)
        assert abs(r.centroid) <= 1.0 + 1e-9  # unit-ish embedding space
    assert all(len(ns) == 1 for ns in n_by_label.values())


def test_events_daily_anomalies_exceed_threshold(spark, sf_dir):
    df = events_daily_anomalies(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # per-type stats broadcast back
    assert "Window" not in plan  # moments via groupBy, not window funcs
    rows = df.collect()
    for r in rows:
        assert r.cnt > r.mean_cnt + 2 * r.std_cnt - 1e-6
        assert not math.isnan(r.std_cnt)
