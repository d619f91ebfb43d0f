"""DSIR importance scoring: discrimination, exactness, invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.importance import (
    importance_scores,
)


def _corpus(spark):
    # target dialect uses alpha/beta/gamma; background uses delta/eps.
    # 'mixed' docs straddle the two and must land between them.
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma alpha beta", "target"))
    for i in range(30, 90):
        rows.append((i, "delta epsilon zeta delta epsilon", "pool"))
    for i in range(90, 100):
        rows.append((i, "alpha beta delta epsilon", "mixed"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_target_dialect_scores_highest(spark):
    docs = _corpus(spark)
    scored = importance_scores(docs, F.col("kind") == "target").join(
        docs.select("doc_id", "kind"), "doc_id"
    )
    means = {
        r.kind: r.m
        for r in scored.groupBy("kind").agg(F.avg("dsir_logratio").alias("m")).collect()
    }
    assert means["target"] > means["mixed"] > means["pool"]


def test_every_doc_scored_and_hits_bounded(spark):
    docs = _corpus(spark)
    rows = importance_scores(docs, F.col("kind") == "target").collect()
    assert len(rows) == docs.count()
    assert all(0 <= r.target_hits <= r.n_tokens for r in rows)
    # target-dialect tokens all lean target: hits == n_tokens there
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].target_hits == by_id[0].n_tokens


def test_scores_partition_layout_independent(spark):
    docs = _corpus(spark)
    a = {
        (r.doc_id, r.dsir_logratio)
        for r in importance_scores(docs, F.col("kind") == "target").collect()
    }
    b = {
        (r.doc_id, r.dsir_logratio)
        for r in importance_scores(
            docs.repartition(7), F.col("kind") == "target"
        ).collect()
    }
    assert a == b
