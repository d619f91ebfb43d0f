"""Canonical selection per near-dup cluster: keep-the-best semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
    near_dup_clusters,
)


def _canonical(docs):
    clusters = near_dup_clusters(docs, max_bucket_size=None)
    joined = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by(
                "doc_id",
                F.col("n_chars").cast("long") * F.lit(4294967296).cast("long")
                - F.col("doc_id"),
            ).alias("canonical_doc_id"),
        )
        .filter(F.col("n_members") >= 2)
    )


def test_canonical_keeps_longest_then_smallest_id(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, len(base)),
        # one extra word keeps shingle Jaccard at 10/11 >= 0.8
        (2, base + " tail", len(base) + 5),
        (3, base, len(base)),
        # unrelated singleton must not appear
        (99, "completely different words entirely unrelated text here", 55),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = _canonical(docs).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_members == 3
    assert row.canonical_doc_id == 2  # longest wins

    # equal lengths: smallest doc_id is the deterministic tie-break
    rows_tie = [
        (10, base, len(base)),
        (11, base, len(base)),
    ]
    docs_tie = spark.createDataFrame(
        rows_tie, "doc_id long, text string, n_chars long"
    )
    out_tie = _canonical(docs_tie).collect()
    assert out_tie[0].canonical_doc_id == 10
