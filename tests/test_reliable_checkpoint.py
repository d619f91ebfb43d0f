"""Reliable-checkpoint option on iterative loops (r10 verdict #4):
``checkpoint_dir=`` swaps the per-iteration localCheckpoint for a
fault-tolerant checkpoint() without changing a single output bit."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.bpe import train_bpe
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import (
    kcore_survivors,
    label_propagation,
    pagerank,
)


def _edges(spark):
    rows = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
        (7, 8), (8, 9), (9, 7), (1, 7), (2, 5),
    ]
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_reliable_checkpoint_bit_identical(spark, tmp_path):
    e = _edges(spark)
    local = sorted(
        (r.node, r.pr_scaled) for r in pagerank(e, n_iter=6).collect()
    )
    ckpt_dir = str(tmp_path / "ckpt")
    reliable = sorted(
        (r.node, r.pr_scaled)
        for r in pagerank(e, n_iter=6, checkpoint_dir=ckpt_dir).collect()
    )
    assert local == reliable
    # the reliable run actually wrote RDD checkpoint files
    found = [
        f for root, _, files in os.walk(ckpt_dir) for f in files
    ]
    assert found, "no checkpoint files written"


def test_lpa_and_kcore_reliable_checkpoint_bit_identical(spark, tmp_path):
    e = _edges(spark)
    ckpt = str(tmp_path / "ckpt2")
    assert sorted(map(tuple, label_propagation(e, n_iter=4).collect())) == (
        sorted(
            map(
                tuple,
                label_propagation(e, n_iter=4, checkpoint_dir=ckpt).collect(),
            )
        )
    )
    assert sorted(map(tuple, kcore_survivors(e, k=2).collect())) == sorted(
        map(tuple, kcore_survivors(e, k=2, checkpoint_dir=ckpt).collect())
    )


def test_bpe_reliable_checkpoint_bit_identical(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new newer"),
            (3, "low new lower newer low"),
        ],
        "doc_id long, text string",
    )
    merges_a, syms_a = train_bpe(docs, n_merges=6)
    merges_b, syms_b = train_bpe(
        docs, n_merges=6, checkpoint_dir=str(tmp_path / "ckpt3")
    )
    assert merges_a == merges_b
    key = lambda df: sorted(
        (r["word"], r["count"], tuple(r["syms"])) for r in df.collect()
    )
    assert key(syms_a) == key(syms_b)
