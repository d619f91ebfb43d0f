"""Round-12 ADVICE regression tests: dim forwarding through the
exact-arith IVF fit, the cut_lineage checkpoint-dir guard, z-order
reads that prune every file, and the cycle guard's exact basename
match."""

from __future__ import annotations

import math
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import (
    ivf_exact,
    lineage,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources import txlog
from cloudwatch_sematext_aws_lambda_log_shipper_spark.control_client import (
    LocalLogsClient,
    process_all,
)


def _toy_corpus(spark, n=40, dim=8, seed=3):
    """Deterministic small-dim corpus (no RNG dependency on numpy)."""
    rows = []
    for i in range(n):
        v = [
            math.sin(0.7 * i + 1.3 * d + seed) for d in range(dim)
        ]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_fit_centroids_exact_forwards_dim(spark):
    # ADVICE r12 #1: the fit normalized at hardcoded dim=64 — for
    # dim=8 getItem(8..63) nulls the norm dot, greatest() collapses the
    # norm to 1e-12 and every "unit" vector explodes by 1e12. The fix
    # forwards dim to _unit: centroids must come back unit-norm.
    corpus = _toy_corpus(spark, n=40, dim=8)
    centers = ivf_exact.fit_centroids_exact(
        corpus, n_clusters=4, iters=2, dim=8
    )
    assert len(centers) == 4
    for c in centers:
        assert len(c) == 8
        nrm = math.sqrt(sum(x * x for x in c))
        assert abs(nrm - 1.0) < 1e-6, nrm


def test_ann_topk_ivf_exact_small_dim_end_to_end(spark):
    # the search entry point forwards dim into its internal fit: at
    # dim=8 the top-1 neighbor of a corpus vector used as the query is
    # itself-adjacent (cosine <= 1 and finite — the broken norm made
    # cosines ~1e24)
    corpus = _toy_corpus(spark, n=40, dim=8)
    queries = corpus.filter(F.col("vec_id") < 3)
    out = ivf_exact.ann_topk_ivf_exact(
        corpus, queries, k=3, n_clusters=4, nprobe=2, iters=1, dim=8
    ).collect()
    assert len(out) == 9
    assert all(abs(r["cosine"]) <= 1.000001 for r in out)


def test_cut_lineage_reuses_checkpoint_dir(spark):
    # ADVICE r12 #2: Spark stores the dir scheme-qualified + UUID, so
    # the old startswith() guard never matched and every call created a
    # sibling UUID dir. Three cuts against one dir => one UUID subdir.
    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "ckpt")
        df = spark.range(10)
        for _ in range(3):
            df = lineage.cut_lineage(df, checkpoint_dir=ckpt)
        subdirs = [
            p for p in os.listdir(ckpt)
            if os.path.isdir(os.path.join(ckpt, p))
        ]
        assert len(subdirs) == 1, subdirs
        assert df.count() == 10


def test_read_zordered_empty_prune_returns_empty_frame(spark):
    # ADVICE r12 #3: a selective eq predicate whose candidate z_buckets
    # hold no files must return 0 rows with the table schema, not raise.
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.layout import (
        ZorderMeta,
        hash_cell_value,
    )

    with tempfile.TemporaryDirectory() as d:
        table = os.path.join(d, "t")
        # single tag value => exactly one occupied hash cell; find a
        # probe value landing in a DIFFERENT cell (deterministic: the
        # same JVM hash the reader will use)
        df = spark.range(0, 2000).select(
            F.col("id").alias("k"),
            (F.col("id") % 100).cast("double").alias("x"),
            F.lit("only-tag").alias("tag"),
        )
        txlog.append_zordered(
            df, table, cluster_by=["x", "tag"], n_buckets=64,
            kinds=["num", "hash"],
        )
        meta = ZorderMeta.from_json(
            txlog._read_commit(table, 0)["zorder"]
        )
        occupied = hash_cell_value(spark, "only-tag", meta.bits_per_dim)
        probe = next(
            f"miss{i}"
            for i in range(200)
            if hash_cell_value(spark, f"miss{i}", meta.bits_per_dim)
            != occupied
        )
        out = txlog.read_zordered(spark, table, eq={"tag": probe})
        assert out.count() == 0
        assert set(out.columns) >= {"k", "x", "tag"}


def test_process_all_cycle_guard_exact_basename(tmp_path):
    # ADVICE r12 #4: own_name 'shipper' must exclude .../shipper but
    # NOT .../other-shipper (the old suffix test dropped both).
    base = str(tmp_path / "groups")
    for n in ["aws/lambda/shipper", "aws/lambda/other-shipper",
              "aws/lambda/fn001"]:
        os.makedirs(os.path.join(base, n), exist_ok=True)
    c = LocalLogsClient(base, str(tmp_path / "registry.json"))
    out = process_all(
        c,
        prefix="aws/lambda",
        own_name="shipper",
        filter_name="f",
        destination_arn="arn:d",
    )
    assert sorted(out["sources"]) == [
        "aws/lambda/fn001", "aws/lambda/other-shipper"
    ]
