"""Z-order clustering INSIDE txlog tables (r10 verdict stretch #8):
multi-dimensional box/equality predicates prune FILES from the commit
log's z_bucket partition metadata + per-commit ZorderMeta, results
stay exact (superset + residual filter)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources import txlog


@pytest.fixture()
def table():
    with tempfile.TemporaryDirectory() as d:
        yield os.path.join(d, "t")


def _df(spark, n=4000, seed_off=0):
    return spark.range(seed_off, seed_off + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).cast("double").alias("x"),
        ((F.col("id") * 37) % 100).cast("double").alias("y"),
        F.concat(F.lit("s"), (F.col("id") % 7)).alias("tag"),
    )


def test_zordered_append_prunes_box_and_stays_exact(spark, table):
    df = _df(spark)
    v = txlog.append_zordered(
        df, table, cluster_by=["x", "y"], n_buckets=64
    )
    assert v == 0
    # full read == source
    allrows = txlog.read_zordered(spark, table)
    assert allrows.count() == 4000
    # box query: pruned read + residual filter == brute force
    box = {"x": (10.0, 25.0), "y": (40.0, 60.0)}
    pruned = txlog.read_zordered(spark, table, box=box)
    got = sorted(
        r.k
        for r in pruned.filter(
            (F.col("x") >= 10) & (F.col("x") <= 25)
            & (F.col("y") >= 40) & (F.col("y") <= 60)
        ).collect()
    )
    want = sorted(
        r.k
        for r in df.filter(
            (F.col("x") >= 10) & (F.col("x") <= 25)
            & (F.col("y") >= 40) & (F.col("y") <= 60)
        ).collect()
    )
    assert got == want and got
    # the pruning is REAL: the box read scans fewer files than the table has
    n_all = len(txlog.snapshot(table)["files"])
    n_box = len(pruned.inputFiles()) if hasattr(pruned, "inputFiles") else 0
    assert n_all > 8
    assert 0 < len(pruned.inputFiles()) < n_all


def test_zordered_hash_dim_equality_pruning(spark, table):
    df = _df(spark)
    txlog.append_zordered(
        df, table, cluster_by=["x", "tag"], n_buckets=64,
        kinds=["num", "hash"],
    )
    pruned = txlog.read_zordered(spark, table, eq={"tag": "s3"})
    got = sorted(
        r.k for r in pruned.filter(F.col("tag") == "s3").collect()
    )
    want = sorted(r.k for r in df.filter(F.col("tag") == "s3").collect())
    assert got == want and got
    assert len(pruned.inputFiles()) < len(txlog.snapshot(table)["files"])


def test_zordered_multi_commit_per_commit_meta(spark, table):
    """Two appends with DIFFERENT value ranges: each commit prunes
    against its own bounds; a box inside only the first commit's range
    still returns every matching row from both."""
    a = _df(spark, 2000)
    b = _df(spark, 2000, seed_off=1_000_000)  # same x/y ranges, new keys
    txlog.append_zordered(a, table, cluster_by=["x", "y"])
    txlog.append_zordered(b, table, cluster_by=["x", "y"])
    box = {"x": (0.0, 9.0)}
    pruned = txlog.read_zordered(spark, table, box=box)
    got = sorted(
        r.k for r in pruned.filter("x >= 0 AND x <= 9").collect()
    )
    want = sorted(
        r.k
        for r in a.unionByName(b).filter("x >= 0 AND x <= 9").collect()
    )
    assert got == want


def test_zordered_time_travel_and_acid(spark, table):
    """z-ordered commits are ordinary commits: snapshot isolation and
    time travel hold; a plain append mixes in and is conservatively
    kept by pruned reads."""
    txlog.append_zordered(_df(spark, 1000), table, cluster_by=["x", "y"])
    txlog.append(_df(spark, 500, seed_off=5_000_000), table)
    assert txlog.read_zordered(spark, table).count() == 1500
    assert txlog.read_zordered(spark, table, version=0).count() == 1000
    # box read keeps every plain-append file (no z metadata) — results
    # after residual filtering stay exact
    pruned = txlog.read_zordered(
        spark, table, box={"x": (0.0, 4.0), "y": (0.0, 99.0)}
    )
    got = pruned.filter("x <= 4").count()
    want = 1500 - txlog.read_table(spark, table).filter("x > 4").count()
    assert got == want
