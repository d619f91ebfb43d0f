"""Z-order layout (operators/layout.py): Morton interleave mapping,
bucket->hyper-rectangle decoding, the candidate superset guarantee,
result parity with a raw scan, and the PartitionFilters plan shape the
layout exists to produce."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.layout import (
    ZorderMeta,
    _bucket_dim_ranges,
    _interleave,
    read_zorder_meta,
    write_zordered,
    zbucket_candidates,
    zorder_box_filter,
    zorder_columns,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import load

BOX = {"user_id": (30.0, 90.0), "value": (40.0, 160.0)}


@pytest.fixture(scope="module")
def ztable(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "events")
    df = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    meta = write_zordered(df, path, ["user_id", "value"],
                          bits_per_dim=8, n_buckets=64)
    return path, meta, df


def test_interleave_known_bits(spark):
    # dim0=0b11 (bits 0,1), dim1=0b01 (bit 0): z bit layout i*k+j ->
    # dim0 bit0->z0, dim1 bit0->z1, dim0 bit1->z2, dim1 bit1->z3
    df = spark.range(1).select(
        _interleave([F.lit(3).cast("long"), F.lit(1).cast("long")], 2).alias("z")
    )
    assert df.collect()[0].z == 0b0111


def test_bucket_ranges_cover_their_cells():
    # every cell vector's bucket must report dim ranges containing it
    meta = ZorderMeta(cols=["a", "b"], bits_per_dim=4, n_buckets=16,
                      mins=[0.0, 0.0], maxs=[16.0, 16.0])
    k, bits = 2, 4
    shift = k * bits - int(math.log2(meta.n_buckets))
    for ca in range(16):
        for cb in range(16):
            z = 0
            for i in range(bits):
                z |= ((ca >> i) & 1) << (i * k)
                z |= ((cb >> i) & 1) << (i * k + 1)
            bucket = z >> shift
            (lo_a, hi_a), (lo_b, hi_b) = _bucket_dim_ranges(meta, bucket)
            assert lo_a <= ca <= hi_a and lo_b <= cb <= hi_b


def test_candidates_are_a_superset(ztable, spark):
    path, meta, _ = ztable
    t = spark.read.parquet(path)
    cands = zbucket_candidates(meta, BOX)
    residual = F.col("user_id").between(30, 90) & F.col("value").between(
        40.0, 160.0
    )
    escaped = t.filter(residual & ~F.col("z_bucket").isin(cands)).count()
    assert escaped == 0, "box rows outside candidate buckets"


def test_candidates_actually_prune(ztable):
    _, meta, _ = ztable
    cands = zbucket_candidates(meta, BOX)
    # ~10% box volume: far fewer than all buckets qualify
    assert 0 < len(cands) < meta.n_buckets * 0.8


def test_box_query_matches_raw_scan(ztable, spark):
    path, meta, raw = ztable
    t = spark.read.parquet(path)
    got = sorted(
        (r.event_id for r in
         t.filter(zorder_box_filter(meta, BOX)).select("event_id").collect())
    )
    want = sorted(
        (r.event_id for r in
         raw.filter(
             F.col("user_id").between(30, 90)
             & F.col("value").between(40.0, 160.0)
         ).select("event_id").collect())
    )
    assert got == want


def test_partition_filter_in_plan(ztable, spark):
    path, meta, _ = ztable
    t = spark.read.parquet(path)
    df = t.filter(zorder_box_filter(meta, BOX))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "z_bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "bucket IN-list did not land as a partition filter"


def test_sidecar_roundtrip(ztable):
    path, meta, _ = ztable
    assert read_zorder_meta(path) == meta
    assert os.path.exists(os.path.join(path, "_SUCCESS"))


def test_nulls_and_constant_columns(spark, tmp_path):
    from pyspark.sql import Row

    rows = [Row(i=i, a=float(i % 7) if i % 5 else None, b=1.0)
            for i in range(50)]
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "z")
    meta = write_zordered(df, path, ["a", "b"], bits_per_dim=4, n_buckets=4)
    t = spark.read.parquet(path)
    assert t.count() == 50  # nulls and the constant dim survive the layout
    got = t.filter(zorder_box_filter(meta, {"a": (2.0, 4.0)})).select("i")
    want = df.filter(F.col("a").between(2.0, 4.0)).select("i")
    assert sorted(r.i for r in got.collect()) == sorted(
        r.i for r in want.collect()
    )


def test_rejects_bad_config(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="power of two"):
        write_zordered(df, "/tmp/never", ["user_id", "value"], n_buckets=63)
    meta = ZorderMeta(["a"] * 8, 8, 64, [0.0] * 8, [1.0] * 8)
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_columns(df.withColumn("a", F.lit(1.0)), meta)


@pytest.fixture(scope="module")
def hash_ztable(spark, sf_dir, tmp_path_factory):
    # (ts numeric, event_type hash-string) — the log-table key shape
    path = str(tmp_path_factory.mktemp("zorder") / "events_hash")
    df = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    meta = write_zordered(df, path, ["ts", "event_type"],
                          bits_per_dim=8, n_buckets=64)
    return path, meta, df


def test_hash_dim_kind_inferred_and_persisted(hash_ztable):
    path, meta, _ = hash_ztable
    assert meta.kinds == ["num", "hash"]
    assert read_zorder_meta(path).kinds == ["num", "hash"]


def test_hash_dim_equality_matches_raw_scan(hash_ztable, spark):
    import datetime as dt
    path, meta, df = hash_ztable
    t = spark.read.parquet(path)
    lo, hi = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20)
    pred = zorder_box_filter(
        meta,
        box={"ts": (lo.timestamp(), hi.timestamp())},
        eq={"event_type": "click"},
        spark=spark,
        residual_box={"ts": (lo, hi)},
    )
    got = sorted(r.event_id for r in t.filter(pred).collect())
    want = sorted(
        r.event_id
        for r in df.filter(
            (F.col("event_type") == "click") & F.col("ts").between(lo, hi)
        ).collect()
    )
    assert got == want and len(got) > 0


def test_hash_dim_equality_prunes_partitions(hash_ztable, spark):
    # the string-equality predicate must pin ONE hash cell, shrinking
    # the bucket IN-list well below all 64 — and land as a
    # PartitionFilter on z_bucket in the physical plan
    path, meta, _ = hash_ztable
    cands = zbucket_candidates(
        meta, {}, eq={"event_type": "click"}, spark=spark
    )
    assert 0 < len(cands) < meta.n_buckets / 2
    t = spark.read.parquet(path)
    df = t.filter(
        zorder_box_filter(meta, {}, eq={"event_type": "click"}, spark=spark)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "z_bucket" in pf, "hash-dim IN-list not a partition filter"


def test_hash_dim_rejects_range_and_num_rejects_eq(hash_ztable, spark):
    _, meta, _ = hash_ztable
    with pytest.raises(ValueError, match="range predicate on hash dim"):
        zbucket_candidates(meta, {"event_type": (0.0, 1.0)})
    with pytest.raises(ValueError, match="eq predicate on non-hash dim"):
        zbucket_candidates(meta, {}, eq={"ts": 5}, spark=spark)
