"""Misra-Gries heavy hitters: sketch guarantees + exact final answer.

The corpus tables are near-uniform, so these tests build skewed data
(Zipf-ish) where the sketch's thinning actually fires, and verify the
three properties that make the operator safe at scale: the candidate
superset guarantee, the per-partition candidate bound, and exactness /
partition-layout independence of the final answer.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_candidates,
)


def _skewed_items(spark, n_rows=20_000, n_partitions=8):
    # deterministic Zipf-ish stream: item i appears ~ n/(i+1) times
    rng = random.Random(42)
    vals = []
    for i in range(200):
        vals.extend([f"item_{i:03d}"] * (n_rows // (i + 1) // 12))
    rng.shuffle(vals)
    return spark.createDataFrame(
        [(v,) for v in vals], "token string"
    ).repartition(n_partitions)


def _exact_hh(df, k):
    total = df.count()
    return {
        (r.token, r.n)
        for r in df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * k > total)
        .collect()
    }


def test_candidate_superset_guarantee(spark):
    items = _skewed_items(spark)
    k = 20
    true_hh = {t for t, _ in _exact_hh(items, k)}
    assert true_hh  # the data must actually contain heavy hitters
    cands = {r.item for r in mg_candidates(items, "token", k).collect()}
    # every true heavy hitter must survive in some partition's summary
    assert true_hh <= cands


def test_candidate_bound_per_partition(spark):
    items = _skewed_items(spark, n_partitions=4)
    budget = 10
    per_part = (
        mg_candidates(items, "token", budget)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r.n <= budget for r in per_part)


def test_heavy_hitters_exact_and_layout_independent(spark):
    k = 25
    items = _skewed_items(spark)
    expected = _exact_hh(items, k)
    got8 = {
        (r.item, r.n) for r in heavy_hitters(items, "token", k=k).collect()
    }
    got1 = {
        (r.item, r.n)
        for r in heavy_hitters(items.coalesce(1), "token", k=k).collect()
    }
    assert got8 == expected
    assert got1 == expected  # sketch state differs per layout; answer must not


def test_n_total_counts_overflow_bucket(spark):
    items = _skewed_items(spark, n_rows=5_000)
    row = heavy_hitters(items, "token", k=10).first()
    assert row is not None
    assert row.n_total == items.count()


def test_null_items_excluded_from_total(spark):
    # NULLs can never be candidates (mg_candidates drops them), so they
    # must not inflate the phase-2 threshold denominator either: the
    # contract is count * k > n_total over NON-NULL items
    rows = [("hot",)] * 30 + [("x%d" % i,) for i in range(60)] + [(None,)] * 200
    items = spark.createDataFrame(rows, "token string").repartition(4)
    out = heavy_hitters(items, "token", k=3).collect()
    # non-null stream: 90 rows, hot=30 -> 30*3 > 90 is FALSE (strict),
    # so use k=4: 30*4=120 > 90 -> hot is a heavy hitter. With NULLs
    # wrongly counted (n_total=290) 30*4=120 > 290 would fail.
    out4 = heavy_hitters(items, "token", k=4).collect()
    assert [r.item for r in out4] == ["hot"]
    assert out4[0].n == 30 and out4[0].n_total == 90
    assert [r.item for r in out] == []  # strict threshold boundary
