"""Count-Min sketch + Bloom pre-filter (operators/sketches.py).

The declared queries carry the oracle hash gate; these pin the
operator-level guarantees on adversarial inputs the sf corpora don't
exercise: CMS one-sided error under heavy collisions, Bloom
zero-false-negative under saturation, and layout invariance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sketches import (
    BLOOM_K,
    CMS_D,
    CMS_W,
    bloom_bits,
    bloom_prefilter,
    cms_point_estimates,
    cms_sketch,
)


def _items(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "item string")


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    # zipf-ish multiset: item-i appears 101-i times
    rows = [f"it{i}" for i in range(100) for _ in range(101 - i)]
    df = _items(spark, rows)
    sketch = cms_sketch(df, "item")
    cand = df.groupBy("item").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_point_estimates(sketch, cand, "item").collect()
    assert all(r["n_cms"] >= r["n_exact"] for r in est)
    # 100 distinct items in d=4 rows of w=512: overcount only where two
    # items share a bucket in EVERY row — bound the total slack
    n = len(rows)
    assert all((r["n_cms"] - r["n_exact"]) * CMS_W <= 3 * n for r in est)


def test_cms_sketch_is_bounded_and_layout_invariant(spark):
    rows = [f"x{i % 37}" for i in range(5000)]
    df = _items(spark, rows)
    a = sorted(map(tuple, cms_sketch(df, "item").collect()))
    b = sorted(
        map(tuple, cms_sketch(df.repartition(17), "item").collect())
    )
    assert a == b
    assert len(a) <= CMS_D * CMS_W


def test_bloom_no_false_negatives_even_saturated(spark):
    # build-side so large the bitmap saturates: every true key must
    # still pass (Bloom's hard guarantee); false positives may explode
    keys = _items(spark, [f"k{i}" for i in range(3000)]).withColumnRenamed(
        "item", "key"
    )
    bits = bloom_bits(keys, "key")
    fact = _items(
        spark, [f"k{i}" for i in range(3000)] + [f"miss{i}" for i in range(500)]
    ).withColumnRenamed("item", "key")
    passed = {r["key"] for r in bloom_prefilter(fact, bits, "key").collect()}
    assert all(f"k{i}" in passed for i in range(3000))


def test_bloom_filters_most_negatives_at_sane_load(spark):
    keys = _items(spark, [f"k{i}" for i in range(300)]).withColumnRenamed(
        "item", "key"
    )
    bits = bloom_bits(keys, "key")
    assert bits.count() <= BLOOM_K * 300
    negatives = _items(
        spark, [f"other{i}" for i in range(2000)]
    ).withColumnRenamed("item", "key")
    n_pass = bloom_prefilter(negatives, bits, "key").count()
    # load factor 300*4/65536 ~ 1.8% -> fp rate ~ (0.018)^4; allow slack
    assert n_pass <= 5


def test_bloom_prefilter_plan_is_broadcast_semi_no_shuffle(spark):
    keys = _items(spark, [f"k{i}" for i in range(50)]).withColumnRenamed(
        "item", "key"
    )
    bits = bloom_bits(keys, "key").localCheckpoint(eager=True)
    fact = _items(spark, [f"k{i}" for i in range(500)]).withColumnRenamed(
        "item", "key"
    )
    plan = (
        bloom_prefilter(fact, bits, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == BLOOM_K
    assert "LeftSemi" in plan
    # the fact side never exchanges: only broadcast exchanges appear
    import re

    non_broadcast_exchanges = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
    ]
    assert non_broadcast_exchanges == []
