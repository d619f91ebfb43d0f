"""Salted-join equivalence: identical results to the plain join, with
the skewed key's rows spread across salt partitions."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.skew import (
    salted_join,
    with_salt,
)


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows hit one hot key — the classic melted-reducer shape
    facts = spark.createDataFrame(
        [Row(row_id=i, k=0 if i % 10 else i % 7, v=float(i)) for i in range(2000)]
    )
    dim = spark.createDataFrame([Row(k=i, label=f"d{i}") for i in range(7)])

    plain = facts.join(dim, "k").groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(facts, dim, on="k", unique_col="row_id").groupBy(
        "label"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_distributes_hot_key(spark):
    facts = spark.createDataFrame([Row(row_id=i, k=0) for i in range(1000)])
    spread = (
        with_salt(facts, "row_id", 8)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(spread) == 8  # all salts hit
    assert max(r["count"] for r in spread) < 1000 * 0.3  # no single melted bucket
