"""Streaming bottom-k sampled quantiles: the sample after any prefix
equals the batch bottom-k rule, and the interpolation matches Spark's
`percentile` on the identical sample."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.quantiles import (
    SAMPLE_SIZE,
    interpolated_quantile,
    sample_priority,
    streaming_sampled_quantiles,
)


def _write(path, name, rows):
    with open(path / name, "w") as f:
        for k, i, v in rows:
            f.write(
                json.dumps({"key": k, "element_id": i, "value": v}) + "\n"
            )


def _batch_quantiles(spark, rows):
    """The batch query's rule on the same data: bottom-k by
    md5(id || 'qsamp'), then Spark percentile over the sample."""
    df = spark.createDataFrame(
        rows, "key string, element_id string, value double"
    )
    from pyspark.sql import Window

    pri = F.md5(F.concat(F.col("element_id"), F.lit("qsamp")))
    w = Window.partitionBy("key").orderBy(pri, "element_id")
    samp = df.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= SAMPLE_SIZE
    )
    return {
        r["key"]: (r["p25"], r["p50"], r["p75"])
        for r in samp.groupBy("key")
        .agg(
            F.percentile("value", 0.25).alias("p25"),
            F.percentile("value", 0.50).alias("p50"),
            F.percentile("value", 0.75).alias("p75"),
        )
        .collect()
    }


def test_streaming_quantiles_equal_batch_rule_on_every_prefix(
    spark, tmp_path
):
    inp = tmp_path / "in"
    inp.mkdir()
    b1 = [("a", f"e{i}", float(i % 97)) for i in range(600)]
    b2 = [("a", f"f{i}", float((i * 7) % 101)) for i in range(300)]
    _write(inp, "b1.json", b1)
    _write(inp, "b2.json", b2)

    stream = (
        spark.readStream.schema(
            "key string, element_id string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        streaming_sampled_quantiles(stream)
        .writeStream.format("memory")
        .queryName("q_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("SELECT * FROM q_updates").collect(),
        key=lambda r: r["n_seen"],
    )
    assert [r["n_seen"] for r in rows] == [600, 900]
    assert all(r["sample_n"] == SAMPLE_SIZE for r in rows)

    want1 = _batch_quantiles(spark, b1)["a"]
    want2 = _batch_quantiles(spark, b1 + b2)["a"]
    assert (rows[0]["p25"], rows[0]["p50"], rows[0]["p75"]) == want1
    assert (rows[1]["p25"], rows[1]["p50"], rows[1]["p75"]) == want2


def test_small_group_sample_is_exact(spark, tmp_path):
    inp = tmp_path / "in2"
    inp.mkdir()
    rows = [("k", f"e{i}", float(v)) for i, v in enumerate([5, 1, 9, 3])]
    _write(inp, "b1.json", rows)
    stream = (
        spark.readStream.schema(
            "key string, element_id string, value double"
        )
        .json(str(inp))
    )
    q = (
        streaming_sampled_quantiles(stream)
        .writeStream.format("memory")
        .queryName("q_small")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = spark.sql("SELECT * FROM q_small").collect()[0]
    # sample == whole group -> exact interpolated quantiles of {1,3,5,9}
    assert (r["p25"], r["p50"], r["p75"]) == (2.5, 4.0, 6.0)


def test_interpolation_rule_matches_spark_percentile(spark):
    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    want = df.agg(
        F.percentile("v", 0.25).alias("a"),
        F.percentile("v", 0.50).alias("b"),
        F.percentile("v", 0.75).alias("c"),
    ).collect()[0]
    sv = sorted(vals)
    assert interpolated_quantile(sv, 0.25) == want["a"]
    assert interpolated_quantile(sv, 0.50) == want["b"]
    assert interpolated_quantile(sv, 0.75) == want["c"]


def test_priority_rule_matches_batch_sql_md5():
    import hashlib

    assert sample_priority("42") == hashlib.md5(b"42qsamp").hexdigest()
