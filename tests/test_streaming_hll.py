"""Streaming deterministic HLL: register state folds across
micro-batches, the estimate equals the batch operator on every prefix,
and state survives a checkpoint restart."""

from __future__ import annotations

import json

from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.hll import (
    hll_estimate_from_registers,
    streaming_hll_distinct,
)


def _write(path, name, rows):
    with open(path / name, "w") as f:
        for k, e in rows:
            f.write(json.dumps({"key": k, "element": e}) + "\n")


def _batch_estimate(spark, rows):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sketches import (
        hll_estimate,
    )

    df = spark.createDataFrame(rows, "key string, element string")
    return {
        r["key"]: r["n_users_hll"]
        for r in hll_estimate(df, ["key"], "element").collect()
    }


def test_streaming_estimate_equals_batch_on_every_prefix(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    b1 = [("a", f"u{i}") for i in range(40)] + [("b", f"v{i}") for i in range(7)]
    b2 = [("a", f"u{i}") for i in range(20, 90)] + [("b", "v0")]
    _write(inp, "b1.json", b1)
    _write(inp, "b2.json", b2)

    stream = (
        spark.readStream.schema("key string, element string")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        streaming_hll_distinct(stream)
        .writeStream.format("memory")
        .queryName("hll_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hll_updates").collect()

    # after batch 1 the 'a' estimate equals batch-HLL over b1; after
    # batch 2 it equals batch-HLL over b1+b2 — register max makes the
    # stream bit-equal to the batch operator on every prefix
    a_updates = sorted(
        (r["n_seen"], r["n_distinct_hll"]) for r in rows if r["key"] == "a"
    )
    assert a_updates[0] == (40, _batch_estimate(spark, b1)["a"])
    assert a_updates[1] == (110, _batch_estimate(spark, b1 + b2)["a"])
    b_updates = sorted(
        (r["n_seen"], r["n_distinct_hll"]) for r in rows if r["key"] == "b"
    )
    assert b_updates[-1] == (8, _batch_estimate(spark, b1 + b2)["b"])


def test_streaming_hll_state_survives_restart(spark, tmp_path):
    inp = tmp_path / "in2"
    inp.mkdir()
    ck = str(tmp_path / "ck2")
    out_dir = str(tmp_path / "out2")

    def run_once():
        stream = (
            spark.readStream.schema("key string, element string")
            .option("maxFilesPerTrigger", 1)
            .json(str(inp))
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            streaming_hll_distinct(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rows1 = [("k", f"x{i}") for i in range(30)]
    _write(inp, "b1.json", rows1)
    run_once()
    rows2 = [("k", f"x{i}") for i in range(10, 60)]
    _write(inp, "b2.json", rows2)
    run_once()  # restart from checkpoint: registers must resume, not reset

    got = {
        (r["n_seen"], r["n_distinct_hll"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (80, _batch_estimate(spark, rows1 + rows2)["k"]) in got


def test_estimator_helper_matches_batch_branches():
    # raw branch: saturated-ish registers; ln branch: sparse registers
    sparse = [0] * 256
    sparse[3] = 2
    est = hll_estimate_from_registers(sparse)
    import math

    assert est == round(256.0 * math.log(256.0 / 255.0), 4)
    assert hll_estimate_from_registers([0] * 256) == 0.0
