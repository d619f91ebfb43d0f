"""Streaming CMS: counter state folds across micro-batches and the
running table equals the batch sketch on every prefix."""

from __future__ import annotations

import json

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sketches import (
    CMS_D,
    cms_sketch,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.cms import (
    streaming_cms_counters,
)


def _write(path, name, elements):
    with open(path / name, "w") as f:
        for e in elements:
            f.write(json.dumps({"element": e}) + "\n")


def _batch_sketch(spark, elements):
    df = spark.createDataFrame([(e,) for e in elements], "element string")
    return {
        (r["i"], r["b"]): r["c"] for r in cms_sketch(df, "element").collect()
    }


def test_streaming_counters_equal_batch_sketch(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    b1 = ["hot"] * 30 + [f"x{i}" for i in range(20)]
    b2 = ["hot"] * 15 + [f"x{i}" for i in range(10, 40)]
    _write(inp, "b1.json", b1)
    _write(inp, "b2.json", b2)

    stream = (
        spark.readStream.schema("element string")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    q = (
        streaming_cms_counters(stream)
        .writeStream.format("memory")
        .queryName("cms_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM cms_updates").collect()

    # the LAST update per (i, b) is the running total == batch sketch
    latest = {}
    for r in rows:
        cur = latest.get((r["i"], r["b"]))
        if cur is None or r["c"] > cur:
            latest[(r["i"], r["b"])] = r["c"]
    want = _batch_sketch(spark, b1 + b2)
    assert latest == want

    # per-row stream totals accumulate (each row sees every element)
    n_rows = {r["i"]: r["n_row"] for r in rows}  # last write wins per i
    assert set(n_rows) == set(range(CMS_D))
    assert all(v == len(b1) + len(b2) for v in n_rows.values())

    # point estimate for the heavy item == min over rows of its bucket
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.cms import (
        _bucket,
    )

    est = min(latest[(i, _bucket("hot", i))] for i in range(CMS_D))
    assert est >= 45  # CMS never undercounts


def test_streaming_cms_state_survives_restart(spark, tmp_path):
    inp = tmp_path / "in2"
    inp.mkdir()
    ck = str(tmp_path / "ck2")
    out_dir = str(tmp_path / "out2")

    def run_once():
        stream = (
            spark.readStream.schema("element string")
            .option("maxFilesPerTrigger", 1)
            .json(str(inp))
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            streaming_cms_counters(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write(inp, "b1.json", ["k"] * 10)
    run_once()
    _write(inp, "b2.json", ["k"] * 7)
    run_once()  # restart: counters resume, not reset

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.cms import (
        _bucket,
    )

    rows = spark.read.parquet(out_dir).collect()
    got = max(
        r["c"] for r in rows if r["i"] == 0 and r["b"] == _bucket("k", 0)
    )
    assert got == 17
