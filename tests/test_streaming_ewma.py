"""Streaming EWMA: recurrence parity with the batch fold on
time-ordered batches, spike detection against history, checkpointed
restart-resume."""

from __future__ import annotations

import json

from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.ewma import (
    streaming_ewma,
)


def _write_points(path, name, rows):
    with open(path / name, "w") as f:
        for key, ts, v in rows:
            f.write(json.dumps({"key": key, "ts": ts, "value": v}) + "\n")


def _batch_fold(values, alpha=0.3):
    prev, out = None, []
    for v in values:
        prev = v if prev is None else round(alpha * v + (1 - alpha) * prev, 9)
        out.append(prev)
    return out


def _stream(spark, inp):
    return (
        spark.readStream.schema("key string, ts string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
        .selectExpr("key", "CAST(ts AS TIMESTAMP) AS ts", "value")
    )


def test_stream_matches_batch_fold_and_flags_spike(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    # two time-ordered micro-batches for key 'a' (plus an interleaved
    # key 'b' that must not contaminate a's state); batch 2 opens with
    # a 10x spike
    a1 = [10.0, 12.0, 11.0]
    a2 = [110.0, 12.0]
    _write_points(
        inp, "b1.json",
        [("a", f"2024-01-01T00:0{i}:00", v) for i, v in enumerate(a1)]
        + [("b", "2024-01-01T00:00:30", 5.0)],
    )
    _write_points(
        inp, "b2.json",
        [("a", f"2024-01-01T01:0{i}:00", v) for i, v in enumerate(a2)]
        + [("b", "2024-01-01T01:00:30", 5.5)],
    )
    out = streaming_ewma(_stream(spark, inp), alpha=0.3, spike_factor=2.0)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM ewma_updates WHERE key = 'a' ORDER BY ts"
    ).collect()
    assert [r.value for r in rows] == a1 + a2
    # the stream equals the batch fold over the concatenated ordered
    # series (batches arrived time-ordered)
    assert [r.ewma for r in rows] == _batch_fold(a1 + a2)
    # only the 110.0 point spikes, judged against the PRE-update average
    assert [r.is_spike for r in rows] == [False, False, False, True, False]
    # key isolation
    b = spark.sql("SELECT * FROM ewma_updates WHERE key = 'b' ORDER BY ts").collect()
    assert [r.ewma for r in b] == _batch_fold([5.0, 5.5])


def test_restart_resumes_state_from_checkpoint(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")

    _write_points(inp, "b1.json", [("a", "2024-01-01T00:00:00", 10.0),
                                   ("a", "2024-01-01T00:01:00", 20.0)])

    def run():
        # foreachBatch parquet append (memory sink can't recover a
        # checkpoint; a direct parquet sink rejects update mode)
        q = (
            streaming_ewma(_stream(spark, inp), alpha=0.5)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    _write_points(inp, "b2.json", [("a", "2024-01-01T00:02:00", 30.0)])
    run()  # restart: must resume from (ewma=15.0, n=2), not refold

    rows = sorted(
        (r.ts, r.ewma) for r in spark.read.parquet(out_dir)
        .filter("key = 'a'").collect()
    )
    assert [e for _, e in rows] == _batch_fold([10.0, 20.0, 30.0], alpha=0.5)
