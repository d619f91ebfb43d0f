"""Streaming CUSUM: integer-state parity with a direct fold across
micro-batches, drift alerting on rate shifts, checkpointed
restart-resume, per-key isolation."""

from __future__ import annotations

import json

from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.cusum import (
    SCALE,
    streaming_cusum,
)


def _write_points(path, name, rows):
    with open(path / name, "w") as f:
        for key, ts, v in rows:
            f.write(json.dumps({"key": key, "ts": ts, "value": v}) + "\n")


def _stream(spark, inp):
    return (
        spark.readStream.schema("key string, ts string, value long")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
        .selectExpr("key", "CAST(ts AS TIMESTAMP) AS ts", "value")
    )


def _ref(values, target):
    t = round(target * SCALE)
    s, out = 0, []
    for v in values:
        s += v * SCALE - t
        out.append(s)
    return out


def test_stream_matches_fold_and_alerts_on_shift(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    # key 'a': on-target then a sustained +5 shift; key 'b' stays flat
    a1, a2 = [10, 11, 9], [15, 16, 15]
    _write_points(
        inp, "b1.json",
        [("a", f"2024-01-01T00:0{i}:00", v) for i, v in enumerate(a1)]
        + [("b", "2024-01-01T00:00:30", 10)],
    )
    _write_points(
        inp, "b2.json",
        [("a", f"2024-01-01T01:0{i}:00", v) for i, v in enumerate(a2)]
        + [("b", "2024-01-01T01:00:30", 10)],
    )
    q = (
        streaming_cusum(_stream(spark, inp), target=10.0, threshold=8.0)
        .writeStream.format("memory")
        .queryName("cusum_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM cusum_out ORDER BY key, ts").collect()
    a = [r for r in rows if r.key == "a"]
    assert [r.cusum_scaled for r in a] == _ref(a1 + a2, 10.0)
    # the shift accumulates: first batch never alerts, the shifted tail does
    assert not any(r.alert for r in a[:3])
    assert a[-1].alert
    b = [r for r in rows if r.key == "b"]
    assert all(not r.alert for r in b)  # key isolation: b stays calm


def test_restart_resumes_cusum_state(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")

    def run():
        # foreachBatch parquet append (memory sink can't recover a
        # checkpoint — same workaround as the EWMA restart test)
        q = (
            streaming_cusum(_stream(spark, inp), target=10.0, threshold=50.0)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_points(inp, "b1.json",
                  [("a", f"2024-01-01T00:0{i}:00", 12) for i in range(3)])
    run()
    _write_points(inp, "b2.json",
                  [("a", f"2024-01-01T01:0{i}:00", 12) for i in range(3)])
    run()
    rows = sorted(r.cusum_scaled for r in spark.read.parquet(out_dir).collect())
    # 6 rows total, state carried across the restart: S = k * 2 * SCALE
    assert rows == [(k + 1) * 2 * SCALE for k in range(6)]
