"""Streaming multi-line reassembly: traces spanning micro-batch
boundaries stitch correctly; orphan leading continuations emit flagged;
events emit exactly once (append mode)."""

from __future__ import annotations

import json

from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.multiline import (
    streaming_reassemble,
)


def _write_lines(path, name, rows=None, mtime=0):
    # FileStreamSource orders pending files by MODIFICATION TIME and
    # breaks ties arbitrarily — sub-second writes can reorder the
    # micro-batches. Pin strictly increasing whole-second mtimes so the
    # batch sequence is deterministic.
    import os

    p = path / name
    with open(p, "w") as f:
        for stream, no, line in rows:
            f.write(json.dumps(
                {"logStream": stream, "line_no": no, "line": line}) + "\n")
    os.utime(p, (mtime, mtime))


def test_cross_batch_stitch_and_orphans(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    # batch 1: s1 head + one frame; s2 begins MID-TRACE (orphan frames)
    _write_lines(inp, "b1.json", mtime=1700000000, rows=[
        ("s1", 1, "NullPointerException in handler"),
        ("s1", 2, "  at com.example.A(A.java:1)"),
        ("s2", 1, "  at com.example.Z(Z.java:9)"),
        ("s2", 2, "  at com.example.Y(Y.java:8)"),
    ])
    # batch 2: s1 gets ANOTHER frame of the same trace (cross-batch),
    # then a new head (completing event 1); s2 gets its first head
    # (completing the orphan block)
    _write_lines(inp, "b2.json", mtime=1700000010, rows=[
        ("s1", 3, "  at com.example.B(B.java:2)"),
        ("s1", 4, "Timeout in worker"),
        ("s1", 5, "  at com.example.C(C.java:3)"),
        ("s2", 3, "Fresh start line"),
    ])
    # batch 3: a further head completes event 2 through the normal
    # successor path (the quiet-stream timeout flush is timing-
    # dependent, so the test pins the deterministic path and disables
    # the timeout outright)
    _write_lines(inp, "b3.json", mtime=1700000020, rows=[("s1", 6, "Third head")])

    stream = (
        spark.readStream.schema("logStream string, line_no long, line string")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    out = streaming_reassemble(stream, timeout_ms=3_600_000)
    q = (
        out.writeStream.format("memory")
        .queryName("ml_events")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    # availableNow + a pending ProcessingTimeTimeout keeps the query
    # alive until the (1 h) timeout horizon, so a bare
    # awaitTermination(120) burns its full 120 s (measured r16) —
    # poll the sink for the 3 completed events and stop, the same
    # pattern as the eviction suites.
    import time

    t0 = time.time()
    try:
        while True:
            rows = spark.sql(
                "SELECT * FROM ml_events ORDER BY stream, event_no"
            ).collect()
            if len(rows) >= 3:
                break
            if time.time() - t0 > 120:
                raise AssertionError(
                    f"expected 3 stitched events, got {rows}"
                )
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)

    s1 = [r for r in rows if r.stream == "s1"]
    assert len(s1) == 2  # the third event is still open (no successor)
    assert s1[0].head == "NullPointerException in handler"
    assert s1[0].block == (
        "NullPointerException in handler\n"
        "  at com.example.A(A.java:1)\n"
        "  at com.example.B(B.java:2)"  # the cross-batch frame
    )
    assert s1[0].n_lines == 3 and s1[0].orphan is False
    assert s1[1].head == "Timeout in worker"
    assert s1[1].block == "Timeout in worker\n  at com.example.C(C.java:3)"
    assert s1[1].event_no == 2

    s2 = [r for r in rows if r.stream == "s2"]
    assert len(s2) == 1
    assert s2[0].orphan is True and s2[0].head is None
    assert s2[0].block == (
        "  at com.example.Z(Z.java:9)\n  at com.example.Y(Y.java:8)"
    )
