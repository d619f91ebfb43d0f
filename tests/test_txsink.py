"""Streaming -> txlog table: exactly-once under retries and restarts,
one time-travelable version per micro-batch."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources import txlog
from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.txsink import (
    StreamingTableSink,
)


@pytest.fixture()
def dirs():
    with tempfile.TemporaryDirectory() as d:
        yield {
            "in": os.path.join(d, "in"),
            "table": os.path.join(d, "table"),
            "ckpt": os.path.join(d, "ckpt"),
        }


def _write_input(path: str, name: str, lo: int, hi: int):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for k in range(lo, hi):
            f.write(json.dumps({"k": k}) + "\n")


def _stream(spark, path):
    return (
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", 1)
        .json(path)
    )


def _table_ids(spark, table, version=None):
    return sorted(
        r.k for r in txlog.read_table(spark, table, version=version).collect()
    )


def test_stream_appends_one_version_per_batch(spark, dirs):
    for i in range(3):
        _write_input(dirs["in"], f"f{i}.json", i * 10, i * 10 + 10)
    sink = StreamingTableSink(dirs["table"], app_id="t1")
    q = sink.start(_stream(spark, dirs["in"]), dirs["ckpt"])
    q.awaitTermination(120)
    assert _table_ids(spark, dirs["table"]) == list(range(30))
    hist = txlog.history(dirs["table"])
    assert len(hist) == 3 and all(h["op"] == "append" for h in hist)
    # each version is a consistent prefix-of-stream snapshot
    assert len(_table_ids(spark, dirs["table"], version=0)) == 10
    assert len(_table_ids(spark, dirs["table"], version=1)) == 20


def test_redelivered_batch_is_noop(spark, dirs):
    _write_input(dirs["in"], "f0.json", 0, 5)
    sink = StreamingTableSink(dirs["table"], app_id="t1")
    df = spark.read.schema("k long").json(dirs["in"])
    sink.ship_batch(df, 0)
    sink.ship_batch(df, 0)  # foreachBatch retry with the same batch_id
    assert _table_ids(spark, dirs["table"]) == list(range(5))
    assert len(txlog.history(dirs["table"])) == 1
    # a LATER batch from the same app does append
    sink.ship_batch(df.selectExpr("k + 100 AS k"), 1)
    assert len(_table_ids(spark, dirs["table"])) == 10


def test_checkpoint_restart_ingests_only_new_files(spark, dirs):
    _write_input(dirs["in"], "f0.json", 0, 10)
    sink = StreamingTableSink(dirs["table"], app_id="t1")
    q = sink.start(_stream(spark, dirs["in"]), dirs["ckpt"])
    q.awaitTermination(120)
    assert _table_ids(spark, dirs["table"]) == list(range(10))
    # new file arrives; restart from the same checkpoint
    _write_input(dirs["in"], "f1.json", 10, 15)
    q2 = sink.start(_stream(spark, dirs["in"]), dirs["ckpt"])
    q2.awaitTermination(120)
    assert _table_ids(spark, dirs["table"]) == list(range(15))


def test_compaction_during_stream_preserves_rows(spark, dirs):
    for i in range(4):
        _write_input(dirs["in"], f"f{i}.json", i * 5, i * 5 + 5)
    sink = StreamingTableSink(dirs["table"], app_id="t1")
    q = sink.start(_stream(spark, dirs["in"]), dirs["ckpt"])
    q.awaitTermination(120)
    txlog.compact(spark, dirs["table"])
    assert _table_ids(spark, dirs["table"]) == list(range(20))
    # the stream resumes cleanly after a compaction commit
    _write_input(dirs["in"], "f9.json", 90, 93)
    q2 = sink.start(_stream(spark, dirs["in"]), dirs["ckpt"])
    q2.awaitTermination(120)
    got = _table_ids(spark, dirs["table"])
    assert got == list(range(20)) + [90, 91, 92]
