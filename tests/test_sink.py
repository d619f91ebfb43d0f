"""Sink round-trip tests (S16): log table partitioning, DLQ landing,
bulk NDJSON shape and chunking."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.parse import (
    parse_log_events,
    split_dlq,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.sink import (
    LogSink,
    read_log_table,
    write_bulk_ndjson,
    write_log_table,
)

TS = "2019-03-08T15:58:45.736Z"
UUID = "53499d7f-60f1-476a-adc8-1e6c6125a67c"


def parsed_corpus(spark, n=250):
    rows = []
    for i in range(n):
        if i % 3 == 0:
            msg = f'{{"message":"event {i}","requestId":"r{i}","timestamp":"{TS}"}}'
        elif i % 3 == 1:
            msg = f"{TS}\t{UUID}\tline {i} error"
        else:
            msg = f"plain {i}"
        rows.append(
            Row(awsRegion="us-east-1", logGroup="/aws/lambda/fn",
                logStream="2019/03/08/[1]s", message=msg)
        )
    return parse_log_events(spark.createDataFrame(rows))


def test_log_table_roundtrip(spark, tmp_path):
    clean, dlq = split_dlq(parsed_corpus(spark))
    sink = LogSink(str(tmp_path), bulk=True)
    sink.ship(clean, dlq, mode="overwrite")

    back = read_log_table(spark, sink.log_table)
    assert back.count() == clean.count()
    assert "log_date" in back.columns
    # date-partitioned layout on disk: hive-style log_date= dirs
    parts = {os.path.basename(p) for p in glob.glob(f"{sink.log_table}/log_date=*")}
    assert "log_date=2019-03-08" in parts  # timestamped rows
    assert "log_date=1970-01-01" in parts  # plain rows: no timestamp -> sentinel


def test_dlq_lands_with_raw(spark, tmp_path):
    # Q4-class line: matches structured regex but has space separators
    df = spark.createDataFrame(
        [Row(awsRegion="r", logGroup="g", logStream="s",
             message=f"{TS} {UUID} spaced out")]
    )
    clean, dlq = split_dlq(parse_log_events(df))
    sink = LogSink(str(tmp_path))
    sink.ship(clean, dlq, mode="overwrite")
    back = spark.read.parquet(sink.dlq_path)
    [r] = back.collect()
    assert r["is_corrupt"] is True
    assert r["_raw"].startswith(TS)


def test_bulk_ndjson_shape_and_chunking(spark, tmp_path):
    clean, _ = split_dlq(parsed_corpus(spark, n=250))
    out = str(tmp_path / "bulk")
    write_bulk_ndjson(clean, out, bulk_size=100, mode="overwrite")

    files = sorted(glob.glob(f"{out}/part-*"))
    assert files
    total_docs = 0
    for f in files:
        lines = [ln for ln in open(f).read().splitlines() if ln]
        assert len(lines) % 2 == 0  # action/doc pairs
        docs = len(lines) // 2
        assert docs <= 100  # LOGS_BULK_SIZE cap per bulk file
        total_docs += docs
        action = json.loads(lines[0])
        assert action["index"]["_type"] in ("debug", "error")
        doc = json.loads(lines[1])
        assert doc["type"] == "lambda"
        assert "function.name" in doc
    assert total_docs == clean.count()
