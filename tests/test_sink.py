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


def test_maintain_expires_and_compacts_dlq_too(spark, tmp_path):
    """DLQ retention: LogSink.maintain applies the reference's retention
    policy (sample.secrets.json:6 — it covers everything the reference
    ships) to the DLQ table as well as the log table, and folds both
    tables' per-batch dirs."""
    from datetime import date

    clean, dlq = split_dlq(parsed_corpus(spark))
    assert dlq.count() == 0  # corpus above is all-clean; make DLQ rows:
    corrupt = parse_log_events(
        spark.createDataFrame(
            [
                # Q4 class with a TAB after the timestamp: 2 tab parts
                # (<3 -> corrupt), and @timestamp = part 1 parses so the
                # DLQ row lands in the 2024-01-01 date partition
                Row(awsRegion="r", logGroup="g", logStream="s",
                    message=f"2024-01-01T00:00:00.000Z\t{UUID} spaced {i}")
                for i in range(4)
            ]
        )
    )
    _clean2, dlq = split_dlq(corrupt)
    assert dlq.count() == 4

    sink = LogSink(str(tmp_path))
    sink.ship(clean, dlq, batch_id=0)
    sink.ship(clean.limit(0), dlq, batch_id=1)  # second batch, same date

    # DLQ rows have @timestamp from the corrupt line -> 2024-01-01
    # partition; clean rows all parse TS -> 2019-03-08 partition.
    dlq_day = os.path.join(sink.dlq_path, "log_date=2024-01-01")
    assert len(
        [d for d in os.listdir(dlq_day) if d.startswith("ingest_batch=")]
    ) == 2

    report = sink.maintain(spark, retention_days=7, today=date(2024, 1, 2))
    # compaction folded the DLQ date's two batch dirs (within retention)
    assert "log_date=2024-01-01" in report["dlq"]["compacted"]
    assert [
        d for d in os.listdir(dlq_day) if d.startswith("ingest_batch=")
    ] == ["ingest_batch=-1"]
    # the 2019 log-table partition aged out entirely, on BOTH tables
    assert "log_date=2019-03-08" in report["logs"]["expired"]
    assert not os.path.isdir(
        os.path.join(sink.log_table, "log_date=2019-03-08")
    )
    # DLQ data within retention survives, readable, count intact
    assert spark.read.parquet(sink.dlq_path).count() == 8

    # a later nightly expires the DLQ partition too
    report = sink.maintain(spark, retention_days=1, today=date(2024, 1, 9))
    assert report["dlq"]["expired"] == ["log_date=2024-01-01"]
    assert not os.path.isdir(dlq_day)


def test_write_refuses_legacy_layout_mix(spark, tmp_path):
    """Writing the current log_date/ingest_batch nesting into a table
    laid out the legacy way (ingest_batch= at top level) must fail
    loudly instead of producing an unreadable mixed-depth table."""
    import pytest

    clean, _dlq = split_dlq(parsed_corpus(spark, n=6))
    table = str(tmp_path / "logs")
    # simulate a pre-r6 table: top-level ingest_batch= dir
    os.makedirs(os.path.join(table, "ingest_batch=0", "log_date=2019-03-08"))
    with pytest.raises(ValueError, match="legacy"):
        write_log_table(clean, table, batch_id=1)


def test_batch_append_also_refuses_legacy_layout(spark, tmp_path):
    """The layout guard covers BATCH-mode appends too: a flat
    log_date= append into a legacy ingest_batch-first table would
    create the same unreadable mixed-depth layout a streaming write
    would. A full-table overwrite is exempt (it wipes the legacy dirs)."""
    import pytest

    clean, _dlq = split_dlq(parsed_corpus(spark, n=6))
    table = str(tmp_path / "logs")
    os.makedirs(os.path.join(table, "ingest_batch=0", "log_date=2019-03-08"))
    with pytest.raises(ValueError, match="legacy"):
        write_log_table(clean, table)  # batch_id=None, mode='append'
    write_log_table(clean, table, mode="overwrite")  # wipes legacy: fine
    assert spark.read.parquet(table).count() == clean.count()
