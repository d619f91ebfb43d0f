"""End-to-end batch pipeline: Kinesis-shaped events -> parsed log table.

The same pure transform chain backs batch backfill and Structured
Streaming (streaming/pipeline.py wraps it) — idiomatic Spark: one code
path, two execution modes.

Dataflow parity with shipper.js handler (EP1, SURVEY.md §3):
  read -> decode (S2-S4) -> CONTROL filter (S5) -> explode (S8)
       -> parse kernel (S6-S14) -> observe counters (S15)
       -> clean/DLQ split (S17) -> sinks (S16)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.decode import decode_records, explode_log_events
from .operators.parse import parse_log_events, split_dlq
from .schemas import KINESIS_EVENT_SCHEMA


def read_kinesis_event_file(spark: SparkSession, path: str) -> DataFrame:
    """JSONL of Lambda-event-shaped docs (one `{"Records": [...]}` per
    line) -> one row per Kinesis record. Stands in for the Kinesis source
    in tests; a real deployment swaps `spark.readStream.format("kinesis")`
    (same downstream columns: data, awsRegion)."""
    events = spark.read.schema(KINESIS_EVENT_SCHEMA).json(path)
    return events.select(F.explode("Records").alias("r")).select(
        F.col("r.kinesis.data").alias("data"),
        F.col("r.awsRegion").alias("awsRegion"),
    )


def parse_kinesis_records(records: DataFrame, observe: bool = True) -> DataFrame:
    """Kinesis records (data, awsRegion) -> parsed log records (+ is_corrupt).

    `observe=True` attaches the reference's counters (S15,
    shipper.js:117-137 — dead code there, live metrics here) as a named
    observation: record_counter, log_event_counter.
    """
    envelopes = decode_records(records)
    if observe:
        envelopes = envelopes.observe(
            "shipper_metrics",
            F.count(F.lit(1)).alias("record_counter"),
            F.sum(F.size("logEvents")).alias("log_event_counter"),
        )
    events = explode_log_events(envelopes)
    return parse_log_events(events)


def run_batch(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full hot path -> (clean log records, DLQ records)."""
    return split_dlq(parse_kinesis_records(records))
