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

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .operators.decode import decode_records, explode_log_events
from .operators.parse import parse_log_events, split_dlq
from .sources.kinesis import read_kinesis_event_file  # noqa: F401 (re-export)


def parse_kinesis_records(
    records: DataFrame, observe: bool | Observation = True
) -> DataFrame:
    """Kinesis records (data, awsRegion) -> parsed log records (+ is_corrupt).

    `observe` attaches the reference's counters (S15, shipper.js:117-137 —
    dead code there, live metrics here): record_counter (successfully
    decoded, non-control records — decode failures excluded, matching
    recordCounter which only incremented after a successful parse) and
    log_event_counter. Pass a pyspark Observation to read the values back
    in batch mode, True for a named observation, False to skip.

    Decode-corrupt records (bad base64 / gzip / envelope JSON) do NOT
    vanish: they surface as is_corrupt=true rows with the original base64
    payload in _raw, so split_dlq routes them for replay (the silent-loss
    fix over the reference's batch-poisoning catch, shipper.js:154-159).
    """
    envelopes = decode_records(records)
    good = envelopes.filter(~F.col("decode_error"))
    bad = envelopes.filter(F.col("decode_error"))
    if observe is not False:
        obs = observe if isinstance(observe, Observation) else "shipper_metrics"
        good = good.observe(
            obs,
            F.count(F.lit(1)).alias("record_counter"),
            F.sum(F.size("logEvents")).alias("log_event_counter"),
        )
    parsed = parse_log_events(explode_log_events(good))
    null_str = F.lit(None).cast("string")
    decode_dlq = bad.select(
        null_str.alias("function.name"),
        null_str.alias("function.version"),
        null_str.alias("@timestamp"),
        null_str.alias("function.request.id"),
        null_str.alias("message"),
        F.lit(None).cast("map<string,string>").alias("attributes"),
        F.col("awsRegion").alias("region"),
        F.lit("lambda").alias("type"),
        F.lit("debug").alias("severity"),
        null_str.alias("error.type"),
        F.lit(True).alias("is_corrupt"),
        F.col("_raw_data").alias("_raw"),
    )
    return parsed.unionByName(decode_dlq)


def run_batch(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full hot path -> (clean log records, DLQ records)."""
    return split_dlq(parse_kinesis_records(records))
