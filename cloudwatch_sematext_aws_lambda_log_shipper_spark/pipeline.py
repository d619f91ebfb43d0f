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
        F.lit(None).cast("map<string,variant>").alias("attributes"),
        F.col("awsRegion").alias("region"),
        F.lit("lambda").alias("type"),
        F.lit("debug").alias("severity"),
        null_str.alias("error.type"),
        F.lit(True).alias("is_corrupt"),
        F.col("_raw_data").alias("_raw"),
    )
    return parsed.unionByName(decode_dlq)


def batch_kernel(
    records: DataFrame,
    observe: bool | Observation = True,
    fan_out: bool = False,
) -> DataFrame:
    """The ONE decode+parse composition every entry point executes —
    batch backfill (run_batch) and the streaming shipper
    (streaming/pipeline._ship_batch) are both thin callers, so a stage
    added here reaches both hot paths (r14 ADVICE: the two paths had
    drifted into separate compositions).

    fan_out: repartition the RAW records (small: compressed payloads)
    to cluster parallelism before the gunzip UDF when the input arrives
    in fewer partitions than cores — a Kinesis/file micro-batch has as
    many partitions as source shards/files, and gunzip is the
    pipeline's CPU.
    """
    if fan_out:
        par = records.sparkSession.sparkContext.defaultParallelism
        if records.rdd.getNumPartitions() < par:
            records = records.repartition(par)
    return parse_kinesis_records(records, observe=observe)


def run_batch(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full hot path -> (clean log records, DLQ records)."""
    return split_dlq(batch_kernel(records))


def replay_dlq(
    dlq: DataFrame, materialize_parsed: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Re-run DECODE-class DLQ rows through the pipeline (S17 replay —
    the reference's TODO, shipper.js:158).

    Only decode-class rows (message NULL, _raw = original base64 data)
    are replayable: a transient corruption or a since-fixed decoder bug
    can recover them. Parse-class corrupt rows (Q4 space-separated
    lines) are deterministically malformed — reprocessing cannot change
    their outcome, so they pass through to the returned dlq unchanged.

    Returns (recovered_clean, still_dlq).

    ``materialize_parsed`` (opt r15, guide §5): a caller consuming BOTH
    branches in one action would otherwise decode+parse the replay
    slice twice (the gunzip Arrow UDF is the expensive step); the flag
    localCheckpoints the parsed frame so both branches read the same
    materialized blocks (lazy — the first action materializes; blocks
    are freed by the driver's ContextCleaner when the returned frames
    are dropped, the engine-wide _unit(materialize=True) lifecycle).
    Off by default: single-branch consumers (ship only the recovered
    rows) keep the streaming-friendly pure-lineage plan.
    """
    decode_class = F.col("message").isNull() & F.col("_raw").isNotNull() & F.col(
        "`function.name`"
    ).isNull()
    replayable = dlq.filter(decode_class).select(
        F.col("_raw").alias("data"), F.col("region").alias("awsRegion")
    )
    # observe=False: the replay plan may be composed with the original
    # batch plan, and two same-named observations in one tree is an
    # analysis error
    parsed = parse_kinesis_records(replayable, observe=False)
    if materialize_parsed:
        parsed = parsed.localCheckpoint(eager=False)
    clean, still = split_dlq(parsed)
    return clean, still.unionByName(dlq.filter(~decode_class))
