"""Kinesis-shaped record sources (S1).

The reference is triggered by a Kinesis batch of ≤1000 records
(serverless.yml:24-32, startingPosition LATEST); each record carries a
base64(gzip(CloudWatch payload)) data field plus awsRegion
(shipper.js:121-130). Both readers below emit that exact record shape
(columns: data, awsRegion), so everything downstream — decode, parse,
sink — is source-agnostic.

Production swap: ``spark.readStream.format("kinesis")`` with
maxFetchRate/maxRecordsPerFetch standing in for BATCH_SIZE; the file
readers here are the test/backfill stand-in (SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import KINESIS_EVENT_SCHEMA


def _records(events: DataFrame) -> DataFrame:
    return events.select(F.explode("Records").alias("r")).select(
        F.col("r.kinesis.data").alias("data"),
        F.col("r.awsRegion").alias("awsRegion"),
    )


def read_kinesis_event_file(spark: SparkSession, path: str) -> DataFrame:
    """Batch: JSONL of Lambda-event-shaped docs (one ``{"Records":[...]}``
    per line) -> one row per Kinesis record."""
    return _records(spark.read.schema(KINESIS_EVENT_SCHEMA).json(path))


def stream_kinesis_event_files(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming: same record shape from a checkpointable file source;
    ``maxFilesPerTrigger`` bounds the micro-batch like BATCH_SIZE."""
    reader = spark.readStream.schema(KINESIS_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _records(reader.json(path))
