"""Decode chain: Kinesis record -> CloudWatch Logs payload rows.

Reference: shipper.js:121-130 —
    base64 decode   (S2, shipper.js:122)  -> F.unbase64 (JVM builtin)
    gunzip          (S3, shipper.js:123)  -> the engine's ONLY Python UDF
                                             (Arrow-batched pandas_udf)
    JSON.parse      (S4, shipper.js:124)  -> F.from_json(ENVELOPE_SCHEMA)
    CONTROL_MESSAGE skip (S5, shipper.js:125) -> filter

Scale notes: the chain is narrow (no shuffle). The gunzip UDF is the one
Python hop; it transfers the compressed bytes (smaller than the output)
over Arrow in vectorized batches. Everything before and after stays in
WholeStageCodegen.
"""

from __future__ import annotations

import gzip
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ENVELOPE_SCHEMA


@F.pandas_udf(T.BinaryType())
def gunzip(data: pd.Series) -> pd.Series:
    """Vectorized gunzip (S3). None/corrupt inputs -> None (routed to DLQ
    downstream instead of poisoning the batch — replaces the reference's
    handler-level catch-all, shipper.js:154-159)."""

    def _one(b):
        if b is None:
            return None
        try:
            # wbits=47 accepts both gzip and zlib streams, like Node Zlib
            return zlib.decompress(bytes(b), 47)
        except zlib.error:
            return None

    return data.map(_one)


def gzip_b64(payload: str) -> str:
    """Test helper: build a Kinesis-shaped data field (base64(gzip(json)))."""
    import base64

    return base64.b64encode(gzip.compress(payload.encode("utf-8"))).decode("ascii")


@F.pandas_udf(T.StringType())
def gzip_b64_udf(payload: pd.Series) -> pd.Series:
    """Vectorized envelope ENCODER — synthesis/test scaffolding only (the
    engine itself never gzips on the hot path). mtime=0 keeps the bytes
    deterministic across runs."""
    import base64

    return payload.map(
        lambda s: base64.b64encode(
            gzip.compress(s.encode("utf-8"), mtime=0)
        ).decode("ascii")
    )


def decode_payload(data_b64: Column) -> Column:
    """base64 -> gunzip -> parsed envelope struct column (S2-S4).

    try_to_binary (not unbase64) so malformed base64 yields NULL and a
    DLQ row instead of a JVM throw poisoning the batch (Q4-class fix).
    """
    return F.from_json(
        gunzip(F.try_to_binary(data_b64, F.lit("base64"))).cast("string"),
        ENVELOPE_SCHEMA,
    )


def decode_records(records: DataFrame, data_col: str = "data",
                   region_col: str = "awsRegion") -> DataFrame:
    """Kinesis records (one row per record) -> decoded envelope rows.

    Output columns: awsRegion, messageType, logGroup, logStream, logEvents,
    decode_error, _raw_data (original base64 string, kept for DLQ replay).
    CONTROL_MESSAGE records are dropped (S5, shipper.js:125). Records whose
    payload fails to decode/parse surface as decode_error=true for DLQ
    routing (engine improvement over reference crash, SURVEY.md Q4/S17).

    A payload that parses as valid JSON but has null/missing logEvents
    (e.g. ``{}``) is ALSO decode_error=true: in the reference,
    ``logEvents.forEach`` would throw (shipper.js:132) and the handler
    catch-all would drop the whole batch; here the envelope routes to the
    DLQ instead of silently vanishing in the downstream explode —
    preserving the conservation invariant (every input record reaches
    clean, DLQ, or an intentional CONTROL drop). An empty ``logEvents``
    array is NOT an error: it legitimately contains zero events.
    """
    decoded = records.withColumn("_payload", decode_payload(F.col(data_col)))
    return (
        decoded.filter(
            F.col("_payload.messageType").isNull()
            | (F.col("_payload.messageType") != F.lit("CONTROL_MESSAGE"))
        )
        .select(
            F.col(region_col).alias("awsRegion"),
            F.col("_payload.messageType").alias("messageType"),
            F.col("_payload.logGroup").alias("logGroup"),
            F.col("_payload.logStream").alias("logStream"),
            F.col("_payload.logEvents").alias("logEvents"),
            (
                F.col("_payload").isNull()
                | F.col("_payload.logEvents").isNull()
            ).alias("decode_error"),
            F.col(data_col).alias("_raw_data"),
        )
    )


def explode_log_events(envelopes: DataFrame) -> DataFrame:
    """One output row per log event, parent fields carried (S8,
    shipper.js:132-137). Narrow op — no shuffle."""
    return envelopes.select(
        "awsRegion",
        "logGroup",
        "logStream",
        F.explode("logEvents").alias("logEvent"),
    ).select(
        "awsRegion",
        "logGroup",
        "logStream",
        F.col("logEvent.message").alias("message"),
    )
