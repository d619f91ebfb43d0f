"""Schemas for the three nested input envelopes and the output log table.

Reference data model (SURVEY.md §1):
  1. Kinesis event envelope   — shipper.js:121-130
  2. CloudWatch Logs payload  — shipper.js:122-125 (after base64+gunzip+JSON)
  3. log message string       — shipper.js:62-112 (three syntactic classes)

Output record schema — shipper.js:75-109 + checkLogError shipper.js:31-49.
Dotted field names ('function.name', '@timestamp', ...) are kept verbatim
as literal column names (backtick-quoted in Spark SQL), matching the
Elasticsearch document shape the reference ships.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- 1. Kinesis event envelope (fixture JSONL = one Lambda event per line) ---
KINESIS_RECORD_SCHEMA = T.StructType(
    [
        T.StructField(
            "kinesis",
            T.StructType([T.StructField("data", T.StringType())]),  # base64(gzip(payload))
        ),
        T.StructField("awsRegion", T.StringType()),
    ]
)

KINESIS_EVENT_SCHEMA = T.StructType(
    [T.StructField("Records", T.ArrayType(KINESIS_RECORD_SCHEMA))]
)

# --- 2. CloudWatch Logs subscription payload (shipper.js:124) ---
LOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("timestamp", T.LongType()),  # epoch ms; never read by the reference
        T.StructField("message", T.StringType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("messageType", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("logGroup", T.StringType()),
        T.StructField("logStream", T.StringType()),
        T.StructField("subscriptionFilters", T.ArrayType(T.StringType())),
        T.StructField("logEvents", T.ArrayType(LOG_EVENT_SCHEMA)),
    ]
)

# --- 3. Output log record (FIXTURES.md A4) ---
# Dynamic user-JSON keys: typed core columns + residual MAP<STRING,STRING>
# ('attributes'), per SURVEY.md §1.5 — typed cores (a)+(b) with variant
# residual values (c): nested user-JSON objects/arrays/numbers stay
# typed through the parquet sink instead of being stringified.
LOG_COLUMNS = [
    "function.name",
    "function.version",
    "@timestamp",
    "function.request.id",
    "message",
    "attributes",
    "region",
    "type",
    "severity",
    "error.type",
    "is_corrupt",
]

LOG_SCHEMA = T.StructType(
    [
        T.StructField("function.name", T.StringType()),
        T.StructField("function.version", T.StringType()),
        T.StructField("@timestamp", T.StringType()),
        T.StructField("function.request.id", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("attributes", T.MapType(T.StringType(), T.VariantType())),
        T.StructField("region", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("error.type", T.StringType()),
        T.StructField("is_corrupt", T.BooleanType()),
    ]
)

# Analytics test tables (FIXTURES.md B / TESTDATA.md)
TEST_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
