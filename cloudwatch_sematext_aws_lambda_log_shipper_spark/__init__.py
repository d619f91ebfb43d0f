"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference serverless log-shipper pipeline
(reference: /root/reference/shipper.js, /root/reference/subscriber.js).

The reference is a Kinesis-triggered AWS Lambda that decodes CloudWatch
Logs payloads, parses/classifies each log line, and bulk-ships records to
an Elasticsearch-compatible endpoint. This package re-expresses that
pipeline as idiomatic Spark Structured Streaming / DataFrame operations:

- ``sources``    — Kinesis-shaped record sources (file/memory for tests),
                   catalog discovery (subscriber.js control plane analog)
- ``operators``  — decode (base64/gunzip/JSON), parse kernel, severity
                   classification, dedup, similarity, text analysis,
                   multimodal column plumbing
- ``functions``  — reusable column expressions (lambda name/version, ...)
- ``plans``      — downstream analytics query builders over the log table
                   and the synthetic star-schema test tables
- ``streaming``  — Structured Streaming wrappers (watermarks, triggers,
                   foreachBatch sinks, observe() metrics)

Design notes for 100 TB scale are in docstrings per operator; the hot
parse path is narrow (zero shuffles), so scale hinges on partition sizing
and sink layout (date-partitioned parquet log table).
"""

__version__ = "0.1.0"
