"""File format readers/writers beyond parquet: ORC, JSONL, CSV.

The reference consumes exactly one wire format (gzip'd JSON via
Kinesis); the engine's analytics surface additionally speaks the
standard lake formats. All readers take an EXPLICIT schema — schema
inference is a full extra pass over the data at scale and
non-deterministic under dirty rows, so it is deliberately not exposed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# 'text' reads raw lines as a single `value` string column — the
# ingestion shape for plain log files (write requires exactly one
# string column).
#
# Avro probe (2026-08-14, pyspark 4.1.2 in this container): the jars
# dir ships avro-1.12.1 / avro-ipc / avro-mapred (core-internal
# dependencies) but NOT the spark-avro_2.13 DataSource connector, so
# format('avro') cannot resolve ("Failed to find data source: avro").
# r9: 'avro' is served by the vendored pure-Python OCF codec
# (sources/avro_ocf.py — distributed mapInPandas read/write over the
# public container-file spec, timestamps as typed long micros). On a
# cluster with the connector deployed, swapping the routing back to
# format('avro') is the complete change.
# 'arrow' = Arrow IPC / Feather-v2 directories (sources/arrow_ipc.py:
# mapInArrow read/write via the pyarrow that ships with PySpark — no
# pandas hop, validity bitmaps native; the HuggingFace-datasets /
# Arrow-Flight interchange shape).
_FORMATS = ("parquet", "orc", "json", "csv", "text", "avro", "arrow")

# Text formats default to millisecond timestamps — a silent microsecond
# truncation on round-trip. Pin lossless formats for BOTH timestamp
# flavors: TIMESTAMP (LTZ) carries a zone offset, TIMESTAMP_NTZ is a
# wall-clock value and must serialize with no offset text (an
# offset-required pattern would null every NTZ value on read-back).
# The reader schema decides which applies per column; declare
# `timestamp_ntz` for NTZ data — reading NTZ text through an LTZ column
# is a semantic reinterpretation, not supported here.
_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_TS_NTZ_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
_TS_OPTS = {"timestampFormat": _TS_FORMAT, "timestampNTZFormat": _TS_NTZ_FORMAT}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if fmt == "text":
        return spark.read.text(path)  # fixed (value string) schema
    if fmt == "avro":
        if schema is None:
            raise ValueError("avro requires an explicit schema (no inference pass)")
        from .avro_ocf import read_avro

        return read_avro(spark, path, schema)
    if fmt == "arrow":
        if schema is None:
            raise ValueError("arrow requires an explicit schema (no inference pass)")
        from .arrow_ipc import read_arrow

        return read_arrow(spark, path, schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"{fmt} requires an explicit schema (no inference pass)")
    if fmt == "csv":
        return reader.options(header="true", **_TS_OPTS).csv(path)
    if fmt == "json":
        return reader.options(**_TS_OPTS).json(path)
    return getattr(reader, fmt)(path)


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if fmt == "avro":
        from .avro_ocf import write_avro

        write_avro(df, path, mode=mode)
        return
    if fmt == "arrow":
        from .arrow_ipc import write_arrow

        write_arrow(df, path, mode=mode)
        return
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer.options(header="true", **_TS_OPTS).csv(path)
    elif fmt == "json":
        writer.options(**_TS_OPTS).json(path)
    elif fmt == "text":
        writer.text(path)  # requires a single string column
    else:
        getattr(writer, fmt)(path)
