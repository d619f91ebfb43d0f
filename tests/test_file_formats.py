"""Round-trip the events table through every supported lake format with
explicit schemas — values must survive bit-for-bit (CSV via string
round-trip of primitives)."""

from __future__ import annotations

import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import load
from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources.files import (
    read_table,
    write_table,
)

@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "avro", "arrow"])
def test_events_roundtrip(spark, sf_dir, tmp_path, fmt):
    ev = load(spark, sf_dir, "events").limit(200)
    # Declare the frame's ACTUAL ts flavor (timestamp vs timestamp_ntz):
    # the testdata generator has shipped both, and reading NTZ text back
    # through an LTZ column (or vice versa) nulls every value.
    ts_type = ev.schema["ts"].dataType.simpleString()
    schema = (
        f"event_id long, ts {ts_type}, user_id long, event_type string, "
        "value double, props string"
    )
    out = str(tmp_path / fmt)
    write_table(ev, out, fmt)
    back = read_table(spark, out, fmt, schema=schema if fmt != "orc" else None)
    orig = {tuple(r) for r in ev.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig


def test_schemaless_json_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), "json")


def test_avro_nulls_deflate_and_ntz(spark, tmp_path):
    """Vendored OCF path specifics: nullable columns round-trip Nones,
    the deflate codec decodes, TIMESTAMP_NTZ survives losslessly, and a
    reader-schema mismatch errors instead of mis-decoding."""
    import datetime as dt

    import pytest as _pytest

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )

    rows = [
        (1, "a", 1.5, bytearray(b"\x00\xff"), dt.datetime(2024, 1, 1, 12, 0, 0, 123456)),
        (2, None, None, None, None),
        (None, "c", -0.25, bytearray(b""), dt.datetime(1969, 12, 31, 23, 59, 59)),
    ]
    schema = ("id long, s string, x double, b binary, ts timestamp_ntz")
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "avro_deflate")
    n = write_avro(df.repartition(2), out, codec="deflate")
    assert n == 3
    back = read_avro(spark, out, schema)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}

    with _pytest.raises(Exception, match="schema mismatch"):
        read_avro(spark, out, "id long, s string, x double, b binary, ts timestamp").collect()


def test_avro_nan_vs_null_and_nullability_check(spark, tmp_path):
    """NaN is a VALUE, not a null: a nullable double column holding both
    NaN and NULL round-trips with the distinction intact (JVM-computed
    not-null mask on write, masked FloatingArray on read), and a reader
    schema that declares a file-nullable field non-nullable errors
    instead of silently delivering nulls."""
    import math

    import pytest as _pytest

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )

    schema = "id long, x double, y float"
    df = spark.createDataFrame(
        [(1, float("nan"), 2.5), (2, None, float("nan")), (3, 0.5, None)],
        schema,
    )
    out = str(tmp_path / "avro_nan")
    assert write_avro(df, out) == 3
    got = {r.id: (r.x, r.y) for r in read_avro(spark, out, schema).collect()}
    assert math.isnan(got[1][0]) and got[1][1] == 2.5
    assert got[2][0] is None and math.isnan(got[2][1])
    assert got[3][0] == 0.5 and got[3][1] is None

    with _pytest.raises(Exception, match="nullability mismatch"):
        read_avro(
            spark, out, "id long, x double not null, y float"
        ).collect()


def test_text_roundtrip_raw_log_lines(spark, tmp_path):
    """Raw log files land as a single `value` column — the ingestion
    shape for plain-text logs, feeding straight into parse_log_events."""
    from pyspark.sql import functions as F

    lines = ["plain line one", "ERROR boom", "2024-01-01T00:00:00.000Z ok"]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    out = str(tmp_path / "text")
    write_table(df, out, "text")
    back = read_table(spark, out, "text")
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect()) == sorted(lines)
    # a multi-column frame is rejected by the writer, not silently mangled
    with pytest.raises(Exception):
        write_table(df.withColumn("extra", F.lit(1)), str(tmp_path / "t2"), "text")


def test_arrow_ipc_nulls_nan_ntz_and_schema_check(spark, tmp_path):
    """Arrow IPC path specifics: validity bitmaps ride natively so a
    nullable double column holding BOTH a NaN value and a real null
    round-trips with the two kept distinct (no avro-style masking
    machinery needed), TIMESTAMP_NTZ survives losslessly, multi-part
    directories read back whole, and a reader-schema mismatch errors
    instead of mis-decoding."""
    import datetime as dt
    import math

    import pytest as _pytest

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources.arrow_ipc import (
        read_arrow,
        write_arrow,
    )

    rows = [
        (1, "a", 1.5, bytearray(b"\x00\xff"),
         dt.datetime(2024, 1, 1, 12, 0, 0, 123456)),
        (2, None, float("nan"), None, None),
        (3, "nullx", None, bytearray(b""),
         dt.datetime(1969, 12, 31, 23, 59, 59)),
    ]
    schema = "id long, s string, x double, b binary, ts timestamp_ntz"
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "arrow_parts")
    n = write_arrow(df.repartition(2), out)
    assert n == 3
    import os

    assert sum(f.endswith(".arrow") for f in os.listdir(out)) == 2
    back = {r.id: r for r in read_arrow(spark, out, schema).collect()}
    assert math.isnan(back[2].x) and back[2].s is None  # NaN is a VALUE
    assert back[3].x is None                            # null is a NULL
    assert back[1].ts == dt.datetime(2024, 1, 1, 12, 0, 0, 123456)
    assert bytes(back[1].b) == b"\x00\xff" and bytes(back[3].b) == b""

    with _pytest.raises(Exception, match="schema mismatch"):
        read_arrow(
            spark, out, "id long, s string, x double, b binary, ts timestamp"
        ).collect()
