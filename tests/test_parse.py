"""Golden-output tests for the parse kernel (FIXTURES.md A3 corpus).

Every expected value was verified by executing the verbatim reference
parseLog/checkLogError under Node.js (SURVEY.md §1.4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.parse import (
    parse_log_events,
    split_dlq,
)

LG = "/aws/lambda/my-func"
LS = "2019/03/08/[42]abcdef"
TS = "2019-03-08T15:58:45.736Z"
UUID = "53499d7f-60f1-476a-adc8-1e6c6125a67c"


def parse_one(spark, message, log_group=LG, log_stream=LS, region="us-east-1"):
    df = spark.createDataFrame(
        [Row(awsRegion=region, logGroup=log_group, logStream=log_stream, message=message)]
    )
    return parse_log_events(df).collect()


def attrs_plain(row):
    """attributes is MAP<STRING,VARIANT>; materialize values as plain
    Python (nested dicts/lists/numbers) for assertion."""
    if row["attributes"] is None:
        return None
    import json as _json

    return {k: _json.loads(v.toJson()) for k, v in row["attributes"].items()}


def test_f1_json_with_message(spark):
    [r] = parse_one(
        spark,
        '{"message":"hi","requestId":"r1","timestamp":"%s","level":"info"}' % TS,
    )
    assert r["function.name"] == "my-func"
    assert r["function.version"] == "42"
    assert r["@timestamp"] == TS
    assert r["function.request.id"] == "r1"
    assert r["message"] == "hi"
    assert attrs_plain(r) == {"level": "info"}
    assert r["region"] == "us-east-1"
    assert r["type"] == "lambda"
    assert r["severity"] == "debug"
    assert r["error.type"] is None
    assert r["is_corrupt"] is False


def test_f2_json_error_message(spark):
    [r] = parse_one(spark, '{"message":"DB error","requestId":"r1","timestamp":"T"}')
    assert r["severity"] == "error"
    assert r["error.type"] == "runtime"


def test_f3_json_without_string_message_falls_through(spark):
    raw = '{"foo":1,"requestId":"r1"}'
    [r] = parse_one(spark, raw)
    assert r["message"] == raw  # Q3: re-processed as plain text
    assert r["@timestamp"] is None
    assert r["function.request.id"] is None
    assert r["attributes"] is None
    assert r["severity"] == "debug"


@pytest.mark.parametrize("raw", ["123", '"hello"', "null", "true", "[1,2]", '{"message":5}'])
def test_f4_json_scalars_fall_through(spark, raw):
    [r] = parse_one(spark, raw)
    assert r["message"] == raw
    assert r["is_corrupt"] is False


def test_f5_reserved_keys_not_overridable(spark):
    [r] = parse_one(
        spark, '{"message":"ok","severity":"critical","type":"x","region":"eu"}'
    )
    assert r["severity"] == "debug"
    assert r["type"] == "lambda"
    assert r["region"] == "us-east-1"
    # lost entirely in the reference (literals win over spread) — not in attributes
    assert attrs_plain(r) == {}


def test_f5b_spread_overrides_function_fields(spark):
    # JS spread comes AFTER 'function.name' in the object literal, so a
    # user key of that name overrides the derived value (shipper.js:76-80).
    [r] = parse_one(spark, '{"message":"ok","function.name":"evil"}')
    assert r["function.name"] == "evil"
    assert attrs_plain(r) == {}


def test_f5c_explicit_null_override(spark):
    # A user key PRESENT with a null value overrides the derived value to
    # null in the JS spread — replicated via map_contains_key gating
    # (coalesce would incorrectly fall back to the derived value).
    [r] = parse_one(spark, '{"message":"ok","function.name":null,"@timestamp":null}')
    assert r["function.name"] is None
    assert r["@timestamp"] is None
    assert r["function.version"] == "42"  # absent key -> derived survives


def test_f6_structured(spark):
    [r] = parse_one(spark, f"{TS}\t{UUID}\tHello World!")
    assert r["@timestamp"] == TS
    assert r["function.request.id"] == UUID
    assert r["message"] == "Hello World!"
    assert r["severity"] == "debug"
    assert r["attributes"] is None


def test_f7_structured_error(spark):
    [r] = parse_one(spark, f"{TS}\t{UUID}\tSome Error here")
    assert r["severity"] == "error"
    assert r["error.type"] == "runtime"


def test_f8_tab_truncation_q2(spark):
    [r] = parse_one(spark, f"{TS}\t{UUID}\tpart1\tpart2")
    assert r["message"] == "part1"  # Q2: split('\t', 3) discards the rest


def test_f9_space_separated_goes_to_dlq(spark):
    # matches the structured regex (space separators allowed) but the
    # splitter is tab-only -> reference crashed the whole batch (Q4).
    [r] = parse_one(spark, f"{TS} {UUID} Hello")
    assert r["is_corrupt"] is True
    assert r["message"] is None


def test_f10_too_few_tab_parts_goes_to_dlq(spark):
    [r] = parse_one(spark, f"{TS} {UUID}\tonly-one-tab")
    assert r["is_corrupt"] is True


def test_f11_plain_text(spark):
    [r] = parse_one(spark, "just some text")
    assert r["message"] == "just some text"
    assert r["@timestamp"] is None
    assert r["function.request.id"] is None
    assert r["severity"] == "debug"


def test_f12_q1_precedence_module_init_is_runtime(spark):
    [r] = parse_one(spark, "module initialization error: xyz")
    assert r["severity"] == "error"
    assert r["error.type"] == "runtime"  # Q1: contains 'error', never 'configuration'


def test_f13_unable_to_import_is_configuration(spark):
    [r] = parse_one(spark, "unable to import module foo")
    assert r["severity"] == "error"
    assert r["error.type"] == "configuration"


@pytest.mark.parametrize(
    "msg",
    [
        "Task timed out after 3.00 seconds",
        "RequestId: x Process exited before completing request",
    ],
)
def test_f14_f15_timeouts(spark, msg):
    [r] = parse_one(spark, msg)
    assert r["severity"] == "error"
    assert r["error.type"] == "timeout"


@pytest.mark.parametrize(
    "msg",
    [
        "START RequestId: abc Version: 1",
        "END RequestId: abc",
        "REPORT RequestId: abc Duration: 1 ms",
    ],
)
def test_f16_f17_platform_messages_dropped(spark, msg):
    assert parse_one(spark, msg) == []


def test_f19_logstream_without_brackets(spark):
    [r] = parse_one(spark, "x", log_stream="nostream")
    assert r["function.version"] == ""


def test_f20_loggroup_without_slashes(spark):
    [r] = parse_one(spark, "x", log_group="plain")
    assert r["function.name"] == "plain"


def test_split_dlq(spark):
    df = spark.createDataFrame(
        [
            Row(awsRegion="r", logGroup=LG, logStream=LS, message="fine"),
            Row(awsRegion="r", logGroup=LG, logStream=LS, message=f"{TS} {UUID} boom"),
        ]
    )
    clean, dlq = split_dlq(parse_log_events(df))
    assert clean.count() == 1
    assert "_raw" not in clean.columns
    [d] = dlq.collect()
    assert d["_raw"] == f"{TS} {UUID} boom"


def test_classification_case_insensitive(spark):
    [r] = parse_one(spark, "ERROR: something broke")
    assert r["severity"] == "error"
    assert r["error.type"] == "runtime"
    [r] = parse_one(spark, "TASK TIMED OUT")
    assert r["error.type"] == "timeout"


def test_json_nested_attributes_kept_typed(spark):
    # variant values: nested object/array survive TYPED, not as text
    [r] = parse_one(spark, '{"message":"m","ctx":{"a":1},"tags":[1,2]}')
    assert attrs_plain(r) == {"ctx": {"a": 1}, "tags": [1, 2]}
