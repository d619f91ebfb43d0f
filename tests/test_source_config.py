"""SourceConfig seam: the file and Kinesis transports render from one
config object; the prod option map mirrors serverless.yml:24-32 and
the pipeline path is unchanged (same record shape either way)."""

from __future__ import annotations

import json

import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources.kinesis import (
    SourceConfig,
)


def test_kinesis_option_map_mirrors_serverless_yml():
    cfg = SourceConfig(
        kind="kinesis",
        stream_name="LogsKinesisStream",
        region="eu-west-2",
        max_records_per_fetch=1000,
    )
    assert cfg.kinesis_options() == {
        "streamName": "LogsKinesisStream",
        "region": "eu-west-2",
        "startingPosition": "LATEST",  # serverless.yml:31
        "maxRecordsPerFetch": "1000",  # BATCH_SIZE stand-in
    }
    with_ep = SourceConfig(
        kind="kinesis",
        stream_name="s",
        endpoint_url="https://kinesis.local:4566",
    )
    assert (
        with_ep.kinesis_options()["endpointUrl"]
        == "https://kinesis.local:4566"
    )


def test_config_validation():
    with pytest.raises(ValueError):
        SourceConfig(kind="files")  # no path
    with pytest.raises(ValueError):
        SourceConfig(kind="kinesis")  # no stream name
    with pytest.raises(ValueError):
        SourceConfig(kind="socket", path="/x")
    with pytest.raises(ValueError):
        SourceConfig(kind="kinesis", stream_name="s").batch(None)


def test_file_transport_through_config(spark, tmp_path):
    """kind='files' renders the exact record frame the decode kernel
    consumes — the seam changes transports, never the pipeline."""
    import base64
    import gzip

    payload = base64.b64encode(
        gzip.compress(json.dumps({"messageType": "DATA_MESSAGE"}).encode())
    ).decode()
    event = {
        "Records": [
            {
                "kinesis": {"data": payload},
                "awsRegion": "us-east-1",
            }
        ]
    }
    p = tmp_path / "events.jsonl"
    p.write_text(json.dumps(event) + "\n")
    cfg = SourceConfig(kind="files", path=str(p))
    rows = cfg.batch(spark).collect()
    assert [r.asDict() for r in rows] == [
        {"data": payload, "awsRegion": "us-east-1"}
    ]
    sdf = cfg.stream(spark)
    assert sdf.isStreaming and sdf.columns == ["data", "awsRegion"]
