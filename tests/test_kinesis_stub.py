"""The last untested seam (r13 verdict #8): SourceConfig's PRODUCTION
Kinesis path — ``readStream.format(<connector>)`` + the rendered option
map + the (data, awsRegion) normalization — exercised END TO END
against the recorded-protocol stub connector
(sources/kinesis_stub.py, the control_client.py pattern)."""

from __future__ import annotations

import json


def test_source_config_kinesis_path_end_to_end(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.pipeline import (
        run_batch,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources.kinesis import (
        SourceConfig,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources.kinesis_stub import (
        KinesisStubSource,
    )

    try:
        spark.dataSource.register(KinesisStubSource)
    except Exception as exc:  # double registration across tests
        if "already" not in str(exc).lower():
            raise
    rec_path = str(tmp_path / "recorded_options.json")
    cfg = SourceConfig(
        kind="kinesis",
        stream_name="LogsKinesisStream",
        region="eu-west-2",
        starting_position="LATEST",
        max_records_per_fetch=1000,
        endpoint_url="https://kinesis.local:4566",
        connector_format="kinesis_stub",
        extra_options={"recordpath": rec_path},
    )
    records = cfg.stream(spark)
    assert records.isStreaming
    assert [f.name for f in records.schema.fields] == ["data", "awsRegion"]

    out = str(tmp_path / "out")

    def sink(batch_df, batch_id):
        clean, _dlq = run_batch(batch_df)
        clean.write.mode("append").parquet(out)

    q = (
        records.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5
    assert {r["function.name"] for r in rows} == {"stub-fn"}
    assert {r["region"] for r in rows} == {"eu-west-2"}
    assert sorted(r["message"] for r in rows) == [
        f"stub line {i}" for i in range(5)
    ]

    # the recorded protocol: every rendered option reached the
    # connector verbatim (Spark lowercases data source option keys)
    with open(rec_path) as f:
        recorded = json.load(f)
    lowered = {k.lower(): v for k, v in recorded.items()}
    for k, v in cfg.kinesis_options().items():
        assert lowered[k.lower()] == v, k
