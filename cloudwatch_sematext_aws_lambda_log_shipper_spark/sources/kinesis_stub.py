"""Recorded-protocol Kinesis connector stub (r14 — the last seam).

``SourceConfig(kind="kinesis")`` renders the production
``readStream.format(<connector>).option(...)`` call
(sources/kinesis.py; serverless.yml:24-32 semantics), but no real
Kinesis connector exists in a no-network sandbox, so until r14 that
path was exercised only up to option RENDERING. This module closes the
gap the way control_client.py closed the boto3 one: a real Spark 4
Python streaming data source registered under a connector name, so the
exact production call path — format().options().load() → the
(data, awsRegion) normalization → decode/parse — executes end to end,
while the stub:

- RECORDS the option map Spark hands the connector (pass
  ``recordpath`` to persist it as JSON; Spark lowercases data source
  option keys) — the protocol assertion;
- EMITS Kinesis-connector-shaped records: ``data binary`` holding the
  base64(gzip(envelope)) payload bytes CloudWatch Logs delivers,
  plus partitionKey and approximateArrivalTimestamp.

Use from tests/dev sessions:

    spark.dataSource.register(KinesisStubSource)
    SourceConfig(kind="kinesis", connector_format="kinesis_stub", ...)

A deployment swaps ``connector_format`` back to its real connector
("kinesis" / "aws-kinesis") and nothing else changes.
"""

from __future__ import annotations

import base64
import datetime
import gzip
import json

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)


def stub_payload(n_events: int = 5, fn: str = "stub-fn") -> bytes:
    """One CloudWatch-Logs-shaped envelope as the base64(gzip(...))
    bytes a Kinesis record carries."""
    body = {
        "messageType": "DATA_MESSAGE",
        "owner": "123",
        "logGroup": f"/aws/lambda/{fn}",
        "logStream": "2026/08/16/[$LATEST]abc",
        "subscriptionFilters": ["f"],
        "logEvents": [
            {
                "id": str(i),
                "timestamp": 1700000000000 + i,
                "message": f"stub line {i}",
            }
            for i in range(n_events)
        ],
    }
    return base64.b64encode(gzip.compress(json.dumps(body).encode()))


class _StubReader(SimpleDataSourceStreamReader):
    """One record per offset, ``batches`` offsets total (option,
    default 1 — offset 0 replays the original single-batch payload
    verbatim; later offsets get per-offset function names so batch
    boundaries are visible downstream)."""

    def __init__(self, options):
        self.options = dict(options)
        self.n_batches = int(self.options.get("batches", "1"))

    def initialOffset(self):
        # the recorded-protocol half: persist exactly the options the
        # engine handed the connector (runs driver-side)
        rec = self.options.get("recordpath")
        if rec:
            with open(rec, "w") as f:
                json.dump(self.options, f)
        return {"offset": 0}

    def _rows_at(self, offset):
        fn = "stub-fn" if offset == 0 else f"stub-fn-{offset}"
        base = datetime.datetime(2026, 8, 16, 12, 0, 0)
        return [
            (
                stub_payload(fn=fn),
                f"shard-{offset % 2}",
                # timedelta, not the seconds field: offset >= 60 would
                # raise ValueError inside the data-source worker
                base + datetime.timedelta(seconds=offset),
            )
        ]

    def read(self, start):
        o = start["offset"]
        if o >= self.n_batches:
            return iter([]), start
        return iter(self._rows_at(o)), {"offset": o + 1}

    def readBetweenOffsets(self, start, end):
        # replay EXACTLY [start, end) — an earlier cut ignored `end`
        # and replayed everything from `start` (r14 ADVICE), and a
        # second cut clamped to the CURRENT `batches` option, silently
        # under-replaying a committed range after a restart with a
        # smaller option (r15 review). The checkpoint's [start, end)
        # contract wins: rows are synthesizable for any offset, so a
        # committed range always replays in full; only read() (NEW
        # offsets) is bounded by `batches`.
        rows = []
        for o in range(start["offset"], end["offset"]):
            rows.extend(self._rows_at(o))
        return iter(rows)


class KinesisStubSource(DataSource):
    """Register with ``spark.dataSource.register(KinesisStubSource)``;
    then ``format("kinesis_stub")`` behaves like a one-batch Kinesis
    stream."""

    @classmethod
    def name(cls):
        return "kinesis_stub"

    def schema(self):
        return ("data binary, partitionKey string,"
                " approximateArrivalTimestamp timestamp")

    def simpleStreamReader(self, schema):
        return _StubReader(self.options)
