"""Round-12: HttpBulkTransport against an in-process loopback server
(r11 verdict #6) — fails-twice -> exactly-once over REAL HTTP, the
logsene-js resend contract (shipper.js:29, 143-148) driven through the
seam with actual sockets."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.transport import (
    HttpBulkTransport,
    TransportError,
    ship_bulks,
)


class _BulkHandler(http.server.BaseHTTPRequestHandler):
    """ES-_bulk-shaped receiver: per-key attempt counting (the first
    ``fail_times`` sends per key get a 503), last-write-wins payload
    store keyed on X-Bulk-Key — the idempotent receiver the transport
    contract assumes."""

    def do_POST(self):
        srv = self.server
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        key = self.headers.get("X-Bulk-Key", "?")
        if self.path != "/_bulk":
            self.send_response(404)
            self.end_headers()
            return
        with srv.lock:
            srv.attempts[key] = srv.attempts.get(key, 0) + 1
            fail = srv.attempts[key] <= srv.fail_times
            if not fail:
                srv.store[key] = body
        if fail:
            self.send_response(503)
            self.end_headers()
        else:
            out = b'{"errors":false}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def bulk_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _BulkHandler)
    srv.lock = threading.Lock()
    srv.attempts = {}
    srv.store = {}
    srv.fail_times = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()


def _docs_df(spark, n=250):
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("msg-"), F.col("id")).alias("message"),
            F.lit("info").alias("severity"),
            F.col("id").alias("seq"),
        )
        .repartition(3)
    )


def _stored_docs(srv):
    docs = []
    for body in srv.store.values():
        lines = body.decode().splitlines()
        assert len(lines) % 2 == 0  # action line + doc line
        docs.extend(json.loads(lines[i]) for i in range(1, len(lines), 2))
    return docs


def test_http_transport_ships_every_doc_once(spark, bulk_server):
    port = bulk_server.server_address[1]
    stats = ship_bulks(
        _docs_df(spark, 250),
        lambda: HttpBulkTransport(f"http://127.0.0.1:{port}"),
        bulk_size=100,
    )
    assert stats["n_docs"] == 250
    assert stats["attempts"] == stats["n_bulks"]  # no retries needed
    docs = _stored_docs(bulk_server)
    assert len(docs) == 250
    assert {d["seq"] for d in docs} == set(range(250))


def test_http_fails_twice_then_exactly_once(spark, bulk_server):
    # every key's first TWO sends get a 503 over the wire; bounded
    # retry + idempotent receiver must still land every doc exactly
    # once, with attempts == 3x bulks
    bulk_server.fail_times = 2
    port = bulk_server.server_address[1]
    stats = ship_bulks(
        _docs_df(spark, 250),
        lambda: HttpBulkTransport(f"http://127.0.0.1:{port}"),
        bulk_size=100,
        max_retries=3,
        backoff_s=0.01,
    )
    assert stats["n_docs"] == 250
    assert stats["attempts"] == 3 * stats["n_bulks"]
    docs = _stored_docs(bulk_server)
    assert len(docs) == 250
    assert {d["seq"] for d in docs} == set(range(250))
    # the server really saw the failures: every key has 3 attempts
    assert all(v == 3 for v in bulk_server.attempts.values())


def test_http_exhausted_retries_raise(spark, bulk_server):
    bulk_server.fail_times = 99
    port = bulk_server.server_address[1]
    with pytest.raises(Exception) as ei:
        ship_bulks(
            _docs_df(spark, 50),
            lambda: HttpBulkTransport(f"http://127.0.0.1:{port}"),
            bulk_size=100,
            max_retries=1,
            backoff_s=0.01,
        )
    assert "HTTP 503" in str(ei.value)


def test_http_transport_driver_side_unit(bulk_server):
    # seam-level unit check without Spark: 404 path raises TransportError
    port = bulk_server.server_address[1]
    t = HttpBulkTransport(f"http://127.0.0.1:{port}/wrong")
    with pytest.raises(TransportError):
        t.send((0, 0, 0), b"x\n")
    ok = HttpBulkTransport(f"http://127.0.0.1:{port}")
    ok.send((1, 2, 3), b'{"index":{}}\n{"a":1}\n')
    assert "1-2-3" in bulk_server.store
