"""HTTP transport adapter (reference adapters/src/transport/http/) driven
against a real local HTTP server: poll-source decodes JSONL/CSV into typed
deltas; the output endpoint POSTs emitted deltas as JSON lines."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from database_stream_processor_spark.sources.http import (
    HttpOutput,
    http_poll_source,
)


class _Handler(http.server.BaseHTTPRequestHandler):
    payload = b""
    received: list[bytes] = []

    def do_GET(self):
        self.send_response(200)
        self.end_headers()
        self.wfile.write(self.payload)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        _Handler.received.append(self.rfile.read(n))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.received = []
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_poll_source_jsonl(spark, server):
    _Handler.payload = (b'{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    df = http_poll_source(spark, server, "k int, v string")
    assert {tuple(r) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_http_poll_source_csv(spark, server):
    _Handler.payload = b"1,a\n2,b\n"
    df = http_poll_source(spark, server, "k int, v string", format="csv")
    assert {tuple(r) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_http_output_posts_jsonl(spark, server):
    out = HttpOutput(server)
    out.send(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    assert out.posts == 1
    rows = [json.loads(ln) for ln in
            _Handler.received[0].decode().splitlines()]
    assert sorted(rows, key=lambda r: r["k"]) == [
        {"k": 1, "v": "a"}, {"k": 2, "v": "b"}]


def test_http_output_chunks_bound_driver_memory(spark, server):
    """A multi-partition delta larger than rows_per_post goes out as
    several bounded POSTs, not one driver-resident payload."""
    out = HttpOutput(server, rows_per_post=7)
    df = spark.range(0, 20, numPartitions=4).selectExpr(
        "id AS k", "CAST(id AS STRING) AS v")
    out.send(df)
    assert out.posts == 3  # ceil(20 / 7)
    got = []
    for body in _Handler.received:
        lines = body.decode().splitlines()
        assert len(lines) <= 7  # cap honored on every POST
        got.extend(json.loads(ln)["k"] for ln in lines)
    assert sorted(got) == list(range(20))
