"""HTTP transport binding (reference: crates/adapters/src/transport/http/
— the pipeline's HTTP ingress/egress endpoints: clients POST rows into an
input handle, GET/stream rows out of an output handle).

Spark has no built-in HTTP source, so this adapter does the idiomatic
thing at each end:

- **ingress**: :func:`http_poll_source` fetches a payload on the *driver*
  (one small request per tick — the transport is the bottleneck, not the
  cluster) and parallelizes the decoded rows into a DataFrame delta.
  Feed it to an input handle / ``StepDriver`` per tick.
- **egress**: :class:`HttpOutput` POSTs each emitted delta as JSON lines.
  Rows are serialized *distributed* (``to_json`` is a JVM expression);
  only the final payload assembly and the request run on the driver.

Both use only the Python standard library (``urllib``) — no extra
dependencies — and accept any URL scheme urllib supports.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def http_fetch(url: str, timeout: float = 30.0,
               headers: dict | None = None) -> bytes:
    """GET ``url`` and return the body (driver-side)."""
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read()


def http_poll_source(spark: SparkSession, url: str, schema: str,
                     format: str = "jsonl", timeout: float = 30.0,
                     headers: dict | None = None) -> DataFrame:
    """One poll of an HTTP endpoint → a typed DataFrame delta
    (transport/http input endpoint).  ``format``: ``jsonl`` (one JSON
    object per line) or ``csv`` (no header).  Call once per tick; push
    the result into an input handle."""
    body = http_fetch(url, timeout=timeout, headers=headers).decode("utf-8")
    lines = [ln for ln in body.splitlines() if ln.strip()]
    raw = spark.createDataFrame([(ln,) for ln in lines], "line string")
    if format == "jsonl":
        return (raw.select(F.from_json("line", schema).alias("v"))
                .select("v.*"))
    if format == "csv":
        return (raw.select(F.from_csv("line", schema).alias("v"))
                .select("v.*"))
    raise ValueError(f"unsupported format: {format}")


class HttpOutput:
    """HTTP output endpoint (transport/http output): POST each delta as
    JSON-lines.  Serialization is distributed (``to_json`` per partition);
    the driver only concatenates and sends — appropriate because an HTTP
    egress is inherently a single-endpoint sink (the reference's HTTP
    output likewise funnels through one connection)."""

    def __init__(self, url: str, headers: dict | None = None,
                 timeout: float = 30.0, rows_per_post: int = 10_000):
        self.url = url
        self.headers = {"Content-Type": "application/x-ndjson",
                        **(headers or {})}
        self.timeout = timeout
        self.rows_per_post = rows_per_post
        self.posts = 0

    def send(self, df: DataFrame) -> None:
        """POST the delta in bounded chunks of ``rows_per_post`` rows.

        Rows stream through the driver via ``toLocalIterator`` — one
        partition resident at a time — so an unbounded delta can't OOM the
        driver the way a full ``collect()`` would."""
        rows = df.select(
            F.to_json(F.struct(*df.columns)).alias("j")).toLocalIterator()
        chunk: list[str] = []
        sent_any = False
        for r in rows:
            chunk.append(r["j"])
            if len(chunk) >= self.rows_per_post:
                self._post(chunk)
                sent_any = True
                chunk = []
        if chunk or not sent_any:
            # empty delta still posts once (a tick heartbeat, matching the
            # pre-chunking behavior)
            self._post(chunk)

    def _post(self, lines: list[str]) -> None:
        req = urllib.request.Request(
            self.url, data="\n".join(lines).encode("utf-8"),
            headers=self.headers, method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout):
            self.posts += 1

    def send_json(self, obj) -> None:
        """POST a single JSON document (control-plane style)."""
        req = urllib.request.Request(
            self.url, data=json.dumps(obj).encode("utf-8"),
            headers={"Content-Type": "application/json", **self.headers},
            method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout):
            self.posts += 1
