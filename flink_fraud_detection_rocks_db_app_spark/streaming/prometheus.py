"""Prometheus exposition of the job metrics (K3 parity, last delta).

The reference registers four gauges — latency, throughput, duration,
numEvents — and serves them with `new HTTPServer(8080)`
(reference: GraphSolution-Prometheus-SlidingWindows/src/main/java/
spendreport/FraudDetectionJob.java:52-69,173-191). This module exposes
the same four metrics, with the same names and definitions, from a
`JobMetrics` snapshot in Prometheus text exposition format 0.0.4 —
two interchangeable transports, both stdlib-only (prometheus_client is
not installable in this environment):

- `write_textfile()` — the node_exporter *textfile collector*
  contract: atomically write a `.prom` file that a collector scrapes.
  This is also the right shape for Spark executors-on-a-cluster, where
  a sidecar scrapes per-node files rather than per-driver ports.
- `MetricsEndpoint` — an in-process HTTP `/metrics` endpoint
  (http.server on a daemon thread), the reference's HTTPServer shape.
"""

from __future__ import annotations

import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .listener import JobMetrics

_HELP = {
    "latency": "The latency of the Flink job",
    "throughput": "The throughput of the Flink job",
    "duration": "The duration of the Flink job",
    "numEvents": "The numEvents of the Flink job",
}


def gauge_values(metrics: JobMetrics) -> dict[str, float]:
    """The reference's four gauge values, by its definitions
    (latency = duration_ms/numEvents, throughput = numEvents/duration_s)."""
    return {
        "latency": metrics.latency_ms_per_event,
        "throughput": metrics.throughput_events_per_sec,
        "duration": metrics.duration_ms,
        "numEvents": float(metrics.num_events),
    }


def prometheus_text(metrics: JobMetrics) -> str:
    """Render the gauges in Prometheus text exposition format 0.0.4."""
    lines: list[str] = []
    for name, value in gauge_values(metrics).items():
        lines.append(f"# HELP {name} {_HELP[name]}")
        lines.append(f"# TYPE {name} gauge")
        lines.append(f"{name} {value!r}")
    return "\n".join(lines) + "\n"


def write_textfile(metrics: JobMetrics, path: str) -> None:
    """Textfile-collector export: write-then-rename so a concurrent
    scrape never sees a partial file (the node_exporter contract)."""
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".prom.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(prometheus_text(metrics))
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


class MetricsEndpoint:
    """In-process /metrics endpoint over a live JobMetrics object.

    `port=0` binds an ephemeral port (tests); the reference hard-codes
    8080. The handler renders the CURRENT metrics snapshot at scrape
    time, so a streaming query's listener updates are visible to the
    next scrape without coordination.
    """

    CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"

    def __init__(self, metrics: JobMetrics, port: int = 0) -> None:
        endpoint = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802
                if self.path not in ("/", "/metrics"):
                    self.send_error(404)
                    return
                body = prometheus_text(endpoint.metrics).encode()
                self.send_response(200)
                self.send_header("Content-Type", endpoint.CONTENT_TYPE)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # silence test output
                pass

        self.metrics = metrics
        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}/metrics"

    def start(self) -> "MetricsEndpoint":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "MetricsEndpoint":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
