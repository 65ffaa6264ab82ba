"""HTTP serving facade for the synthetic event generator.

Reference parity (``src/api/generator.py:93-148``): ``GET /health``,
``POST /generate`` (201, one event), ``POST /generate-batch?count=N``
(201, N events; 400 unless 1 ≤ count ≤ 1000). The reference pushes each
event to Kafka; here the generated rows come from the deterministic
Spark source (``generator.synthetic_events``) and are returned to the
HTTP caller — the Kafka leg stays the separate, config-gated
``generator.produce_to_kafka`` (unexercised in-sandbox, see README).

Implementation is the stdlib ``http.server`` (no web framework in the
container). Serving single events over HTTP is inherently driver-side,
so the ≤1000-row ``collect()`` here is the API contract, not a scale
smell — bulk generation goes through the DataFrame source directly.
A monotone offset keeps successive calls yielding fresh rows while the
whole request history stays reproducible (row ids continue from the
previous batch; same (n, start) → same events, any cluster).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from .generator import synthetic_events

MAX_BATCH = 1000


class GeneratorAPI:
    """Lifecycle wrapper: ``start()`` binds (port 0 = ephemeral) and
    serves on a daemon thread; ``stop()`` shuts the server down."""

    def __init__(self, spark: SparkSession, host: str = "127.0.0.1", port: int = 0):
        self._spark = spark
        self._host = host
        self._port = port
        self._offset = 0
        self._lock = threading.Lock()
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def _take_batch(self, count: int) -> list[dict]:
        with self._lock:
            start = self._offset
            self._offset += count
        rows = synthetic_events(self._spark, count, start=start).toJSON().collect()
        return [json.loads(r) for r in rows]

    # -- server plumbing ---------------------------------------------------

    def start(self) -> int:
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test output
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if urlparse(self.path).path == "/health":
                    self._reply(200, {"status": "alive"})
                else:
                    self._reply(404, {"detail": "not found"})

            def do_POST(self):
                parsed = urlparse(self.path)
                if parsed.path == "/generate":
                    self._reply(
                        201,
                        {"status": "generated", "data": api._take_batch(1)[0]},
                    )
                elif parsed.path == "/generate-batch":
                    raw = parse_qs(parsed.query).get("count", ["10"])[0]
                    try:
                        count = int(raw)
                    except ValueError:
                        self._reply(400, {"detail": "count must be an integer"})
                        return
                    if count < 1 or count > MAX_BATCH:
                        self._reply(
                            400,
                            {"detail": f"count must be between 1 and {MAX_BATCH}"},
                        )
                        return
                    events = api._take_batch(count)
                    self._reply(
                        201,
                        {"status": "generated", "count": count, "data": events},
                    )
                else:
                    self._reply(404, {"detail": "not found"})

        self._server = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
