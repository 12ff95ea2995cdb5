"""Minimal HTTP health/metrics endpoint.

``GET /healthz`` → 200 "ok"; ``GET /metrics`` → JSON ChunkMetrics snapshot.
The structured replacement for the reference's stderr timers (SURVEY §5
tracing/observability) in a form scrapers can poll.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def start_health_server(metrics, host: str = "127.0.0.1", port: int = 0, extra=None):
    """Serve in a daemon thread; returns (server, actual_port).

    ``extra`` — optional zero-arg callable returning a dict merged into the
    ``/metrics`` JSON (e.g. live pool occupancy from the serving entry)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/healthz":
                body = b"ok"
                ctype = "text/plain"
            elif self.path == "/metrics":
                snap = metrics.snapshot().as_dict()
                if extra is not None:
                    snap.update(extra())
                body = json.dumps(snap).encode()
                ctype = "application/json"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1]
