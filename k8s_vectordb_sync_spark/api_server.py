"""Operational HTTP server — the analog of the reference's API server
(internal/api/server.go:29-46 route registration, :79-97 handler, :103-107
JSON writer), on the stdlib ``http.server`` (no web framework needed).

One route, matching the reference mux exactly (server.go:38):

    POST /api/v1/resync  ->  {"status", "resources", "message"}

Success is ``{"status": "ok", "resources": n, "message": "resynced n
resources"}`` (server.go:92-96); a failing resync returns HTTP 500 with
``{"status": "error", ...}`` (server.go:82-89). Unknown paths 404; a GET on
the resync path 405 — the same behavior Go's method-qualified mux gives.

The server runs on a daemon thread (the analog of manager.Runnable's
goroutine, server.go:50-70); the Spark work happens in the injected resync
callable, which executes on the caller-provided SparkSession from the
handler thread — Spark sessions are thread-safe for job submission, and ops
traffic is low-rate by construction.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

RESYNC_PATH = "/api/v1/resync"
SEARCH_PATH = "/api/v1/search"


@dataclass
class OpsServer:
    """Bind-and-serve wrapper. ``resync`` returns the number of resources
    synced (the Resyncer interface, server.go:16-18); raise to signal failure.
    """

    resync: Callable[[], int]
    bind_address: str = ":0"
    # optional serving route: POST /api/v1/search with a JSON request
    # ({"tier", "k", "query_vec" | "terms"}) -> {"results": [...]}; wire
    # with api.make_search_handler over persisted indexes. None = 404.
    search: Callable[[dict], list] | None = None

    _httpd: ThreadingHTTPServer | None = None
    _thread: threading.Thread | None = None

    def start(self) -> tuple[str, int]:
        """Start serving on a daemon thread; returns (host, port) actually
        bound (port 0 picks a free one, like the reference's net.Listen)."""
        host, _, port = self.bind_address.rpartition(":")
        handler = _make_handler(self.resync, self.search)
        self._httpd = ThreadingHTTPServer((host or "127.0.0.1", int(port)), handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self._httpd.server_address[:2]

    def stop(self) -> None:
        """Graceful shutdown (server.go:59-64)."""
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def _make_handler(
    resync: Callable[[], int], search: Callable[[dict], list] | None = None
) -> type[BaseHTTPRequestHandler]:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt: str, *args) -> None:  # quiet by default
            pass

        def _write_json(self, status: int, body: dict) -> None:
            # server.go:103-107
            data = json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self) -> None:
            if self.path == SEARCH_PATH:
                if search is None:
                    self._write_json(
                        404, {"status": "error", "message": "search not configured"}
                    )
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    results = search(req)
                except (KeyError, ValueError, json.JSONDecodeError) as exc:
                    self._write_json(
                        400, {"status": "error", "message": f"bad request: {exc}"}
                    )
                    return
                except Exception as exc:  # noqa: BLE001 — engine failure
                    self._write_json(
                        500, {"status": "error", "message": f"search failed: {exc}"}
                    )
                    return
                self._write_json(200, {"status": "ok", "results": results})
                return
            if self.path != RESYNC_PATH:
                self._write_json(404, {"status": "error", "message": "not found"})
                return
            # server.go:79-97
            try:
                count = int(resync())
            except Exception as exc:  # noqa: BLE001 — any failure is a 500
                self._write_json(
                    500,
                    {
                        "status": "error",
                        "resources": 0,
                        "message": f"resync failed: {exc}",
                    },
                )
                return
            self._write_json(
                200,
                {
                    "status": "ok",
                    "resources": count,
                    "message": f"resynced {count} resources",
                },
            )

        def do_GET(self) -> None:
            if self.path == RESYNC_PATH:
                # method-qualified mux: right path, wrong method
                self.send_response(405)
                self.send_header("Allow", "POST")
                self.end_headers()
            else:
                self._write_json(404, {"status": "error", "message": "not found"})

    return Handler
