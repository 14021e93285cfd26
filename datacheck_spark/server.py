"""Minimal stdlib HTTP server exposing the tool API.

Reference: ``server/`` FastAPI wrappers (``server/routers/check.py``)
whose ``POST /api/check`` response shape is the canonical machine
contract (SURVEY §3). This sandbox ships no FastAPI, so a
``http.server`` wrapper provides the same endpoints over the same
engine: ``POST /api/check`` → CheckResult dict; ``POST /api/tools/
<tool>`` → ``api.call_tool``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import SparkSession

from datacheck_spark import api as tool_api


def make_handler(spark: SparkSession):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, ensure_ascii=False, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/api/tools":
                # same typed descriptors the MCP tools/list publishes
                from datacheck_spark.mcp_stdio import _tool_descriptor

                self._send(
                    200,
                    {
                        "tools": [
                            _tool_descriptor(t) for t in tool_api.TOOLS
                        ]
                    },
                )
            elif self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                args = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON"})
                return
            try:
                if self.path == "/api/check":
                    out = tool_api.call_tool(spark, "check_data_quality", args)
                elif self.path.startswith("/api/tools/"):
                    tool = self.path[len("/api/tools/"):]
                    out = tool_api.call_tool(spark, tool, args)
                else:
                    self._send(404, {"error": "not found"})
                    return
                self._send(200, out)
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # engine failure -> 500 with message
                self._send(500, {"error": str(e)})

    return Handler


def serve(
    spark: SparkSession, host: str = "127.0.0.1", port: int = 8765
) -> ThreadingHTTPServer:
    """Start the server on a daemon thread; returns the server object
    (call ``.shutdown()`` to stop)."""
    httpd = ThreadingHTTPServer((host, port), make_handler(spark))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
