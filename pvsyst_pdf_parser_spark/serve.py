"""Minimal serving surface mirroring the reference API contract.

The reference ships ``app.py`` (FastAPI) with two routes:

- ``POST /api/parse`` — multipart PDF upload → parsed JSON
- ``GET  /api/health`` — liveness

(The reference's own handler imports ``pvsyst_parser_v3`` — a module
that does not exist in the repo — so its API path is dead code; see
SURVEY.md §8.  This shim exposes the same contract backed by the
WORKING pipeline: the uploaded payload runs through
``pipeline.extract_documents`` on the caller's SparkSession and the
response body is the canonical V3 JSON — byte-identical to what the
reference CLI writes as ``*_structured_v3.json``.)

Stdlib-only (http.server + email multipart parsing) because the
sandbox has no FastAPI; a batch engine's serving story is one
SparkSession handling one-off documents, not a fleet — for throughput
use the batch pipeline.
"""

from __future__ import annotations

import json
import threading
from email.parser import BytesParser
from email.policy import default as _email_default
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _extract_pdf_from_multipart(content_type: str, body: bytes) -> bytes | None:
    """First file part of a multipart/form-data body (None if absent)."""
    head = f"Content-Type: {content_type}\r\n\r\n".encode()
    msg = BytesParser(policy=_email_default).parsebytes(head + body)
    if not msg.is_multipart():
        return None
    for part in msg.iter_parts():
        if part.get_filename() or part.get_param(
            "name", header="content-disposition"
        ) in ("file", None):
            payload = part.get_payload(decode=True)
            if payload:
                return payload
    return None


# Reject uploads above this size before reading the body: the handler
# buffers the whole payload in driver memory, so an unbounded
# Content-Length is a driver-OOM vector once the server is bound beyond
# localhost.  100 MB comfortably exceeds any real PVsyst report.
MAX_PAYLOAD_BYTES = 100 * 1024 * 1024


def _make_handler(spark, max_payload_bytes: int = MAX_PAYLOAD_BYTES):
    from pyspark.sql import functions as F

    from .pipeline import extract_documents

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, payload: str) -> None:
            body = payload.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/api/health":
                self._json(200, json.dumps({"status": "ok"}))
            elif self.path in ("/", "/index.html"):
                from .webui import INDEX_HTML

                body = INDEX_HTML.encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, json.dumps({"detail": "not found"}))

        def do_POST(self):
            if self.path != "/api/parse":
                self._json(404, json.dumps({"detail": "not found"}))
                return
            # Malformed headers must yield a clean 4xx, not an unhandled
            # exception (connection reset).  Chunked transfer encoding is
            # not implemented here: a chunked request WITH Content-Length
            # is the classic request-smuggling ambiguity (RFC 9112 §6.1
            # says Transfer-Encoding wins; reading by Content-Length
            # would swallow chunk framing into the body) — reject 400
            # whenever chunked is present, 411 when there is no length
            # at all.
            raw_len = self.headers.get("Content-Length")
            if "chunked" in (
                self.headers.get("Transfer-Encoding") or ""
            ).lower():
                if raw_len is None:
                    self._json(411, json.dumps({"detail": "Length Required"}))
                else:
                    self._json(
                        400,
                        json.dumps(
                            {"detail": "Transfer-Encoding: chunked is not supported."}
                        ),
                    )
                return
            try:
                length = int(raw_len or "0")
            except ValueError:
                self._json(
                    400, json.dumps({"detail": "Bad Content-Length header."})
                )
                return
            if length < 0:
                self._json(
                    400, json.dumps({"detail": "Bad Content-Length header."})
                )
                return
            if length > max_payload_bytes:
                self._json(
                    413,
                    json.dumps(
                        {"detail": f"Payload exceeds {max_payload_bytes} bytes."}
                    ),
                )
                return
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if ctype.startswith("multipart/"):
                payload = _extract_pdf_from_multipart(ctype, body)
            else:
                payload = body  # raw application/pdf body
            if not payload:
                self._json(
                    400, json.dumps({"detail": "Please upload a PDF file."})
                )
                return
            try:
                pages = spark.createDataFrame(
                    [("upload://request", payload, None, "en")],
                    "url string, html binary, text string, lang string",
                )
                rows = extract_documents(pages).select(
                    "extracted_json", F.col("url")
                ).collect()
                if not rows:  # quarantined payload (decode error)
                    self._json(
                        400, json.dumps({"detail": "Unparseable payload."})
                    )
                    return
                self._json(200, rows[0]["extracted_json"])
            except Exception as exc:  # noqa: BLE001 - mirror reference 500
                self._json(500, json.dumps({"detail": f"Parsing failed: {exc}"}))

    return Handler


class ParserServer:
    """``with ParserServer(spark) as srv: requests to srv.url`` — serves
    the reference API contract on an ephemeral port."""

    def __init__(
        self,
        spark,
        host: str = "127.0.0.1",
        port: int = 0,
        max_payload_bytes: int = MAX_PAYLOAD_BYTES,
    ) -> None:
        self._httpd = ThreadingHTTPServer(
            (host, port), _make_handler(spark, max_payload_bytes)
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def __enter__(self) -> "ParserServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
