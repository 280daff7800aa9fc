"""Serving surface (reference app.py contract): POST /api/parse with a
PDF payload returns the canonical V3 JSON — byte-identical to the
reference CLI's *_structured_v3.json — and /api/health answers."""

from __future__ import annotations

import json
import urllib.request


def _post(url: str, data: bytes, ctype: str) -> tuple[int, bytes]:
    req = urllib.request.Request(url, data=data, headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_parse_endpoint_matches_reference(spark, fixture_docs, goldens):
    from pvsyst_pdf_parser_spark.serve import ParserServer

    doc = next(d for d in fixture_docs if d.spec.kind == "pdf")
    golden_json, _ = goldens[doc.url]

    with ParserServer(spark) as srv:
        with urllib.request.urlopen(srv.url + "/api/health", timeout=30) as r:
            assert json.loads(r.read()) == {"status": "ok"}

        # raw application/pdf body
        code, body = _post(srv.url + "/api/parse", doc.payload, "application/pdf")
        assert code == 200
        assert body.decode("utf-8") == golden_json

        # multipart/form-data upload (the reference's UploadFile path)
        boundary = "testboundary42"
        mp = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; filename="doc.pdf"\r\n'
            "Content-Type: application/pdf\r\n\r\n"
        ).encode() + doc.payload + f"\r\n--{boundary}--\r\n".encode()
        code, body = _post(
            srv.url + "/api/parse", mp,
            f"multipart/form-data; boundary={boundary}",
        )
        assert code == 200
        assert body.decode("utf-8") == golden_json

        # garbage payload → 400, not a crash
        code, _ = _post(srv.url + "/api/parse", b"\x00\xffnot a pdf", "application/pdf")
        assert code == 400


def test_parse_endpoint_rejects_oversized_payload(spark):
    """Uploads beyond max_payload_bytes are refused with 413 BEFORE the
    body is buffered (driver-OOM guard)."""
    from pvsyst_pdf_parser_spark.serve import ParserServer

    with ParserServer(spark, max_payload_bytes=1024) as srv:
        code, body = _post(
            srv.url + "/api/parse", b"x" * 4096, "application/pdf"
        )
        assert code == 413
        assert b"exceeds" in body


def test_malformed_content_length_and_chunked_rejected(spark):
    """A non-numeric Content-Length must yield a clean 400 (not an
    unhandled ValueError / connection reset); chunked uploads (no
    Content-Length) are refused with 411 instead of silently reading an
    empty body."""
    import socket
    from urllib.parse import urlparse

    from pvsyst_pdf_parser_spark.serve import ParserServer

    def raw_request(url: str, headers: list[str]) -> bytes:
        u = urlparse(url)
        with socket.create_connection((u.hostname, u.port), timeout=30) as s:
            req = (
                "POST /api/parse HTTP/1.1\r\n"
                f"Host: {u.hostname}\r\n" + "\r\n".join(headers) + "\r\n\r\n"
            )
            s.sendall(req.encode())
            return s.recv(65536)

    with ParserServer(spark) as srv:
        resp = raw_request(
            srv.url,
            ["Content-Type: application/pdf", "Content-Length: nonsense"],
        )
        assert resp.split(b"\r\n", 1)[0].split()[1] == b"400"

        resp = raw_request(
            srv.url,
            ["Content-Type: application/pdf", "Content-Length: -5"],
        )
        assert resp.split(b"\r\n", 1)[0].split()[1] == b"400"

        resp = raw_request(
            srv.url,
            ["Content-Type: application/pdf", "Transfer-Encoding: chunked"],
        )
        assert resp.split(b"\r\n", 1)[0].split()[1] == b"411"

        # Chunked WITH a Content-Length is the request-smuggling
        # ambiguity (RFC 9112 §6.1) — must be refused outright with 400,
        # never served by reading Content-Length bytes of chunk framing.
        resp = raw_request(
            srv.url,
            [
                "Content-Type: application/pdf",
                "Transfer-Encoding: chunked",
                "Content-Length: 10",
            ],
        )
        assert resp.split(b"\r\n", 1)[0].split()[1] == b"400"


def test_index_page_served_and_wired_to_api(spark):
    """GET / returns the upload UI; it must reference both API routes
    so the page actually drives the same contract the tests cover."""
    import urllib.request

    from pvsyst_pdf_parser_spark.serve import ParserServer

    with ParserServer(spark) as srv:
        with urllib.request.urlopen(f"{srv.url}/") as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/html")
            html = resp.read().decode("utf-8")
    assert "/api/parse" in html and "/api/health" in html
    assert "<input" in html and "FormData" in html
