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
