"""Payload sniffing and the GRAFT text-layer PDF container.

Production target: real PVsyst PDFs decoded via pdfplumber inside the
Arrow-batched decode stage (reference behavior: ``page.extract_text()``
per page, /root/reference/pvsyst_parser.py:89-111).  pdfplumber is not
installed in this sandbox, so fixtures use a deterministic container —
``%PDF-`` magic (so payload sniffing is identical to production) with a
marker line and a JSON array of per-page text layers.  ``decode_pages``
tries pdfplumber first for real PDFs and falls back to the container.

The same sniffing decides the HTML boilerplate-strip path (north_rule:
HTML mirrors of report pages have no reference counterpart).
"""

from __future__ import annotations

import json

PDF_MAGIC = b"%PDF-"
GRAFT_MARKER = b"%GRAFT-TEXTLAYER-1\n"
_HEADER = b"%PDF-1.4\n" + GRAFT_MARKER

KIND_PDF = "pdf"
KIND_HTML = "html"
KIND_TEXT = "text"
KIND_UNKNOWN = "unknown"


def encode_textlayer_pdf(pages: list[str]) -> bytes:
    """Serialize per-page text layers into a %PDF- magic container."""
    return _HEADER + json.dumps(pages, ensure_ascii=False).encode("utf-8")


def is_graft_container(payload: bytes) -> bool:
    return payload.startswith(_HEADER)


def decode_textlayer_pdf(payload: bytes) -> list[str]:
    if not is_graft_container(payload):
        raise ValueError("not a GRAFT text-layer container")
    pages = json.loads(payload[len(_HEADER):].decode("utf-8"))
    if not isinstance(pages, list):
        raise ValueError("container body must be a JSON array of page strings")
    return [str(p) for p in pages]


def sniff_kind(payload: bytes | None, text: str | None = None) -> str:
    """Classify a payload: pdf / html / text / unknown."""
    if payload:
        if payload.startswith(PDF_MAGIC):
            return KIND_PDF
        head = payload[:256].lstrip().lower()
        if head.startswith(b"<!doctype html") or head.startswith(b"<html") or b"<html" in head:
            return KIND_HTML
    if text:
        return KIND_TEXT
    return KIND_UNKNOWN


def decode_pages(payload: bytes) -> list[str]:
    """Decode a PDF payload to per-page text layers.

    GRAFT containers decode natively; real PDFs require pdfplumber
    (import-gated — absent in this sandbox).
    """
    if is_graft_container(payload):
        return decode_textlayer_pdf(payload)
    try:
        import io as _io

        import pdfplumber  # type: ignore
    except ImportError as exc:  # pragma: no cover - sandbox has no pdfplumber
        raise NotImplementedError(
            "real-PDF decode requires pdfplumber (not installed); "
            "fixtures use the GRAFT text-layer container"
        ) from exc
    with pdfplumber.open(_io.BytesIO(payload)) as pdf:  # pragma: no cover
        return [(page.extract_text() or "") for page in pdf.pages]
