"""WARC (Web ARChive, ISO 28500 / the public WARC 1.0 spec) source —
the container format Common-Crawl-style corpora actually arrive in:
each file is a concatenation of records (warcinfo, request, response,
metadata...), each record a header block of ``Name: value`` lines, a
blank line, ``Content-Length`` payload bytes, and a two-CRLF trailer.
Response records carry a full HTTP message whose body is the page.

Spark shape: the unit of parallelism is the FILE (in production,
``spark.read.format("binaryFile")`` over a WARC bucket, or an Iceberg
table of (path, payload) — exactly the pages-table contract of
io/pages.py).  Parsing is one ``mapInPandas`` pass: pure-Python byte
walking inside Arrow batches, zero per-row Python UDF calls, records
stream out as typed rows.  A 100 TB crawl is millions of ~1 GB files —
embarrassingly parallel, no shuffle until someone aggregates.

Writer + reader are both here so tests can round-trip: the writer is
also how the demo query synthesizes deterministic WARC bytes from the
documents table (no external data).

Format notes (public spec):
- header lines are ``token: value`` with case-INSENSITIVE field names;
- ``Content-Length`` counts the payload block only (not the trailer);
- records are separated by exactly two CRLFs after the payload;
- response records' payload is an HTTP/1.1 message; its own headers
  end at the first blank line.
Malformed records (bad magic, missing/short payload) are surfaced as
``warc_type='invalid'`` rows rather than crashing the task — the same
quarantine contract as io/payload.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

WARC_RECORD_SCHEMA = (
    "file_id bigint, rec_idx int, rec_offset bigint, warc_type string, "
    "target_uri string, content_length bigint, http_status int, "
    "body binary"
)

_CRLF = b"\r\n"


def build_warc_file(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize (warc_type, target_uri, block_bytes) records into one
    WARC 1.0 file.  Deterministic: no uuids/dates — record ids derive
    from the position (sufficient for a synthetic corpus; a real writer
    stamps urn:uuid and WARC-Date)."""
    out = bytearray()
    for i, (wtype, uri, block) in enumerate(records):
        hdr = [
            b"WARC/1.0",
            b"WARC-Type: " + wtype.encode("ascii"),
            b"WARC-Record-ID: <urn:x-rec:%d>" % i,
        ]
        if uri:
            hdr.append(b"WARC-Target-URI: " + uri.encode("ascii"))
        if wtype == "response":
            hdr.append(b"Content-Type: application/http;msgtype=response")
        hdr.append(b"Content-Length: %d" % len(block))
        out += _CRLF.join(hdr) + _CRLF + _CRLF + block + _CRLF + _CRLF
    return bytes(out)


def build_http_response(body: bytes, status: int = 200,
                        reason: str = "OK") -> bytes:
    """Minimal deterministic HTTP/1.1 response block for a WARC
    response record."""
    return (
        b"HTTP/1.1 %d %s\r\nContent-Type: text/plain\r\n\r\n"
        % (status, reason.encode("ascii"))
        + body
    )


def _parse_warc_bytes(payload: bytes) -> Iterator[tuple]:
    """Yield (rec_idx, rec_offset, warc_type, target_uri,
    content_length, http_status, body) per record; 'invalid' rows for
    malformed regions (parsing stops at the first unrecoverable one,
    since record boundaries are length-derived)."""
    i, n, idx = 0, len(payload), 0
    while i < n:
        # skip stray inter-record CRLFs (lenient readers do)
        while payload.startswith(_CRLF, i):
            i += 2
        if i >= n:
            return
        offset = i
        if not payload.startswith(b"WARC/", i):
            yield (idx, offset, "invalid", None, None, None, None)
            return
        hdr_end = payload.find(_CRLF + _CRLF, i)
        if hdr_end < 0:
            yield (idx, offset, "invalid", None, None, None, None)
            return
        fields: dict[str, str] = {}
        for line in payload[i:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                fields[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("ascii", "replace")
                )
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            clen = -1
        if clen < 0:
            yield (idx, offset, "invalid", None, None, None, None)
            return
        block_start = hdr_end + 4
        if block_start + clen > n:
            yield (idx, offset, "invalid",
                   fields.get("warc-target-uri"), clen, None, None)
            return
        block = payload[block_start:block_start + clen]
        wtype = fields.get("warc-type", "unknown").lower()
        status, body = None, None
        if wtype == "response" and block.startswith(b"HTTP/"):
            status_line, _, rest = block.partition(_CRLF)
            parts = status_line.split(b" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            http_hdr_end = block.find(_CRLF + _CRLF)
            body = block[http_hdr_end + 4:] if http_hdr_end >= 0 else b""
        yield (idx, offset, wtype, fields.get("warc-target-uri"),
               clen, status, body)
        i = block_start + clen
        idx += 1


def parse_warc_records(files: DataFrame, payload_col: str = "warc",
                       id_col: str = "file_id") -> DataFrame:
    """(file_id, payload) → one typed row per WARC record.  One
    mapInPandas pass; Arrow batches of whole files in, record rows
    out."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for rec in _parse_warc_bytes(bytes(payload)):
                    rows.append((int(fid),) + rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "rec_idx", "rec_offset", "warc_type",
                    "target_uri", "content_length", "http_status", "body",
                ],
            )

    return files.mapInPandas(parse, WARC_RECORD_SCHEMA)


# -- demo / oracle face -----------------------------------------------

N_DEMO_FILES = 8
# byte length of the fixed HTTP prefix build_http_response emits:
# 'HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n'
HTTP_PREFIX_LEN = 45


def build_warc_files(docs: DataFrame, n_files: int = N_DEMO_FILES) -> DataFrame:
    """Pack the documents table into ``n_files`` deterministic WARC
    files: (file_id, warc binary).  Each file opens with a warcinfo
    record, then one HTTP-response record per doc in doc_id order —
    applyInPandas keyed by file_id, the write-side mirror of the
    read-side mapInPandas."""
    import pyspark.sql.functions as F

    def assemble(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        recs = [("warcinfo", "", b"software: synthetic-crawler/1.0\r\n")]
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            uri = "https://mirror%d.example.com/doc/%d" % (doc_id % 7, doc_id)
            recs.append(
                ("response", uri, build_http_response(text.encode("utf-8")))
            )
        return pd.DataFrame(
            {"file_id": [int(key[0])], "warc": [build_warc_file(recs)]}
        )

    return (
        docs.select(
            (F.col("doc_id") % n_files).cast("bigint").alias("file_id"),
            "doc_id",
            "text",
        )
        .groupBy("file_id")
        .applyInPandas(assemble, "file_id bigint, warc binary")
    )


def warc_roundtrip_report(docs: DataFrame,
                          n_files: int = N_DEMO_FILES) -> DataFrame:
    """Write→read differential over real WARC bytes: pack the corpus
    into WARC files, parse them back, and verify every document
    round-tripped — (doc_id, file_id, rec_idx, target_uri, http_status,
    content_length, body_len, matched).  ``matched`` compares the
    parsed HTTP body to the source text byte-for-byte; the oracle
    replays the deterministic arithmetic (uri template, fixed HTTP
    prefix length, record order), so a parser bug shows up as a
    hash/count mismatch."""
    import pyspark.sql.functions as F

    recs = parse_warc_records(build_warc_files(docs, n_files=n_files))
    resp = recs.filter(F.col("warc_type") == "response").select(
        F.regexp_extract("target_uri", r"/doc/([0-9]+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        "file_id",
        "rec_idx",
        "target_uri",
        "http_status",
        "content_length",
        F.length("body").cast("bigint").alias("body_len"),
        F.col("body").cast("string").alias("body_text"),
    )
    return (
        resp.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "file_id",
            "rec_idx",
            "target_uri",
            "http_status",
            "content_length",
            "body_len",
            (F.col("body_text") == F.col("text")).cast("int").alias("matched"),
        )
    )
