"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The HEADER decode is real: :func:`parse_image_header` reads image
dimensions/format straight from the public file-format specs (PNG IHDR,
JPEG SOFn marker walk, GIF logical-screen descriptor) in pure Python —
no codec library needed.  Full pixel decode (which WOULD need
PIL/pyav, absent in this container) remains a deterministic stub
reachable only for payloads that are not image headers; the Spark-side
plumbing — binary column handling, Arrow batch shape through
``mapInPandas``, typed metadata schema, partition-friendly projection —
is identical for both and unchanged when a real pixel decoder is
plugged in via ``decode_fn``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# JPEG SOFn markers carrying frame dimensions — all of 0xC0-0xCF except
# DHT (C4), JPG (C8) and DAC (CC), per ITU-T T.81 table B.1
_JPEG_NON_SOF = (0xC4, 0xC8, 0xCC)


def parse_image_header(payload: bytes) -> tuple[int, int, int, str] | None:
    """(width, height, n_frames, codec) parsed from raw bytes using the
    public file-format specs, or None when the payload is not a
    recognizable image:

    - PNG (RFC 2083): 8-byte magic, first chunk must be IHDR; width and
      height are big-endian u32 at offsets 16 and 20.
    - JPEG (ITU-T T.81): SOI then a marker walk — standalone markers
      (TEM, RSTn) have no length field, every other segment carries a
      big-endian u16 length; the first SOFn segment holds height then
      width as big-endian u16 after the precision byte.
    - GIF (GIF87a/89a spec): 6-byte signature, then the logical screen
      descriptor's LITTLE-endian u16 width and height.

    Pure Python over a bytes object — runs inside the Arrow-batched
    ``mapInPandas`` loop, no codec import anywhere."""
    if (
        payload.startswith(PNG_MAGIC)
        and len(payload) >= 24
        and payload[12:16] == b"IHDR"
    ):
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return (w, h, 1, "image/png")
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            # ITU-T T.81 §B.1.1.2: any number of 0xFF FILL bytes may
            # precede a marker code.  Without this skip a fill byte
            # reads as marker==0xFF, falls into the segment-length
            # branch and walks garbage (ADVICE r4).
            while i + 1 < n and payload[i + 1] == 0xFF:
                i += 1
            if i + 4 > n:
                return None
            marker = payload[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                if i + 9 > n:
                    return None
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return (w, h, 1, "image/jpeg")
            i += 2 + seg_len
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return (w, h, 1, "image/gif")
    return None


def _stub_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake of a full media decode, used only for payloads
    that are not parseable image headers (e.g. the text-as-blob demo
    table, video containers).  A real pixel/frame decode would need
    PIL/pyav — plug one in via ``decode_fn``.
    """
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 7 + 1, f"stub/{n % 3}")


def decode_auto(payload: bytes) -> tuple[int, int, int, str]:
    """Default decode: real header parse first, stub fallback."""
    return parse_image_header(payload) or _stub_decode(payload)


def real_decode(payload: bytes):  # pragma: no cover - documentation stub
    raise NotImplementedError(
        "full pixel/frame decode requires PIL/av which are not installed "
        "in this container; header-level metadata comes from "
        "parse_image_header, everything else from _stub_decode"
    )


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Demo: treat the utf-8 encoding of text as the opaque media blob."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("media")
    )


def make_image_bytes(doc_id: int) -> bytes:
    """Deterministic REAL image-header bytes for doc_id: rotates
    PNG / JPEG / GIF by ``doc_id % 3``, dimensions
    (doc_id % 640 + 1) × (doc_id % 480 + 1) — the fixture generator for
    the header-parse oracle (the parser must read these numbers back
    from the actual encoded header fields, big-endian for PNG/JPEG,
    little-endian for GIF)."""
    w = doc_id % 640 + 1
    h = doc_id % 480 + 1
    fmt = doc_id % 3
    if fmt == 0:  # PNG: magic + IHDR chunk (len, type, 13 data, crc) = 33 B
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
        return PNG_MAGIC + (13).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00" * 4
    if fmt == 1:  # JPEG: SOI + SOF0(len 11, 1 component) + EOI = 17 B
        sof = (
            b"\xff\xc0"
            + (11).to_bytes(2, "big")
            + bytes([8])
            + h.to_bytes(2, "big")
            + w.to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0])
        )
        return b"\xff\xd8" + sof + b"\xff\xd9"
    # GIF89a: signature + little-endian logical screen descriptor = 13 B
    return (
        b"GIF89a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0, 0, 0])
    )


def attach_image_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, media): deterministic real image-header payloads (see
    :func:`make_image_bytes`) — the image-typed face of the binary
    column for exercising the real header parser end-to-end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [make_image_bytes(int(i)) for i in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, "doc_id long, media binary")


def media_metadata(src: DataFrame, decode_fn=None) -> DataFrame:
    """(doc_id, media binary) → typed metadata via Arrow-batched
    mapInPandas.

    ``decode_fn(payload: bytes) -> (width, height, n_frames, codec)`` is
    the pluggable decode hook: a cluster with codecs installed passes
    e.g. a PIL/pyav-backed callable and the Spark-side plumbing (Arrow
    batching, schema, partitioning) is unchanged.  Defaults to
    :func:`decode_auto` — REAL public-spec header parsing for PNG/JPEG/
    GIF payloads, deterministic stub for everything else.  The callable
    must be picklable (module-level function, not a lambda closing over
    unpicklable state)."""
    decode_one = decode_fn or decode_auto

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lens, ws, hs, fs, cs = [], [], [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob) if blob is not None else b""
                w, h, nf, codec = decode_one(blob)
                ids.append(doc_id)
                lens.append(len(blob))
                ws.append(w)
                hs.append(h)
                fs.append(nf)
                cs.append(codec)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "byte_len": lens,
                    "width": ws,
                    "height": hs,
                    "n_frames": fs,
                    "codec": cs,
                }
            )

    return src.mapInPandas(decode, MEDIA_META_SCHEMA)


def extract_media_metadata(docs: DataFrame, decode_fn=None) -> DataFrame:
    """documents table (text-as-blob demo payloads) → typed metadata.
    Kept as the stable public entrypoint; see :func:`media_metadata`
    for the payload-agnostic core."""
    return media_metadata(attach_binary_payload(docs), decode_fn=decode_fn)


def image_header_metadata(docs: DataFrame) -> DataFrame:
    """Real end-to-end header decode: deterministic PNG/JPEG/GIF
    payloads (:func:`attach_image_payload`) parsed back by
    :func:`parse_image_header` inside the Arrow batch loop — dimensions
    come out of the actual encoded header fields, never the stub."""
    return media_metadata(attach_image_payload(docs))


def sample_frames(docs: DataFrame, k: int = 4) -> DataFrame:
    """(doc_id, frame_idx, frame_fingerprint): k evenly spaced frame
    indices per media blob — floor(i·n_frames/k), deduplicated, so a
    clip shorter than k frames yields fewer rows — with a deterministic
    stub fingerprint (portable md5 of the doc/frame/byte coordinates,
    the stand-in for hashing decoded frame bytes; swap the decode hook
    in :func:`extract_media_metadata` AND this fingerprint on a cluster
    with codecs).  All relational after the metadata stage: explode of
    a k-literal sequence + projection, no per-frame Python."""
    from .hashing import md5_56

    meta = extract_media_metadata(docs)
    return (
        meta.select(
            "doc_id",
            "byte_len",
            "n_frames",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        )
        .select(
            "doc_id",
            "byte_len",
            F.floor(F.col("i") * F.col("n_frames") / k).cast("int").alias(
                "frame_idx"
            ),
        )
        .distinct()
        .select(
            "doc_id",
            "frame_idx",
            md5_56(
                F.concat_ws("_", "doc_id", "frame_idx", "byte_len")
            ).alias("frame_fingerprint"),
        )
    )
