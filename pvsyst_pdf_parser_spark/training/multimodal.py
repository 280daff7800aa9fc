"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container,
so the decode step is a clearly-marked deterministic stub — but the
Spark-side plumbing is real and tested: binary column handling, Arrow
batch shape through ``mapInPandas``, typed metadata schema, and
partition-friendly projection.  Swap ``_stub_decode`` for a real
PIL/ffmpeg call on a cluster with the codecs installed.
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


def _stub_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake of an image/video header parse.

    Real implementation would be e.g. ``PIL.Image.open(BytesIO(b)).size``
    — raise if someone expects real decode semantics here.
    """
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, n % 7 + 1, f"stub/{n % 3}")


def real_decode(payload: bytes):  # pragma: no cover - documentation stub
    raise NotImplementedError(
        "media decode requires PIL/av which are not installed in this "
        "container; the pipeline plumbing uses _stub_decode"
    )


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Demo: treat the utf-8 encoding of text as the opaque media blob."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("media")
    )


def extract_media_metadata(docs: DataFrame, decode_fn=None) -> DataFrame:
    """binary column → typed metadata via Arrow-batched mapInPandas.

    ``decode_fn(payload: bytes) -> (width, height, n_frames, codec)`` is
    the pluggable decode hook: a cluster with codecs installed passes
    e.g. a PIL/pyav-backed callable and the Spark-side plumbing (Arrow
    batching, schema, partitioning) is unchanged.  Defaults to the
    deterministic :func:`_stub_decode` in this codec-less sandbox.  The
    callable must be picklable (module-level function, not a lambda
    closing over unpicklable state)."""
    src = attach_binary_payload(docs)
    decode_one = decode_fn or _stub_decode

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
