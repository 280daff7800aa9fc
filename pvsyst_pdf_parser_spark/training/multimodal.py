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


def extract_media_metadata(docs: DataFrame) -> DataFrame:
    """binary column → typed metadata via Arrow-batched mapInPandas."""
    src = attach_binary_payload(docs)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lens, ws, hs, fs, cs = [], [], [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob) if blob is not None else b""
                w, h, nf, codec = _stub_decode(blob)
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
