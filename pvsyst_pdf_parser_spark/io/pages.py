"""Decode stage (reference S1/S2): pages table → per-page text rows.

The throughput-dominant operator.  One Arrow-batched ``mapInPandas``
pass per input partition decodes each payload (PDF text layer via the
container/pdfplumber, HTML via density boilerplate-strip, pre-extracted
text passthrough) and fans out per-page rows — a 1→N UDTF-shaped map,
CPU-bound and skewed by document size.

Scale design: the input is repartitioned on hash(url) with a salt-width
chosen so each task holds a bounded byte budget; Arrow batch size is
capped in session conf (maxRecordsPerBatch) so one multi-hundred-page
PDF cannot blow the Python-worker heap.  Decode errors never fail the
job — they surface as status='error' rows feeding the run manifest.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import payload as P
from .htmlstrip import extract_main_text

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_no", T.IntegerType()),
        T.StructField("full_text", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)


def _decode_one(payload: bytes | None, text: str | None) -> tuple[str, str, list[str]]:
    kind = P.sniff_kind(payload, text)
    if kind == P.KIND_PDF:
        return kind, "ok", P.decode_pages(payload)
    if kind == P.KIND_HTML:
        return kind, "ok", [extract_main_text(payload)]
    if kind == P.KIND_TEXT:
        return kind, "ok", [text or ""]
    return kind, "error:unknown-payload", []


def decode_pages_df(pages_table: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """pages(url, html, text, ...) → (url, page_no, full_text, kind, status).

    page_no is 1-based, matching the reference's enumerate(start=1)
    (pvsyst_parser.py:95).
    """
    src = pages_table.select("url", "html", "text")
    if num_partitions:
        # hash-partition by url: uniform doc spread (byte skew bounded by
        # the Arrow batch cap + several-partitions-per-core), and — key
        # plan property — downstream groupBy/window/join on url all
        # satisfy their ClusteredDistribution from THIS exchange.
        # (repartition on xxhash64(url) would have the same distribution
        # but a partitioning expression Catalyst can't reuse: measured
        # 135 exchanges vs ~10.)
        src = src.repartition(num_partitions, F.col("url"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, page_nos, texts, kinds, statuses = [], [], [], [], []
            for url, payload, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                if isinstance(payload, float):  # pandas NaN for null binary
                    payload = None
                try:
                    kind, status, pages = _decode_one(payload, text)
                except Exception as exc:  # noqa: BLE001 - quarantine, don't fail the job
                    kind, status, pages = P.KIND_UNKNOWN, f"error:{exc!r:.200}", []
                if not pages:
                    urls.append(url)
                    page_nos.append(0)
                    texts.append("")
                    kinds.append(kind)
                    statuses.append(status)
                for i, page_text in enumerate(pages, start=1):
                    urls.append(url)
                    page_nos.append(i)
                    texts.append(page_text)
                    kinds.append(kind)
                    statuses.append(status)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "page_no": page_nos,
                    "full_text": texts,
                    "kind": kinds,
                    "status": statuses,
                }
            )

    return src.mapInPandas(decode, PAGE_SCHEMA)


def page_kv_pairs(page_df: DataFrame) -> DataFrame:
    """Reference S2 line classifier as a projection: first-':' split;
    lines starting with ':' or with an empty key stay text lines
    (pvsyst_parser.py:101-107).  Returns (url, page_no, line_no, key,
    value, is_kv)."""
    lines = page_df.select(
        "url",
        "page_no",
        F.posexplode(F.split("full_text", "\n")).alias("line_no", "raw"),
    ).filter(F.trim("raw") != "")
    line = F.col("raw")
    sep = F.instr(line, ":")
    key = F.trim(F.substring_index(line, ":", 1))
    value = F.trim(F.expr("substring(raw, instr(raw, ':') + 1)"))
    is_kv = (sep > 0) & ~F.trim(line).startswith(":") & (key != "")
    return lines.select(
        "url",
        "page_no",
        "line_no",
        F.when(is_kv, key).alias("key"),
        F.when(is_kv, value).alias("value"),
        is_kv.alias("is_kv"),
        F.when(~is_kv, F.trim(line)).alias("text_line"),
    )


def doc_frame(page_df: DataFrame, with_combined: bool = True) -> DataFrame:
    """Concatenated document text, built once per url (the reference
    rebuilds it 5×, pvsyst_parser.py:123-125 etc. — manual CSE).  The
    groupBy is the single wide exchange of raw page text; the
    array-marker page span (reference A1, :1027-1049) is fused into the
    same aggregation as array ops — one shuffle instead of two."""
    from ..arrays.blocks import PAGE_MARKERS

    src = page_df.filter(F.col("status") == "ok")
    if with_combined:
        src = src.withColumn("is_arr", F.col("full_text").rlike(PAGE_MARKERS))
    else:
        src = src.withColumn("is_arr", F.lit(False))

    ordered = F.array_sort(
        F.collect_list(F.struct("page_no", "full_text", "is_arr"))
    )
    grouped = src.groupBy("url").agg(
        ordered.alias("doc_pages"),
        F.count("*").alias("n_pages"),
        F.max("kind").alias("kind"),
    )
    pages_col = F.col("doc_pages")
    marker_pages = F.transform(
        F.filter(pages_col, lambda s: s["is_arr"]), lambda s: s["page_no"]
    )
    p0 = F.array_min(marker_pages)
    p1 = F.array_max(marker_pages)
    combined = F.when(
        p0.isNotNull(),
        F.concat_ws(
            "\n",
            F.transform(
                F.filter(
                    pages_col,
                    lambda s: (s["page_no"] >= p0) & (s["page_no"] <= p1),
                ),
                lambda s: s["full_text"],
            ),
        ),
    )
    out = grouped.select(
        "url",
        F.concat_ws("\n", F.transform(pages_col, lambda s: s["full_text"])).alias(
            "doc_text"
        ),
        combined.alias("combined_text") if with_combined else F.lit(None)
        .cast("string")
        .alias("combined_text"),
        "n_pages",
        "kind",
    )
    return out
