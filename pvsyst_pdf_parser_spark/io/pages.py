"""Decode stage (reference S1/S2): pages table → per-page text rows.

The throughput-dominant operator.  One Arrow-batched ``mapInPandas``
pass per input partition decodes each payload (PDF text layer via the
container/pdfplumber, HTML via density boilerplate-strip, pre-extracted
text passthrough) and fans out per-page rows — a 1→N UDTF-shaped map,
CPU-bound and skewed by document size.

Scale design: by default the input is repartitioned on hash(url)
(uniform in doc COUNT; reused by every downstream url-keyed exchange).
``pack_by_bytes=True`` adds size-aware packing for byte-skewed corpora:
the top ``4×num_partitions`` documents by payload size are placed
round-robin in size-rank order onto distinct partitions (so two giant
PDFs never share a task), the bulk stays uniform url-hash — see
``pack_partitions_by_bytes``.  A per-document decode is indivisible, so
the floor is max(total/n, largest_doc); packing removes the
multiple-giants-in-one-task tail that url-hash placement leaves.
Arrow batch size is capped in session conf (maxRecordsPerBatch) so one
multi-hundred-page PDF cannot blow the Python-worker heap.  Decode
errors never fail the job — they surface as status='error' rows feeding
the run manifest.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
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


def _hash_slot_table(spark, n: int) -> dict[int, int]:
    """For each target partition i < n, a small int s_i with
    pmod(murmur3(s_i), n) == i — so ``repartition(n, slot_col)`` places
    a row EXACTLY where we choose (DataFrame-level hash partitioning
    offers no identity partitioner; pre-inverting the hash does the
    same job).  One tiny Spark job; n rows to the driver."""
    probes = max(64 * n, 4096)
    rows = (
        spark.range(0, probes)
        .select(
            F.col("id").cast("int").alias("s"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
        )
        .groupBy("p")
        .agg(F.min("s").alias("s"))
        .collect()
    )
    slots = {int(r["p"]): int(r["s"]) for r in rows}
    if len(slots) < n:  # pragma: no cover - ~impossible at 64n probes
        raise ValueError(f"hash slot probe exhausted: {len(slots)}/{n}")
    return slots


def pack_partitions_by_bytes(src: DataFrame, n: int) -> DataFrame:
    """Size-aware decode packing (the straggler guard for byte-skewed
    corpora).

    - top ``4n`` documents by payload bytes ("giants") are assigned
      partitions round-robin in size-rank order — the k largest docs
      land on k distinct partitions, so no task carries two giants;
      the top-k selection is a distributed TakeOrdered (orderBy+limit),
      and the rank window runs over ≤ 4n metadata rows — bounded, not
      a full-corpus single-partition funnel;
    - every other document keeps uniform hash placement on url;
    - exact placement goes through the hash-slot table (above), one
      shuffle total for the payload bytes.
    """
    spark = src.sparkSession
    slots = _hash_slot_table(spark, n)
    slot_df = spark.createDataFrame(
        [(i, s) for i, s in slots.items()], "idx int, slot int"
    )
    bytes_col = (
        F.coalesce(F.octet_length("html"), F.lit(0))
        + F.coalesce(F.length("text"), F.lit(0))
    )
    slim = src.select("url", bytes_col.alias("_bytes"))
    giants = slim.orderBy(F.desc("_bytes"), "url").limit(4 * n)
    w = Window.orderBy(F.desc("_bytes"), "url")  # ≤ 4n rows — bounded
    giant_pk = (
        giants.withColumn("idx", F.pmod(F.row_number().over(w) - 1, F.lit(n)))
        .join(F.broadcast(slot_df), "idx")
        .select("url", F.col("slot").alias("_gslot"))
    )
    bulk_idx = F.pmod(F.xxhash64("url"), F.lit(n)).cast("int")
    return (
        src.join(F.broadcast(giant_pk), "url", "left")
        .withColumn("idx", bulk_idx)
        .join(F.broadcast(slot_df), "idx")
        .withColumn("_pk", F.coalesce("_gslot", "slot"))
        .repartition(n, F.col("_pk"))
        .drop("_gslot", "slot", "idx", "_pk")
    )


def decode_pages_df(
    pages_table: DataFrame,
    num_partitions: int | None = None,
    pack_by_bytes: bool = False,
) -> DataFrame:
    """pages(url, html, text, ...) → (url, page_no, full_text, kind, status).

    page_no is 1-based, matching the reference's enumerate(start=1)
    (pvsyst_parser.py:95).
    """
    src = pages_table.select("url", "html", "text")
    if num_partitions and pack_by_bytes:
        src = pack_partitions_by_bytes(src, num_partitions)
    elif num_partitions:
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
    from ..text.uws import split_lines, utrim

    lines = page_df.select(
        "url",
        "page_no",
        F.posexplode(split_lines("full_text")).alias("line_no", "raw"),
    ).filter(utrim("raw") != "")
    line = F.col("raw")
    sep = F.instr(line, ":")
    key = utrim(F.substring_index(line, ":", 1))
    value = utrim(F.expr("substring(raw, instr(raw, ':') + 1)"))
    is_kv = (sep > 0) & ~utrim(line).startswith(":") & (key != "")
    return lines.select(
        "url",
        "page_no",
        "line_no",
        F.when(is_kv, key).alias("key"),
        F.when(is_kv, value).alias("value"),
        is_kv.alias("is_kv"),
        F.when(~is_kv, utrim(line)).alias("text_line"),
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
