"""Paragraph-level deduplication — CCNet's unit of dedup (Wenzek 2020:
hash each paragraph, drop paragraphs already seen anywhere in the
corpus)
and the Gopher/MassiveWeb "repeated passage" removal.  Document-level
dedup misses boilerplate that rides inside otherwise-unique pages
(nav text, license blocks, quoted headers); paragraph-level removes
the passage and KEEPS the document.

Shape at 10^12 docs: explode paragraphs (map-side, no shuffle), ONE
window keyed by the paragraph text — identical shuffle profile to
exact document dedup, just on a finer key with ~10-50x the rows —
then a per-doc re-aggregation that rides the doc_id key.  First
occurrence (lowest doc_id, then position) survives; every later copy
is dropped.  No self-join, no driver state.

The synthetic corpus has no newline structure, so the demo derives
paragraphs as fixed ``para_tokens``-word chunks — the operator itself
takes any (doc_id, pos, para) frame, e.g. a real corpus's
split(text, '\\n\\n') explode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def doc_paragraphs(
    docs: DataFrame, para_tokens: int = 10, text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, para): consecutive ``para_tokens``-word chunks of
    the lowercased text, pos 0-based.  The final chunk keeps its
    natural (shorter) length."""
    tokens = F.split(F.lower(F.col(text_col)), " ", -1)
    n_chunks = F.ceil(F.size(tokens) / F.lit(para_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(tokens, i * para_tokens + 1, para_tokens)
        ),
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("pos", "para")
    )


def dedup_paragraphs_report(
    docs: DataFrame, para_tokens: int = 10
) -> DataFrame:
    """Corpus-wide paragraph dedup verdict per document: (doc_id,
    n_paras, n_kept, clean_text) where clean_text is the document with
    every previously-seen paragraph removed (first occurrence by
    (doc_id, pos) wins — the deterministic CCNet keep rule).

    Plan: one paragraph window (the only corpus-wide shuffle) + one
    per-doc aggregate; reassembly is an order-stable array sort inside
    the aggregate, not a second window."""
    paras = doc_paragraphs(docs, para_tokens=para_tokens)
    w = Window.partitionBy("para").orderBy("doc_id", "pos")
    flagged = paras.withColumn(
        "keep", (F.row_number().over(w) == 1).cast("int")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum("keep").cast("bigint").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep") == 1, F.struct("pos", "para")
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def paragraph_dedup_stats(docs: DataFrame, para_tokens: int = 10) -> DataFrame:
    """Per-source damage report of paragraph dedup: (source, n_docs,
    n_paras, n_dropped, drop_rate, n_docs_touched) — what an operator
    reads before committing the pass."""
    per_doc = dedup_paragraphs_report(docs, para_tokens=para_tokens)
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_paras").cast("bigint").alias("n_paras"),
            F.sum(F.col("n_paras") - F.col("n_kept"))
            .cast("bigint")
            .alias("n_dropped"),
            F.round(
                F.sum(F.col("n_paras") - F.col("n_kept")) / F.sum("n_paras"), 4
            ).alias("drop_rate"),
            F.sum((F.col("n_kept") < F.col("n_paras")).cast("int"))
            .cast("bigint")
            .alias("n_docs_touched"),
        )
    )
