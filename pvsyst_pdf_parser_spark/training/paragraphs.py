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
    from .dedup import ensure_scan_parallelism

    # chunk strings are built row-locally over the whole corpus — buy
    # full parallelism on a degenerate scan (no-op at real split counts)
    docs = ensure_scan_parallelism(docs)
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


# demo-injection constants (the synthetic corpus is a word salad with
# no natural duplication, so the driver demos plant deterministic
# boilerplate the oracle replays with the same CASE arithmetic).
# SPAN_DEMO_BOILER is exactly 20 tokens = 4 aligned 5-token sentences,
# so prefix injection yields identical cross-doc spans at pos 0 and 1.
SPAN_DEMO_BOILER = (
    "subscribe to our newsletter for updates follow us on social media"
    " all rights reserved privacy policy terms of service apply"
)
LINE_DEMO_BOILER = "click here to read more"  # exactly one 5-token sentence


def inject_prefix(docs: DataFrame, modulus: int, prefix: str) -> DataFrame:
    """Prefix ``prefix + ' '`` onto the text of every doc with
    doc_id % modulus == 0 — prefix injection keeps the k-token sentence
    grid aligned across documents (a suffix would shift with each doc's
    own length)."""
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % modulus == 0,
            F.concat(F.lit(prefix + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )


def _doc_sentences_col(text_col: str, sent_tokens: int):
    """Column: array of ``sent_tokens``-word "sentences" of the
    lowercased text (the synthetic corpus has no punctuation — real
    corpora swap in a ``split(text, '(?<=[.!?])\\s+')``; everything
    downstream only sees the array)."""
    tokens = F.split(F.lower(F.col(text_col)), " ", -1)
    n = F.ceil(F.size(tokens) / F.lit(sent_tokens)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens, i * sent_tokens + 1, sent_tokens)),
    )


def dedup_sentence_spans_report(
    docs: DataFrame, sent_tokens: int = 5, span_sents: int = 3
) -> DataFrame:
    """C4's three-sentence-span dedup (Raffel et al. 2020 §2.2:
    "we discarded all but one of any three-sentence span occurring more
    than once in the data set").  Unlike paragraph dedup the spans
    OVERLAP — a duplicated passage is removed sentence-by-sentence from
    every later copy while both documents survive.

    Shape at 10^12 docs: sentence + span construction is one pure
    projection (array ops over the text column — no explode of raw
    text, no shuffle); the posexplode emits only (doc_id, span_pos,
    span) rows.  ONE span-keyed window (the corpus-wide shuffle — same
    profile as exact dedup on the span key), then the removal set and
    the reassembly ride the doc_id key.  First occurrence by
    (doc_id, span_pos) keeps; the removed span's ``span_sents``
    component sentences are dropped from the later copy.

    Returns (doc_id, n_sents, n_removed, clean_text)."""
    from .dedup import ensure_scan_parallelism

    base = ensure_scan_parallelism(docs).select(
        "doc_id", _doc_sentences_col("text", sent_tokens).alias("sents")
    )
    # span index list 0..n-span_sents (empty when the doc is shorter —
    # sequence(0, negative) would count DOWN, so gate explicitly).
    # r6b note: the ml.feature.NGram form was TRIED here and measured
    # 8x SLOWER (0.55 s → 4.24 s at sf1x): the Scala-UDF boundary pays
    # CatalystTypeConverters string decode/encode over the whole
    # sentence array, which dwarfs this HOF's O(spans·3) element_at
    # work — the opposite trade from the word-shingle sites, whose HOF
    # cost is O(tokens·n) interpreted concat chains.
    span_idx = F.when(
        F.size("sents") >= span_sents,
        F.sequence(F.lit(0), F.size("sents") - span_sents),
    ).otherwise(F.array().cast("array<int>"))
    spans = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                span_idx,
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at("sents", i + j + 1) for j in range(span_sents)],
                ),
            )
        ).alias("span_pos", "span"),
    )
    w = Window.partitionBy("span").orderBy("doc_id", "span_pos")
    removed_spans = spans.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") > 1
    )
    rm = (
        removed_spans.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("span_pos"), F.col("span_pos") + (span_sents - 1)
                )
            ).alias("sidx"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("sidx").alias("rm_idx"))
    )
    joined = base.join(rm, "doc_id", "left").withColumn(
        "rm_idx", F.coalesce("rm_idx", F.array().cast("array<int>"))
    )
    return joined.select(
        "doc_id",
        F.size("sents").cast("bigint").alias("n_sents"),
        F.size("rm_idx").cast("bigint").alias("n_removed"),
        F.array_join(
            F.filter(
                "sents", lambda s, i: ~F.array_contains("rm_idx", i.cast("int"))
            ),
            " ",
        ).alias("clean_text"),
    )


def intradoc_line_dedup_report(
    docs: DataFrame, sent_tokens: int = 5
) -> DataFrame:
    """Within-document repeated-line removal (the RefinedWeb /
    MassiveWeb line-dedup rule: a line repeated inside the SAME page is
    boilerplate — nav bars, cookie banners — and every copy after the
    first is dropped).  Pure projection: array_distinct preserves
    first-occurrence order, so there is NO shuffle at any corpus size —
    the cheapest operator in the cleaning family and the reason it runs
    first in real pipelines.

    Returns (doc_id, n_sents, n_removed, clean_text)."""
    from .dedup import ensure_scan_parallelism

    base = ensure_scan_parallelism(docs).select(
        "doc_id", _doc_sentences_col("text", sent_tokens).alias("sents")
    )
    kept = F.array_distinct("sents")
    return base.select(
        "doc_id",
        F.size("sents").cast("bigint").alias("n_sents"),
        (F.size("sents") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
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


# ---------------------------------------------------------------------------
# jusText-style boilerplate classification
# ---------------------------------------------------------------------------

# tiny function-word list (jusText's signal is the *density* of such
# words; the real tool ships per-language lists — a data file swap)
STOPWORDS = (
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)

# jusText-ish thresholds over the synthetic 10-token paragraphs
SHORT_WORDS = 4          # fewer words -> too short to judge alone
GOOD_RATIO = 0.25        # stopword density of real prose
NEAR_RATIO = 0.10        # gray zone, resolved by context


def boilerplate_paragraph_report(
    docs: DataFrame, para_tokens: int = 10
) -> DataFrame:
    """Context-sensitive paragraph quality classification — the jusText
    algorithm (Pomikálek 2011), the public standard for main-content
    extraction from web pages: classify each paragraph by stopword
    density and length into good / near-good / bad / short, then let
    NEIGHBOR context resolve the gray zone (a near-good or short
    paragraph between good neighbors is prose; between bad neighbors
    it is boilerplate).

    Per paragraph: (doc_id, pos, n_words, stop_ratio, raw_label,
    label).

    Shape at 10^12 docs: paragraph explode + per-paragraph metrics are
    map-side; the context pass is lag/lead over a window keyed by
    doc_id — documents are small, so this window never skews, and the
    whole operator adds ZERO corpus-wide shuffles (the doc_id key is
    the partitioning the corpus already has)."""
    paras = doc_paragraphs(docs, para_tokens=para_tokens)
    words = F.split(F.col("para"), " ", -1)
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda t: t.isin(*STOPWORDS)))
    ratio = F.round(n_stop / n_words, 6)
    raw = (
        F.when(n_words < SHORT_WORDS, "short")
        .when(ratio >= GOOD_RATIO, "good")
        .when(ratio >= NEAR_RATIO, "near")
        .otherwise("bad")
    )
    m = paras.select(
        "doc_id",
        "pos",
        n_words.cast("bigint").alias("n_words"),
        ratio.alias("stop_ratio"),
        raw.alias("raw_label"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("raw_label").over(w)
    nxt = F.lead("raw_label").over(w)
    resolved = (
        F.when(F.col("raw_label").isin("good", "bad"), F.col("raw_label"))
        # gray zone: good if EITHER neighbor is good (edge paragraphs
        # have one neighbor; a lone gray paragraph stays boilerplate)
        .when((prev == "good") | (nxt == "good"), "good")
        .otherwise("bad")
    )
    return m.select(
        "doc_id", "pos", "n_words", "stop_ratio", "raw_label",
        resolved.alias("label"),
    )
