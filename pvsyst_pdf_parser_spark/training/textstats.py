"""Text analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.

All pure column expressions built from functions with exact DuckDB
equivalents (length/replace/split arithmetic, md5) so the oracles match
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import md5_56

EN_MARKERS = [" the ", " and ", " a "]


def _count_occurrences(col, needle: str):
    """(len(s) - len(replace(s, needle, ''))) / len(needle) — portable."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def token_count_stats(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish unit estimate (chars/4) per source."""
    tokens = F.size(F.split(F.col("text"), r" ", -1))
    bpe_est = F.ceil(F.length("text") / 4).cast("bigint")
    return (
        docs.select("source", tokens.alias("n_tokens"), bpe_est.alias("n_bpe"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 3).alias("avg_tokens"),
            F.sum("n_bpe").alias("total_bpe_est"),
        )
    )


def lang_id_heuristic(docs: DataFrame) -> DataFrame:
    """English-marker stopword ratio vs the table's lang label."""
    text = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    en_hits = sum(_count_occurrences(text, m) for m in EN_MARKERS)
    tokens = F.size(F.split(F.col("text"), r" ", -1))
    scored = docs.select(
        "doc_id",
        "lang",
        en_hits.alias("en_hits"),
        tokens.alias("n_tokens"),
    ).withColumn(
        "guess_en",
        (F.col("en_hits") * 20 >= F.col("n_tokens")).cast("int"),
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("guess_en").alias("n_guessed_en"),
        F.round(F.avg(F.col("en_hits") / F.col("n_tokens")), 4).alias(
            "avg_marker_ratio"
        ),
    )


def quality_scores(docs: DataFrame, sample_mod: int = 20) -> DataFrame:
    """Length/stopword/uppercase composite quality score per document."""
    text = F.col("text")
    n_chars = F.length(text)
    tokens = F.size(F.split(text, r" ", -1))
    spaced = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = sum(_count_occurrences(spaced, m) for m in EN_MARKERS)
    len_score = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    stop_score = F.least(F.lit(1.0), stop_hits * F.lit(10.0) / tokens)
    word_len_score = F.least(F.lit(1.0), (n_chars / tokens) / F.lit(8.0))
    return docs.filter(F.col("doc_id") % sample_mod == 0).select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        tokens.alias("n_tokens"),
        F.round(
            F.lit(0.4) * len_score + F.lit(0.3) * stop_score
            + F.lit(0.3) * word_len_score,
            4,
        ).alias("quality_score"),
    )


def doc_fingerprints(docs: DataFrame, sample_mod: int = 25) -> DataFrame:
    """56-bit fingerprint of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return docs.filter(F.col("doc_id") % sample_mod == 0).select(
        "doc_id", md5_56(norm).alias("fingerprint")
    )
