"""Corpus quality calibration and drift monitoring.

Production steps a web-corpus pipeline runs AROUND the per-doc
quality scores (textstats.py) rather than inside them:

- ``quality_threshold_by_lang`` — per-language calibrated quality
  cutoffs.  A single global cutoff biases against languages whose
  score distribution sits lower (public practice: CCNet, Wenzek 2020,
  buckets per language; FineWeb, Penedo 2024, re-tunes filter
  thresholds per language because "the same threshold removes 8% of
  English and 90% of some other languages").  The cutoff here is the
  exact q-th order statistic per language so the DuckDB oracle matches
  value-for-value; at 10^12 docs swap the row_number window for
  ``percentile_approx`` (one pass, mergeable sketches, no global sort)
  — the same documented exact→sketch swap as
  textstats.length_percentile_stats.

- ``ccnet_perplexity_buckets`` — per-language head/middle/tail
  perplexity terciles, the tiered-corpus artifact CCNet actually
  publishes (Wenzek 2020 §4.3).

- ``quality_drift_psi`` — Population Stability Index between two
  snapshots' score distributions (the standard production drift gate:
  PSI = Σ (p_cur − p_ref)·ln(p_cur / p_ref) over fixed score bins;
  rule-of-thumb alarms at 0.1/0.25).  A crawl pipeline runs this
  between consecutive dumps to catch a scraper or filter regression
  before it poisons a training mix.  Fixed bin edges (10 × 0.1 over
  [0,1]) keep it one low-cardinality groupBy: map-side combine
  reduces 10^12 rows to 10 per task, so there is no hot-key problem
  and the only shuffle moves ~10 rows per partition.

Both reuse the v1 composite quality score (textstats.quality_scores)
so the score definition stays single-sourced across the funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import EN_MARKERS, _count_occurrences


def quality_score_q4(text=None):
    """The v1 composite quality score rounded to 4 decimals — the
    shared per-doc score column for calibration/drift (same formula as
    textstats.quality_scores, which keeps raw precision for its own
    output).  Rounding first makes every downstream comparison
    (ordering, >= cutoff, binning) engine-exact between Spark and
    DuckDB."""
    text = F.col("text") if text is None else text
    n_chars = F.length(text)
    tokens = F.size(F.split(text, r" ", -1))
    spaced = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = sum(_count_occurrences(spaced, m) for m in EN_MARKERS)
    len_score = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    stop_score = F.least(F.lit(1.0), stop_hits * F.lit(10.0) / tokens)
    word_len_score = F.least(F.lit(1.0), (n_chars / tokens) / F.lit(8.0))
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.3) * stop_score
        + F.lit(0.3) * word_len_score,
        4,
    )


def quality_threshold_by_lang(docs: DataFrame, q: float = 0.3) -> DataFrame:
    """Per-language quality cutoff at the q-th order statistic, plus
    the keep stats that cutoff implies.

    Returns one row per language:
    ``(lang, n_docs, cutoff, n_kept, kept_frac)`` where ``cutoff`` is
    the score at ascending rank ceil(q·n) (ties broken by doc_id) and
    a doc is kept when ``score >= cutoff`` — i.e. roughly the bottom
    q-fraction per language is dropped, *per that language's own
    distribution*, not a global one.

    Scale note: the row_number window is a per-language sort chosen
    for exact oracle parity.  At real corpus size use
    ``percentile_approx(score, q)`` grouped by lang (single pass,
    mergeable, no sort) and broadcast the ~100-row cutoff table back —
    the join below is already broadcast-shaped.
    """
    scored = docs.select("doc_id", "lang", quality_score_q4().alias("q4"))
    w = Window.partitionBy("lang").orderBy("q4", "doc_id")
    ranked = scored.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("lang"))
    )
    cutoffs = ranked.filter(
        F.col("rn") == F.ceil(F.lit(float(q)) * F.col("n"))
    ).select("lang", F.col("q4").alias("cutoff"))
    kept = F.col("q4") >= F.col("cutoff")
    return (
        scored.join(F.broadcast(cutoffs), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("cutoff").alias("cutoff"),
            F.sum(kept.cast("int")).alias("n_kept"),
            F.round(
                F.sum(kept.cast("int")) / F.count(F.lit(1)), 4
            ).alias("kept_frac"),
        )
    )


def ccnet_perplexity_buckets(docs: DataFrame, sample_mod: int = 2) -> DataFrame:
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3):
    within each language, split documents into perplexity terciles —
    ``head`` = most fluent third (lowest mean NLL), ``middle``,
    ``tail`` = least fluent.  CCNet ships the three buckets as separate
    corpus tiers so downstream consumers choose their quality/volume
    trade; bucketing PER LANGUAGE is the point (a global cut would put
    whole low-resource languages in the tail).

    Reuses :func:`textstats.unigram_logprob_scores` as the perplexity
    proxy with ``lang`` riding through its doc-keyed aggregation — no
    extra join against the corpus.  Returns one row per
    ``(lang, bucket)``: ``(lang, bucket, n_docs, min_nll, max_nll)``.

    Scale note: ``ntile`` is a per-language sort window, exactly like
    :func:`quality_threshold_by_lang`'s order statistic — chosen for
    bit-exact oracle parity.  At 10^12 docs swap it for two
    ``percentile_approx(avg_nll, [1/3, 2/3])`` cutoffs per language
    broadcast back (CCNet itself computes the cutoffs on a sample and
    streams the assignment)."""
    from .textstats import unigram_logprob_scores

    scored = unigram_logprob_scores(docs, sample_mod=sample_mod, carry=("lang",))
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    b = scored.withColumn(
        "bucket", F.element_at(names, F.ntile(3).over(w))
    )
    return b.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("avg_nll").alias("min_nll"),
        F.max("avg_nll").alias("max_nll"),
    )


def quality_drift_psi(docs: DataFrame, n_bins: int = 10) -> DataFrame:
    """PSI between the quality-score distributions of two snapshot
    halves (ref = even doc_id, cur = odd — the deterministic stand-in
    for 'previous dump' vs 'this dump'; callers with a real snapshot
    column pass pre-split frames through the same binning).

    One row per occupied score bin:
    ``(bin, n_ref, n_cur, p_ref, p_cur, psi_term, psi_total)``.
    Laplace-smoothed proportions p = (count + 1)/(total + n_bins) keep
    ln() finite when a bin is empty on one side.  ``psi_total`` (the
    alarm number — >0.25 means the distribution moved materially) is
    repeated on every row so the result is a single self-contained
    frame.
    """
    scored = docs.select(
        quality_score_q4().alias("q4"),
        (F.col("doc_id") % 2 == 0).alias("is_ref"),
    )
    binned = scored.select(
        F.least(
            F.lit(n_bins - 1), F.floor(F.col("q4") * n_bins)
        ).cast("int").alias("bin"),
        "is_ref",
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.col("is_ref").cast("int")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("int")).alias("n_cur"),
    )
    tot = Window.partitionBy()
    p_ref = (F.col("n_ref") + 1) / (F.sum("n_ref").over(tot) + n_bins)
    p_cur = (F.col("n_cur") + 1) / (F.sum("n_cur").over(tot) + n_bins)
    term = F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 4)
    out = counts.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p_ref, 4).alias("p_ref"),
        F.round(p_cur, 4).alias("p_cur"),
        term.alias("psi_term"),
    )
    return out.withColumn(
        "psi_total", F.round(F.sum("psi_term").over(tot), 4)
    )
