"""End-to-end training-corpus build: the composed decision a cleaning
run executes — gate → near-dup dedup → token-budget mix — as ONE
pipeline over ONE scan of the documents table.

This is the composition proof for the individual operators
(textstats.funnel_flags, dedup.dedup_keepers,
sampling.token_budget_sample_stats): the same gates, the same keeper
rule, the same budget cursor, but sharing work instead of re-scanning —
the flag projection + exact-dup window run once (persisted fan-out
root), the near-dup shingle pipeline reads the GATED survivors from
that cached frame (cheaper than dedup over the raw corpus, and the
order quality-filter-then-dedup is the public-practice pipeline shape:
C4 / Gopher filter first, MinHash-dedup what survives), and the budget
cursor walks only the kept set.

Plan shape at 10^12 docs: one parquet scan, one text-keyed window
(exact dup), the bounded shingle self-join of ngram_jaccard_pairs over
the sampled survivors, one source-keyed window (budget), two small
per-source aggregates joined at the end.  Skewed-source caveats of the
budget window are inherited from sampling.token_budget_sample_stats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .cache import persist_tracked
from .dedup import dedup_keepers
from .hashing import md5_56
from .textstats import funnel_flags


def corpus_build_report(
    docs: DataFrame,
    budget_tokens: int = 2000,
    threshold: float = 0.02,
    sample_mod: int = 5,
) -> DataFrame:
    """Per-source corpus-build report: (source, n_docs, n_gated,
    n_neardup_dropped, n_kept, n_selected, tokens_selected, kept_rate).

    - ``n_gated``: survivors of all three funnel gates (lang, quality,
      exact-dup first copy).
    - ``n_neardup_dropped``: gated docs dropped by the near-dup keeper
      rule (longest text per transitive Jaccard cluster wins; only the
      deterministic ``doc_id % sample_mod`` stratum is candidate-
      checked, same contract as dedup_keepers' demo oracle).
    - ``n_selected`` / ``tokens_selected``: deterministic token-budget
      prefix (md5 order) over the KEPT set per source.

    The funnel-flag frame is persisted once and fans out to the gate
    aggregate, the shingle pipeline, and the budget cursor — the plan
    gate in tests/test_plans.py asserts the documents scan happens
    once."""
    flagged = persist_tracked(funnel_flags(docs))
    gated = flagged.filter(
        (F.col("pass_lang") == 1)
        & (F.col("pass_quality") == 1)
        & (F.col("first_copy") == 1)
    ).select("doc_id", "source", "text", "n_tokens")

    per_source = flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (
                (F.col("pass_lang") == 1)
                & (F.col("pass_quality") == 1)
                & (F.col("first_copy") == 1)
            ).cast("int")
        ).alias("n_gated"),
    )

    drops = dedup_keepers(
        gated, threshold=threshold, sample_mod=sample_mod
    ).filter(F.col("keep") == 0).select("doc_id")
    kept = gated.join(drops, "doc_id", "left_anti")

    w = (
        Window.partitionBy("source")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = kept.withColumn(
        "hk", md5_56(F.col("doc_id").cast("string"))
    ).withColumn("cum", F.sum("n_tokens").over(w))
    kept_agg = sel.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum((F.col("cum") <= budget_tokens).cast("int")).alias("n_selected"),
        F.sum(
            F.when(F.col("cum") <= budget_tokens, F.col("n_tokens")).otherwise(0)
        ).cast("bigint").alias("tokens_selected"),
    )

    return (
        per_source.join(kept_agg, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_gated",
            (F.col("n_gated") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_neardup_dropped"
            ),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
            F.coalesce("tokens_selected", F.lit(0).cast("bigint")).alias(
                "tokens_selected"
            ),
            F.round(
                F.coalesce("n_kept", F.lit(0)) / F.col("n_docs"), 4
            ).alias("kept_rate"),
        )
    )
