"""Benchmark decontamination — remove/flag training documents that
overlap evaluation benchmarks, the standard pre-training hygiene step
(public practice: GPT-3 appendix C n-gram filtering, PaLM / Llama
13-gram decontamination, The Pile's exact-substring variant).

Shape at 10^12 docs: the benchmark side is TINY (thousands of eval
rows) — its distinct shingle set broadcasts, so the trillion-document
side is one explode + one broadcast-hash semi-match + one per-doc
aggregate.  **No shuffle of the corpus at all** when only the flag is
needed: the explode and the aggregate are keyed by doc_id, which is
the parent row's key, so AQE keeps them in the scan partitioning; the
only exchange is the per-doc groupBy (map-side combined, one row per
doc out).  Never a corpus self-join.

The n-gram width is a parameter: public practice uses 8-13 word
n-grams; the demo oracle uses a smaller n so the tiny synthetic corpus
produces a non-degenerate overlap distribution.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .dedup import doc_shingles, ensure_scan_parallelism


def benchmark_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Per-document benchmark contamination: (doc_id, n_shingles,
    n_overlap, contaminated).

    ``benchmark`` is a small frame with a ``text`` column (an eval
    set's inputs/targets).  A document is contaminated when at least
    ``min_overlap`` of its distinct word ``n``-grams appear anywhere
    in the benchmark — the GPT-3-style conservative rule (one shared
    n-gram of sufficient width is evidence of leakage, because wide
    n-grams are near-unique).

    Plan: benchmark shingles are distinct'd and BROADCAST; the corpus
    side explodes its shingles once, left-semi-ish marks hits via a
    broadcast join, and re-aggregates per doc_id."""
    bench_sh = (
        doc_shingles(benchmark, n=n)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # the corpus-side shingle explode is the op's CPU; on a degenerate
    # scan (one row group) it would run single-core — the benchmark
    # side stays as-is (tiny by contract)
    corpus_sh = doc_shingles(ensure_scan_parallelism(docs), n=n)
    per_doc = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_overlap"),
        )
    )
    # docs too short to shingle have zero rows in corpus_sh: restore
    # them with a left join from the corpus spine so every input doc
    # gets a verdict (an unshingleable doc cannot be contaminated)
    spine = docs.select("doc_id")
    return (
        spine.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap)
            .cast("int")
            .alias("contaminated"),
        )
    )


def decontaminate_report(
    docs: DataFrame, n: int = 8, min_overlap: int = 1, bench_mod: int = 50
) -> DataFrame:
    """Demo/oracle face: treat every ``doc_id % bench_mod == 0``
    document as a held-out benchmark row and decontaminate the REST of
    the corpus against it, reporting the per-source damage:
    (source, n_docs, n_contaminated, contaminated_rate,
    max_overlap)."""
    benchmark = docs.filter(F.col("doc_id") % bench_mod == 0).select(
        "doc_id", "text"
    )
    scan = docs.filter(F.col("doc_id") % bench_mod != 0)
    verdicts = benchmark_overlap(scan, benchmark, n=n, min_overlap=min_overlap)
    return (
        scan.select("doc_id", "source")
        .join(verdicts, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("contaminated").cast("bigint").alias("n_contaminated"),
            F.round(F.avg("contaminated"), 4).alias("contaminated_rate"),
            F.max("n_overlap").alias("max_overlap"),
        )
    )


def fuzzy_benchmark_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.05,
    n: int = 3,
    n_perms: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """NEAR-duplicate benchmark contamination: (doc_id, bench_id,
    jaccard) for every corpus document whose shingle Jaccard to some
    benchmark row reaches ``threshold`` — the fuzzy complement of
    :func:`benchmark_overlap`'s exact n-gram rule (public practice:
    Llama 2 A.6 "contamination" uses token-overlap ratios, not exact
    match, precisely because eval rows get lightly reworded on the
    web).

    Shape at 10^12 docs: the benchmark's banded MinHash signatures are
    a few thousand rows — BROADCAST — so candidate generation is a
    broadcast hash join against the corpus bands (no corpus shuffle,
    never a self-join).  Only candidate pairs (bounded by band
    collision rate × tiny benchmark) pay the exact-Jaccard verify.
    """
    from .cache import persist_tracked
    from .dedup import (
        _signatures_from_shingles,
        banded_signatures,
        doc_shingles,
    )

    corpus_sh = persist_tracked(doc_shingles(docs, n=n))
    bench_sh = persist_tracked(doc_shingles(benchmark, n=n))
    cb = banded_signatures(
        _signatures_from_shingles(corpus_sh, n_perms=n_perms),
        n_perms=n_perms, n_bands=n_bands,
    )
    bb = banded_signatures(
        _signatures_from_shingles(bench_sh, n_perms=n_perms),
        n_perms=n_perms, n_bands=n_bands,
    ).select(F.col("doc_id").alias("bench_id"), "band_idx", "band_sig")
    cands = (
        cb.join(F.broadcast(bb), ["band_idx", "band_sig"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    sizes_c = corpus_sh.groupBy("doc_id").agg(F.count("*").alias("size_doc"))
    sizes_b = bench_sh.groupBy("doc_id").agg(
        F.count("*").alias("size_bench")
    ).withColumnRenamed("doc_id", "bench_id")
    common = (
        cands.join(corpus_sh, "doc_id")
        .join(
            bench_sh.select(F.col("doc_id").alias("bench_id"), "shingle"),
            ["bench_id", "shingle"],
        )
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes_c, "doc_id")
        .join(F.broadcast(sizes_b), "bench_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_doc") + F.col("size_bench") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "bench_id", "jaccard")
    )


def fuzzy_decontam_report(
    docs: DataFrame, threshold: float = 0.05, bench_mod: int = 50
) -> DataFrame:
    """Demo/oracle face of :func:`fuzzy_benchmark_overlap`: every
    ``doc_id % bench_mod == 0`` document plays benchmark, the rest are
    scanned, and the per-source damage is reported as (source, n_docs,
    n_flagged, flagged_rate, max_jaccard)."""
    benchmark = docs.filter(F.col("doc_id") % bench_mod == 0).select(
        "doc_id", "text"
    )
    scan = docs.filter(F.col("doc_id") % bench_mod != 0)
    hits = fuzzy_benchmark_overlap(scan, benchmark, threshold=threshold)
    per_doc = hits.groupBy("doc_id").agg(F.max("jaccard").alias("max_jac"))
    return (
        scan.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("max_jac").isNotNull()).cast("int"))
            .cast("bigint")
            .alias("n_flagged"),
            F.round(F.avg((F.col("max_jac").isNotNull()).cast("int")), 4)
            .alias("flagged_rate"),
            F.round(F.coalesce(F.max("max_jac"), F.lit(0.0)), 4)
            .alias("max_jaccard"),
        )
    )
