"""Property tests for the training-data operators: structural
invariants that must hold on ANY input, checked on the sf0.001 tables
(complementing the value-exact DuckDB oracles at sf0.01)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_jaccard_pairs_bounds_and_orientation(spark, docs):
    from pvsyst_pdf_parser_spark.training.dedup import ngram_jaccard_pairs

    rows = ngram_jaccard_pairs(docs, threshold=0.0).collect()
    assert rows, "fixture corpus contains near-dup pairs"
    for r in rows:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]  # canonical orientation, no dupes
        assert r["n_common"] >= 1


def test_capped_jaccard_is_subset_semantics(spark, docs):
    """Capping can only REMOVE shingles: capped n_common never exceeds
    the uncapped n_common for the same pair."""
    from pvsyst_pdf_parser_spark.training.dedup import ngram_jaccard_pairs

    full = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_df=5).collect()
    for r in capped:
        key = (r["doc_a"], r["doc_b"])
        assert key in full
        assert r["n_common"] <= full[key]


def test_connected_components_invariants(spark, docs):
    from pvsyst_pdf_parser_spark.training.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, threshold=0.0)
    labels = {r["doc_id"]: r["cluster_rep"]
              for r in connected_components(pairs).collect()}
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    # every endpoint labeled; both endpoints of an edge share a rep
    for a, b in edges:
        assert labels[a] == labels[b]
    # the rep is a member of its own cluster and is the cluster min
    for doc, rep in labels.items():
        assert rep in labels and labels[rep] == rep
        assert rep <= doc


def test_ann_recall_bounds_and_ivf_cells_partition(spark, emb):
    from pvsyst_pdf_parser_spark.training.simsearch import (
        ann_recall_report,
        ivf_assign,
        ivf_cell_stats,
    )

    rec = ann_recall_report(emb, n_queries=10, k=3).collect()[0]
    assert 0.0 <= rec["recall"] <= 1.0
    assert rec["n_hits"] <= rec["n_truth"]

    # home-cell assignment partitions the corpus exactly
    total = emb.count()
    stats = ivf_cell_stats(emb).collect()
    assert sum(r["n_vectors"] for r in stats) == total
    # n_probe=2 yields exactly 2 distinct cells per vector
    two = ivf_assign(emb, n_probe=2)
    assert two.count() == 2 * total
    assert (
        two.groupBy("vec_id").agg(F.countDistinct("cell").alias("c"))
        .filter(F.col("c") != 2).count() == 0
    )


def test_quality_v2_flags_binary_and_score_consistent(spark, docs):
    from pvsyst_pdf_parser_spark.training.textstats import quality_scores_v2

    rows = quality_scores_v2(docs, sample_mod=1).collect()
    flags = ["flag_word_len", "flag_stopwords", "flag_symbols",
             "flag_ttr", "flag_length"]
    for r in rows:
        for f in flags:
            assert r[f] in (0, 1)
        assert abs(r["quality2_score"] - round(sum(r[f] for f in flags) / 5, 4)) < 1e-9
        assert 0.0 < r["type_token_ratio"] <= 1.0


def test_repetition_ratio_bounds(spark, docs):
    from pvsyst_pdf_parser_spark.training.textstats import repetition_stats

    for r in repetition_stats(docs, sample_mod=1).collect():
        assert 0.0 <= r["repetition_ratio"] <= 1.0
        assert r["n_repeated"] <= r["n_grams"]


def test_split_is_deterministic_partition_and_stable(spark, docs):
    """The train/val split is a partition (every doc in exactly one
    side), reproducible across runs, and per-key stable: restricting
    the input to a subset never changes a surviving doc's side."""
    from pvsyst_pdf_parser_spark.training.sampling import hash_bucket

    b = hash_bucket(F.col("doc_id"))
    split = F.when(b < 10, F.lit("val")).otherwise(F.lit("train"))
    full = {r["doc_id"]: r["s"]
            for r in docs.select("doc_id", split.alias("s")).collect()}
    assert set(full.values()) == {"train", "val"}
    sub = {r["doc_id"]: r["s"]
           for r in docs.filter(F.col("doc_id") % 3 == 0)
           .select("doc_id", split.alias("s")).collect()}
    for doc, s in sub.items():
        assert full[doc] == s
