"""Seeded randomized differential fuzz: documents drawn from the
grammar (and quirk corners) of the reference parser must extract
byte-identically through the Spark pipeline.

The seed is fixed → reproducible CI; set SPARK_GRAFT_FUZZ_SEED to
explore new corpora (a failing seed becomes a pinned regression)."""

from __future__ import annotations

import os

from pvsyst_pdf_parser_spark.io.payload import encode_textlayer_pdf

N_DOCS = int(os.environ.get("SPARK_GRAFT_FUZZ_DOCS", "30"))
SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "1337"))


def test_randomized_docs_byte_identical(spark, tmp_path):
    from fixtures.fuzzgen import make_fuzz_docs
    from fixtures.refharness import run_reference
    from pvsyst_pdf_parser_spark.pipeline import extract_documents

    corpus = make_fuzz_docs(N_DOCS, seed=SEED)

    goldens = {}
    for spec, pages in corpus:
        url = spec.url
        goldens[url] = run_reference(
            pages, str(tmp_path / "ref"), f"doc_{spec.doc_id:05d}"
        )

    rows = [
        (spec.url, encode_textlayer_pdf(pages), None, "en")
        for spec, pages in corpus
    ]
    pages_df = spark.createDataFrame(
        rows, "url string, html binary, text string, lang string"
    )
    got = {r["url"]: r for r in extract_documents(pages_df).collect()}

    mismatches = []
    for spec, _pages in corpus:
        gj, gt = goldens[spec.url]
        r = got[spec.url]
        if r["extracted_json"] != gj or r["report_text"] != gt:
            mismatches.append((spec.doc_id, spec.scenario))
    assert not mismatches, f"seed={SEED} mismatched docs: {mismatches}"
