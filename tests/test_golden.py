"""Byte-identity gate (BASELINE.json): the Spark pipeline's per-url
structured JSON and analysis text must equal the reference parser's
outputs byte-for-byte on every fixture document (PDF containers, HTML
mirrors, text-only rows, all scenarios)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def pipeline_rows(spark, pages_parquet):
    from pvsyst_pdf_parser_spark.pipeline import extract_documents

    out = extract_documents(spark.read.parquet(pages_parquet))
    return {r["url"]: r for r in out.collect()}


def test_all_urls_extracted(pipeline_rows, fixture_docs):
    assert set(pipeline_rows) == {d.url for d in fixture_docs}


def test_structured_json_byte_identical(pipeline_rows, fixture_docs, goldens):
    mismatches = []
    for d in fixture_docs:
        golden_json, _ = goldens[d.url]
        got = pipeline_rows[d.url]["extracted_json"]
        if got != golden_json:
            mismatches.append(d.url)
    assert not mismatches, f"JSON mismatch for {mismatches}"


def test_report_text_byte_identical(pipeline_rows, fixture_docs, goldens):
    mismatches = []
    for d in fixture_docs:
        _, golden_txt = goldens[d.url]
        got = pipeline_rows[d.url]["report_text"]
        if got != golden_txt:
            mismatches.append(d.url)
    assert not mismatches, f"report mismatch for {mismatches}"


def test_determinism(spark, pages_parquet, pipeline_rows):
    """Same input twice → identical output (resume precondition)."""
    from pvsyst_pdf_parser_spark.pipeline import extract_documents

    again = {
        r["url"]: r
        for r in extract_documents(spark.read.parquet(pages_parquet)).collect()
    }
    assert {u: r["extracted_json"] for u, r in again.items()} == {
        u: r["extracted_json"] for u, r in pipeline_rows.items()
    }
