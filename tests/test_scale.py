"""Resume/manifest tests (SURVEY §5.5): kill-and-resume completes with
no duplicate urls and identical output; errors are quarantined into the
manifest, never silently lost."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def test_resume_no_duplicates(spark, fixture_docs, pages_parquet, out_dir):
    from pvsyst_pdf_parser_spark.scale import resumable_extract

    pages = spark.read.parquet(pages_parquet)
    first_half = pages.filter(F.col("url") < "https://cc-mirror.example/site3")
    stats1 = resumable_extract(spark, first_half, out_dir, run_id="r1")
    assert stats1["n_results"] > 0

    # "resume": full input; previously-done urls must be skipped
    stats2 = resumable_extract(spark, pages, out_dir, run_id="r2")
    total = stats1["n_results"] + stats2["n_results"]
    assert total == len(fixture_docs)

    results = spark.read.parquet(f"{out_dir}/results")
    assert results.count() == len(fixture_docs)
    assert results.select("url").distinct().count() == len(fixture_docs)

    # a third run has nothing to do
    stats3 = resumable_extract(spark, pages, out_dir, run_id="r3")
    assert stats3["n_results"] == 0


def test_resume_output_matches_single_run(spark, pages_parquet, goldens, out_dir):
    from pvsyst_pdf_parser_spark.scale import resumable_extract

    pages = spark.read.parquet(pages_parquet)
    resumable_extract(spark, pages.limit(7), out_dir, run_id="a")
    resumable_extract(spark, pages, out_dir, run_id="b")
    rows = {
        r["url"]: r["extracted_json"]
        for r in spark.read.parquet(f"{out_dir}/results").collect()
    }
    for url, (golden_json, _) in goldens.items():
        assert rows[url] == golden_json, url


def test_errors_quarantined_in_manifest(spark, out_dir):
    from pvsyst_pdf_parser_spark.scale import resumable_extract

    bad = spark.createDataFrame(
        [
            ("bad://garbage", b"\x00\xff", None, "en"),
            ("bad://nulls", None, None, "en"),
        ],
        "url string, html binary, text string, lang string",
    )
    stats = resumable_extract(spark, bad, out_dir, run_id="err")
    assert stats["n_results"] == 0
    assert stats["n_errors"] == 2
    manifest = spark.read.parquet(f"{out_dir}/manifest_urls")
    assert manifest.filter(F.col("status") != "ok").count() == 2
    # and a rerun does not reprocess quarantined urls
    stats2 = resumable_extract(spark, bad, out_dir, run_id="err2")
    assert stats2["n_errors"] == 0
