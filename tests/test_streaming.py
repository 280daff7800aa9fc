"""Streaming ingest: file-source micro-batches through the same
extraction pipeline + manifest sink; results match the batch goldens."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def test_stream_extract_matches_goldens(spark, fixture_docs, goldens, tmp_path):
    from fixtures.gen import write_pages_parquet
    from pvsyst_pdf_parser_spark.streaming import stream_extract

    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    # two files → two micro-batches with maxFilesPerTrigger=1
    half = len(fixture_docs) // 2
    write_pages_parquet(fixture_docs[:half], f"{pages_dir}/part-0.parquet")
    write_pages_parquet(fixture_docs[half:], f"{pages_dir}/part-1.parquet")

    out_dir = str(tmp_path / "out")
    q = stream_extract(
        spark, pages_dir, out_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(600)

    results = spark.read.parquet(f"{out_dir}/results")
    rows = {r["url"]: r["extracted_json"] for r in results.collect()}
    assert len(rows) == len(fixture_docs)
    for d in fixture_docs:
        assert rows[d.url] == goldens[d.url][0], d.url

    manifest = spark.read.parquet(f"{out_dir}/manifest_buckets")
    assert manifest.filter(F.col("run_id").startswith("stream-batch-")).count() >= 2
