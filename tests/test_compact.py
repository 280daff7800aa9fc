"""Sink compaction: repeated resumable appends accumulate small files;
compact_results rewrites to few files per bucket with identical rows."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F


def test_compact_results_reduces_files_keeps_rows(spark, pages_parquet, tmp_path):
    from pvsyst_pdf_parser_spark.scale import compact_results, resumable_extract

    out_dir = str(tmp_path / "out")
    pages = spark.read.parquet(pages_parquet)
    # three appends → three file sets per touched bucket
    resumable_extract(spark, pages.limit(8), out_dir, run_id="c1")
    resumable_extract(spark, pages.limit(16), out_dir, run_id="c2")
    resumable_extract(spark, pages, out_dir, run_id="c3")

    results_dir = os.path.join(out_dir, "results")
    before = spark.read.parquet(results_dir)
    rows_before = sorted(
        (r["url"], r["extracted_json"]) for r in before.collect()
    )
    n_buckets_before = before.select("bucket").distinct().count()
    n_files_before = len(glob.glob(os.path.join(results_dir, "*", "*.parquet")))

    stats = compact_results(spark, out_dir, files_per_bucket=1)
    assert stats["files_before"] == n_files_before
    assert stats["files_after"] < n_files_before
    assert stats["rows"] == len(rows_before)

    after = spark.read.parquet(results_dir)
    rows_after = sorted(
        (r["url"], r["extracted_json"]) for r in after.collect()
    )
    assert rows_after == rows_before
    # bucket partitioning survives (resume pruning still works)
    assert after.select("bucket").distinct().count() == n_buckets_before
    # no staging/backup leftovers
    assert not os.path.exists(results_dir + ".compacting")
    assert not os.path.exists(results_dir + ".bak")

    # resume after compaction still sees everything as done
    stats2 = resumable_extract(spark, pages, out_dir, run_id="c4")
    assert stats2["n_results"] == 0
