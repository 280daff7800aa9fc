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


def test_crash_between_appends_no_duplicates(spark, pages_parquet, out_dir):
    """Results appended but manifest never written (simulated crash
    between the two non-atomic appends): the resume set is
    manifest ∪ results, so those urls are NOT reprocessed and no
    duplicate output rows appear."""
    from pvsyst_pdf_parser_spark.io.pages import decode_pages_df
    from pvsyst_pdf_parser_spark.pipeline import extract_decoded
    from pvsyst_pdf_parser_spark.scale import ResultSink, resumable_extract

    pages = spark.read.parquet(pages_parquet).orderBy("url").limit(5)
    sink = ResultSink(spark, out_dir)
    sink.write_results(extract_decoded(decode_pages_df(pages)))

    stats = resumable_extract(spark, pages, out_dir, run_id="after-crash")
    assert stats["n_results"] == 0  # nothing reprocessed
    res = spark.read.parquet(f"{out_dir}/results")
    assert res.count() == res.select("url").distinct().count() == 5


def test_sink_dispatch_iceberg_vs_parquet(spark, out_dir):
    """ResultSink selects the Iceberg writeTo path iff a Spark catalog
    is configured for the table's catalog name; parquet fallback
    otherwise (this sandbox has no Iceberg jars — only the dispatch is
    testable, the writeTo path runs on a real cluster).

    Catalog config documented in ResultSink's docstring:
      spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog
    """
    from pvsyst_pdf_parser_spark.scale import ResultSink

    assert ResultSink(spark, out_dir, table="nocat.db.t").mode == "parquet"
    assert ResultSink(spark, out_dir, table=None).mode == "parquet"
    spark.conf.set("spark.sql.catalog.cat_test", "org.example.FakeCatalog")
    try:
        assert ResultSink(spark, out_dir, table="cat_test.db.t").mode == "iceberg"
    finally:
        spark.conf.unset("spark.sql.catalog.cat_test")


class _RecordingWriter:
    """DataFrameWriterV2 double recording the builder chain."""

    def __init__(self, log, name):
        self.log = log
        self.name = name

    def using(self, fmt):
        self.log.append(("using", self.name, fmt))
        return self

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", self.name, [str(c) for c in cols]))
        return self

    def append(self):
        self.log.append(("append", self.name))

    def create(self):
        self.log.append(("create", self.name))


class _FakeDF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, name):
        return _RecordingWriter(self.log, name)


def test_iceberg_append_branch_writer_chain(spark, out_dir):
    """The Iceberg branch of ResultSink._append (never executable in
    this jar-less sandbox) is exercised against a writer double:

    - existing table → plain writeTo(name).append(), nothing else
    - missing results table → using('iceberg') +
      partitionedBy(bucket(n, url)) + create()
    - missing manifest table → using('iceberg') + create(), NO
      partitioning
    - an append() failure on an EXISTING table propagates as itself
      (not masked by a create() retry — the round-2 bug)
    """
    from pvsyst_pdf_parser_spark.scale import ResultSink

    spark.conf.set("spark.sql.catalog.cat_ice", "org.example.FakeCatalog")
    try:
        sink = ResultSink(spark, out_dir, table="cat_ice.db.t", n_buckets=8)
        assert sink.mode == "iceberg"

        log = []
        # missing table → create with bucket partitioning (results only)
        sink._table_exists = lambda name: False
        sink._append(_FakeDF(log), "results")
        sink._append(_FakeDF(log), "manifest_urls")
        assert log[0] == ("using", "cat_ice.db.t_results", "iceberg")
        assert log[1][0] == "partitionedBy" and "bucket" in log[1][2][0]
        assert log[2] == ("create", "cat_ice.db.t_results")
        assert log[3] == ("using", "cat_ice.db.t_manifest_urls", "iceberg")
        assert log[4] == ("create", "cat_ice.db.t_manifest_urls")

        # existing table → append only
        log.clear()
        sink._table_exists = lambda name: True
        sink._append(_FakeDF(log), "results")
        assert log == [("append", "cat_ice.db.t_results")]

        # append failure on an existing table surfaces as itself
        class _FailingWriter(_RecordingWriter):
            def append(self):
                raise RuntimeError("commit conflict")

        class _FailingDF(_FakeDF):
            def writeTo(self, name):
                return _FailingWriter(self.log, name)

        with pytest.raises(RuntimeError, match="commit conflict"):
            sink._append(_FailingDF([]), "results")
    finally:
        spark.conf.unset("spark.sql.catalog.cat_ice")


def test_pack_by_bytes_bounds_stragglers(spark):
    """BASELINE.md straggler gate (byte proxy): on a corpus with
    long-tail document-size skew, size-aware packing keeps the maximum
    per-partition payload bytes under 2x the median partition — and
    giants never co-locate."""
    import pyspark.sql.functions as F

    from fixtures.gen import make_docs
    from pvsyst_pdf_parser_spark.io.pages import pack_partitions_by_bytes

    docs = make_docs(400, skew=True)
    pages = spark.createDataFrame(
        [(d.url, d.payload, d.text, "en") for d in docs],
        "url string, html binary, text string, lang string",
    )
    n = 16
    packed = pack_partitions_by_bytes(pages.select("url", "html", "text"), n)
    per_part = (
        packed.withColumn("pid", F.spark_partition_id())
        .withColumn(
            "bytes",
            F.coalesce(F.octet_length("html"), F.lit(0))
            + F.coalesce(F.length("text"), F.lit(0)),
        )
        .groupBy("pid")
        .agg(F.sum("bytes").alias("b"), F.count("*").alias("c"))
        .collect()
    )
    assert len(per_part) == n  # every partition used (exact placement)
    loads = sorted(r["b"] for r in per_part)
    median = loads[len(loads) // 2]
    assert loads[-1] < 2 * median, f"straggler: max={loads[-1]} median={median}"

    # the 16 largest docs landed on 16 distinct partitions
    sizes = sorted(
        ((d.payload and len(d.payload)) or len(d.text or "") for d in docs),
        reverse=True,
    )
    cutoff = sizes[n - 1]
    giant_parts = (
        packed.withColumn("pid", F.spark_partition_id())
        .withColumn(
            "bytes",
            F.coalesce(F.octet_length("html"), F.lit(0))
            + F.coalesce(F.length("text"), F.lit(0)),
        )
        .filter(F.col("bytes") >= cutoff)
        .select("pid")
        .distinct()
        .count()
    )
    assert giant_parts >= n - 1  # round-robin spread (ties may share)

    # pipeline through decode stays correct under packing
    from pvsyst_pdf_parser_spark.io.pages import decode_pages_df

    decoded = decode_pages_df(pages.limit(30), num_partitions=8, pack_by_bytes=True)
    assert decoded.filter(F.col("status") == "ok").count() > 0


def test_run_health_report(spark, pages_parquet, out_dir):
    """run_health aggregates the manifest into per-run doc counts,
    error rates, and throughput without touching the results data."""
    from pvsyst_pdf_parser_spark.scale import resumable_extract, run_health

    pages = spark.read.parquet(pages_parquet)
    resumable_extract(spark, pages.limit(6), out_dir, run_id="h1")
    bad = spark.createDataFrame(
        [("bad://x", b"\x00\xff", None, "en")],
        "url string, html binary, text string, lang string",
    )
    resumable_extract(
        spark, pages.unionByName(bad, allowMissingColumns=True),
        out_dir, run_id="h2",
    )

    rows = {r["run_id"]: r for r in run_health(spark, out_dir).collect()}
    assert rows["h1"]["n_ok"] == 6 and rows["h1"]["n_error"] == 0
    assert rows["h1"]["error_rate"] == 0.0
    assert rows["h2"]["n_error"] == 1
    assert 0 < rows["h2"]["error_rate"] < 1
    for r in rows.values():
        assert r["wall_sec"] > 0 and r["n_buckets"] >= 1
        assert r["docs_per_sec"] is None or r["docs_per_sec"] >= 0


def test_iceberg_read_paths_full_resume_cycle(spark, pages_parquet, out_dir,
                                              monkeypatch):
    """The iceberg-branch READ paths (_read / completed_urls /
    run_stats) get a full write -> resume -> no-dupes cycle against a
    table-serving double: appends store each ``{table}_{kind}`` under
    its FULL table name, reads are served back through the _read_table
    seam by that exact name — so a typo in the ``{table}_{kind}``
    construction on either side breaks resume or run_stats here instead
    of shipping silently (the writer-chain test only covered writes)."""
    import os

    from pvsyst_pdf_parser_spark.scale import ResultSink, resumable_extract

    store: dict[str, str] = {}  # full table name -> backing parquet path

    def fake_append(self, df, kind):
        assert self.mode == "iceberg"
        name = f"{self.table}_{kind}"
        path = os.path.join(out_dir, "store", kind)
        df.write.mode("append").parquet(path)
        store[name] = path

    def fake_read_table(self, name):
        if name not in store:  # missing table: same surface as catalog
            raise RuntimeError(f"table not found: {name}")
        return self.spark.read.parquet(store[name])

    monkeypatch.setattr(ResultSink, "_append", fake_append)
    monkeypatch.setattr(ResultSink, "_read_table", fake_read_table)
    spark.conf.set("spark.sql.catalog.cat_rb", "org.example.FakeCatalog")
    try:
        table = "cat_rb.db.t"
        pages = spark.read.parquet(pages_parquet)
        n_total = pages.count()
        first = pages.orderBy("url").limit(7)

        s1 = resumable_extract(spark, first, out_dir, run_id="i1", table=table)
        assert s1["n_results"] == 7  # run_stats read the manifest back

        s2 = resumable_extract(spark, pages, out_dir, run_id="i2", table=table)
        assert s2["n_results"] == n_total - 7  # completed_urls excluded run 1

        s3 = resumable_extract(spark, pages, out_dir, run_id="i3", table=table)
        assert s3["n_results"] == 0  # nothing left

        res = spark.read.parquet(store[f"{table}_results"])
        assert res.count() == n_total
        assert res.select("url").distinct().count() == n_total  # no dupes

        # snapshot-read sanity: completed_urls unions manifest + results
        sink = ResultSink(spark, out_dir, table=table)
        assert sink.mode == "iceberg"
        assert sink.completed_urls().count() == n_total
    finally:
        spark.conf.unset("spark.sql.catalog.cat_rb")


def test_spans_sink_written_with_results_no_second_decode(
    spark, fixture_docs, pages_parquet, out_dir
):
    """with_spans=True writes the north-rule span table alongside
    results: span rows equal the single-process scan of each doc's
    ground-truth text layer, bucketed like results, and the explode
    reads the CHECKPOINTED results frame (no second decode of the raw
    corpus — the plan must not contain another mapInPandas)."""
    from pvsyst_pdf_parser_spark.scale import resumable_extract
    from pvsyst_pdf_parser_spark.text.spans import spans_of_text

    pages = spark.read.parquet(pages_parquet)
    resumable_extract(spark, pages, out_dir, run_id="s1", with_spans=True)

    spans = spark.read.parquet(f"{out_dir}/spans")
    got = sorted(
        (r["url"], r["span_kind"], r["name"], r["midx"], r["start"],
         r["end"], r["value"])
        for r in spans.collect()
    )
    want = sorted(
        (d.url, k, n, m, s, e, v)
        for d in fixture_docs
        for (k, n, m, s, e, v) in spans_of_text(d.doc_text)
    )
    assert got == want
    assert "bucket" in spans.columns  # co-bucketed with results

    # results table must NOT carry the span array (dropped before write)
    results = spark.read.parquet(f"{out_dir}/results")
    assert "field_spans" not in results.columns

    # resume: nothing to do, span sink unchanged (no duplicates)
    resumable_extract(spark, pages, out_dir, run_id="s2", with_spans=True)
    assert spark.read.parquet(f"{out_dir}/spans").count() == len(got)


def test_reconcile_spans_heals_crash_gap_idempotently(
    spark, fixture_docs, pages_parquet, out_dir
):
    """Crash window: results appended, spans append never ran (the
    with_spans=False run stands in for the torn write).  reconcile_spans
    must fill exactly the missing urls from the pages table and be a
    no-op when re-run."""
    from pvsyst_pdf_parser_spark.scale import reconcile_spans, resumable_extract
    from pvsyst_pdf_parser_spark.text.spans import spans_of_text

    pages = spark.read.parquet(pages_parquet)
    first = pages.limit(5)
    # run 1 writes results+spans; run 2 "crashes" before its span append
    resumable_extract(spark, first, out_dir, run_id="g1", with_spans=True)
    resumable_extract(spark, pages, out_dir, run_id="g2", with_spans=False)

    n_docs = len(fixture_docs)
    rep = reconcile_spans(spark, pages, out_dir)
    assert rep["gap_urls"] == n_docs - 5

    spans = spark.read.parquet(f"{out_dir}/spans")
    want = sorted(
        (d.url, k, n, m, s, e, v)
        for d in fixture_docs
        for (k, n, m, s, e, v) in spans_of_text(d.doc_text)
    )
    got = sorted(
        (r["url"], r["span_kind"], r["name"], r["midx"], r["start"],
         r["end"], r["value"])
        for r in spans.collect()
    )
    assert got == want

    # idempotent: second reconcile finds no gap, appends nothing
    assert reconcile_spans(spark, pages, out_dir) == {"gap_urls": 0}
    assert spark.read.parquet(f"{out_dir}/spans").count() == len(want)
