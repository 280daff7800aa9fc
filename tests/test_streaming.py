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


def test_stateful_page_reassembly_across_batches(spark, fixture_docs, tmp_path):
    """applyInPandasWithState: pages of one document split across TWO
    micro-batches (maxFilesPerTrigger=1) reassemble into exactly one
    complete document with the exact page order; a document whose last
    page never arrives is NOT emitted as complete."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from pvsyst_pdf_parser_spark.streaming import stream_assemble_docs

    pdf_docs = [d for d in fixture_docs if d.spec.kind == "pdf"][:6]
    incomplete_url = pdf_docs[-1].url

    first_half, second_half = [], []
    for d in pdf_docs:
        n = len(d.pages)
        for i, text in enumerate(d.pages, start=1):
            row = (d.url, i, n, text)
            if i <= max(1, n // 2):
                first_half.append(row)
            elif not (d.url == incomplete_url and i == n):
                second_half.append(row)  # drop the last page of one doc

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    for name, rows in (("b0", first_half), ("b1", second_half)):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(cols[0], pa.string()),
                    "page_no": pa.array(cols[1], pa.int32()),
                    "n_pages": pa.array(cols[2], pa.int32()),
                    "full_text": pa.array(cols[3], pa.string()),
                }
            ),
            str(events_dir / f"{name}.parquet"),
        )

    out_dir = str(tmp_path / "docs_out")
    q = stream_assemble_docs(
        spark, str(events_dir), out_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    got = {
        r["url"]: r
        for r in spark.read.parquet(out_dir)
        .filter(F.col("status") == "complete")
        .collect()
    }
    for d in pdf_docs[:-1]:
        assert got[d.url]["doc_text"] == "\n".join(d.pages), d.url
        assert got[d.url]["n_pages"] == len(d.pages)
    assert incomplete_url not in got  # last page never arrived


def test_timeout_ms_flushes_partial_fast(spark, tmp_path):
    """The `timeout_ms` parameter is honored: with timeout_ms=1000 a
    stalled document flushes as status='partial' within seconds — not
    the 60 s the round-2 code hardcoded.  Duplicate page events are
    deduplicated first-wins before the flush (n_pages counts distinct
    pages)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pvsyst_pdf_parser_spark.streaming import (
        PAGE_EVENT_SCHEMA,
        assemble_documents_stream,
    )

    events_dir = tmp_path / "ev"
    events_dir.mkdir()

    def write_events(name, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(cols[0], pa.string()),
                    "page_no": pa.array(cols[1], pa.int32()),
                    "n_pages": pa.array(cols[2], pa.int32()),
                    "full_text": pa.array(cols[3], pa.string()),
                }
            ),
            str(events_dir / f"{name}.parquet"),
        )

    # stalled doc: 2 events for the SAME page (dup), n_pages=3 never met
    write_events(
        "b0",
        [("http://stall", 1, 3, "page one"), ("http://stall", 1, 3, "dup ignored")],
    )

    events = (
        spark.readStream.schema(PAGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(events_dir))
    )
    out_dir = str(tmp_path / "out")
    q = (
        assemble_documents_stream(events, timeout_ms=1000)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    t0 = time.time()
    partial = []
    tick = 0
    try:
        # keep feeding unrelated single-page docs so micro-batches keep
        # running (processing-time timeouts fire on batch boundaries)
        while time.time() - t0 < 45 and not partial:
            tick += 1
            write_events(f"tick{tick}", [(f"http://tick{tick}", 1, 1, "x")])
            time.sleep(1)
            try:
                partial = (
                    spark.read.parquet(out_dir)
                    .filter("status = 'partial'")
                    .collect()
                )
            except Exception:  # output dir not yet created
                partial = []
    finally:
        q.stop()
    elapsed = time.time() - t0
    assert partial, "partial flush never observed"
    assert partial[0]["url"] == "http://stall"
    assert partial[0]["n_pages"] == 1  # dup page deduplicated first-wins
    assert partial[0]["doc_text"] == "page one"
    assert elapsed < 45, f"flush took {elapsed:.0f}s - timeout_ms ignored?"


def test_stream_dedup_across_batches(spark, tmp_path):
    """Watermarked dropDuplicates dedups document fingerprints ACROSS
    micro-batches: a duplicate arriving in a later batch (within the
    watermark horizon) is dropped; distinct fingerprints all pass."""
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pvsyst_pdf_parser_spark.streaming import stream_dedup_docs

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    t0 = datetime(2026, 1, 1, 12, 0, tzinfo=timezone.utc)

    def write_docs(name, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(cols[0], pa.string()),
                    "warc_ts": pa.array(cols[1], pa.timestamp("us", tz="UTC")),
                    "fingerprint": pa.array(cols[2], pa.int64()),
                    "text": pa.array(cols[3], pa.string()),
                }
            ),
            str(docs_dir / f"{name}.parquet"),
        )

    write_docs("b0", [("http://a", t0, 111, "alpha"),
                      ("http://b", t0, 222, "beta")])
    # later batch: re-fetch of A (same fingerprint, +5 min) + new doc C
    from datetime import timedelta

    write_docs("b1", [("http://a-mirror", t0 + timedelta(minutes=5), 111, "alpha"),
                      ("http://c", t0 + timedelta(minutes=5), 333, "gamma")])

    out_dir = str(tmp_path / "out")
    q = stream_dedup_docs(
        spark, str(docs_dir), out_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).collect()
    by_fp = {}
    for r in got:
        by_fp.setdefault(r["fingerprint"], []).append(r["url"])
    assert sorted(by_fp) == [111, 222, 333]
    assert all(len(urls) == 1 for urls in by_fp.values())
    assert by_fp[111] == ["http://a"]  # first-wins, mirror dropped


def test_row_minhash_bands_match_aggregated_path(spark):
    """The row-local HOF band computation must be bit-identical to the
    batch groupBy signature path — stream and batch agree on blocking
    keys, so the online screen and the batch sweep see the same
    buckets."""
    import pyspark.sql.functions as F

    from pvsyst_pdf_parser_spark.training.dedup import (
        N_BANDS,
        N_PERMS,
        _signatures_from_shingles,
        doc_shingles,
        row_minhash_bands,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows_per_band = N_PERMS // N_BANDS
    sig = _signatures_from_shingles(doc_shingles(docs))
    agg_bands = {
        r["doc_id"]: [
            "_".join(str(r[f"mh{b * rows_per_band + k}"])
                     for k in range(rows_per_band))
            for b in range(N_BANDS)
        ]
        for r in sig.collect()
    }
    row_bands = {
        r["doc_id"]: r["bands"]
        for r in docs.select(
            "doc_id", row_minhash_bands().alias("bands")
        ).collect()
    }
    assert agg_bands  # fixture corpus is non-trivial
    for doc_id, expected in agg_bands.items():
        assert row_bands[doc_id] == expected, doc_id


def test_stream_neardup_candidates_across_batches(spark, tmp_path):
    """Streaming near-dup blocking: a document arriving in a LATER
    micro-batch whose band-0 signature collides with an earlier one is
    flagged near_dup_candidate with the first url attached; distinct
    docs pass as 'first'; short docs (no shingles) pass through the
    filter untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from pvsyst_pdf_parser_spark.streaming import stream_neardup_docs

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_c = "completely different content about solar inverter reports here"

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()

    def write_docs(name, rows):
        urls, texts = zip(*rows)
        pq.write_table(
            pa.table({"url": pa.array(urls, pa.string()),
                      "text": pa.array(texts, pa.string())}),
            str(docs_dir / f"{name}.parquet"),
        )

    write_docs("b0", [("http://a", text_a), ("http://c", text_c)])
    # identical text in a later batch -> same band signature, flagged
    write_docs("b1", [("http://a-mirror", text_a), ("http://short", "too short")])

    out_dir = str(tmp_path / "out")
    q = stream_neardup_docs(
        spark, str(docs_dir), out_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    rows = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    assert rows["http://a"]["status"] == "first"
    assert rows["http://c"]["status"] == "first"
    assert rows["http://a-mirror"]["status"] == "near_dup_candidate"
    assert rows["http://a-mirror"]["dup_of"] == "http://a"
    assert "http://short" not in rows  # no shingles -> filtered upstream


def test_stream_clean_gates_and_dedup_across_batches(spark, tmp_path):
    """The streaming cleaning funnel: stateless language+quality gates
    drop junk in-stream, and the surviving docs dedup on fingerprint
    across micro-batches — gate decisions byte-identical to the batch
    funnel (textstats.gate_flags) on the same rows."""
    from datetime import datetime, timedelta, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pvsyst_pdf_parser_spark.streaming import stream_clean_docs
    from pvsyst_pdf_parser_spark.training.textstats import gate_flags

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    t0 = datetime(2026, 1, 1, 12, 0, tzinfo=timezone.utc)

    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "to the green hills in the cool morning of a bright new day "
        "while the wind and the rain of the north move to the sea in "
        "silence and the birds of the valley sing to the sun in joy"
    )
    good2 = good.replace("fox", "hare").replace("dog", "cat")
    junk = "zz zz zz zz"

    def write_docs(name, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(cols[0], pa.string()),
                    "warc_ts": pa.array(cols[1], pa.timestamp("us", tz="UTC")),
                    "fingerprint": pa.array(cols[2], pa.int64()),
                    "text": pa.array(cols[3], pa.string()),
                }
            ),
            str(docs_dir / f"{name}.parquet"),
        )

    write_docs("b0", [("http://good", t0, 1, good),
                      ("http://junk", t0, 2, junk)])
    write_docs("b1", [("http://good-mirror", t0 + timedelta(minutes=5), 1, good),
                      ("http://good2", t0 + timedelta(minutes=5), 3, good2)])

    # batch-side cross-check: the same gate arithmetic admits good/good2
    # and rejects junk
    flags = {
        r["doc_id"]: (r["pass_lang"], r["pass_quality"])
        for r in gate_flags(
            spark.createDataFrame(
                [(1, good, "s"), (2, junk, "s"), (3, good2, "s")],
                "doc_id int, text string, source string",
            )
        ).collect()
    }
    assert flags[1] == (1, 1) and flags[3] == (1, 1)
    assert 0 in flags[2]

    out_dir = str(tmp_path / "out")
    q = stream_clean_docs(
        spark, str(docs_dir), out_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = sorted((r["fingerprint"], r["url"])
                 for r in spark.read.parquet(out_dir).collect())
    assert got == [(1, "http://good"), (3, "http://good2")]


def test_windowed_ingest_stats_finalize_and_late_drop(spark, tmp_path):
    """Append-mode windowed agg: a window is emitted exactly once when
    the watermark passes its end; an event arriving LATER than the
    watermark is dropped (the finalized window never mutates); a window
    the watermark never passes is not emitted."""
    from datetime import datetime, timedelta, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pvsyst_pdf_parser_spark.streaming import stream_ingest_stats

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    t0 = datetime(2026, 1, 1, 12, 0, tzinfo=timezone.utc)

    # FileStreamSource orders pending files by MODIFICATION TIME (ms
    # granularity) — four files written back-to-back can collide on one
    # millisecond, and a tie lets the "late" file process before the
    # watermark advances (observed as a flake under full-suite load).
    # Pin strictly increasing mtimes so batch order == intended order.
    mtime = [1_700_000_000]

    def write_docs(name, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(cols[0], pa.string()),
                    "warc_ts": pa.array(cols[1], pa.timestamp("us", tz="UTC")),
                    "fingerprint": pa.array(cols[2], pa.int64()),
                    "text": pa.array(cols[3], pa.string()),
                }
            ),
            str(docs_dir / f"{name}.parquet"),
        )
        mtime[0] += 10
        os.utime(docs_dir / f"{name}.parquet", (mtime[0], mtime[0]))

    # batch 0: two docs in the [12:00, 12:10) window
    write_docs("b0", [
        ("http://a", t0, 1, "one two three"),
        ("http://b", t0 + timedelta(minutes=5), 2, "four five"),
    ])
    # batch 1: 12:21 pushes the watermark to 12:11 — STRICTLY past the
    # window end (a watermark exactly ON the end leaves it open).
    # Watermark timing is doubly lagged: the value commits at batch
    # END, and eviction in a batch uses the batch-START value — so the
    # 12:00 window is evicted during batch 2, and only a row arriving
    # in batch 3 (state already gone) exercises the late-drop path.
    write_docs("b1", [("http://c", t0 + timedelta(minutes=21), 3, "six")])
    # batch 2: unrelated 12:20-window traffic; its processing evicts
    # and emits the finalized 12:00 window (watermark 12:11 > 12:10)
    write_docs("b2", [("http://d", t0 + timedelta(minutes=25), 5, "eleven")])
    # batch 3: a LATE event for the already-emitted 12:00 window (its
    # window end 12:10 < watermark -> dropped, never retro-mutating
    # the finalized row) plus more open-window traffic
    write_docs("b3", [
        ("http://late", t0 + timedelta(minutes=3), 4, "seven eight nine ten"),
        ("http://e", t0 + timedelta(minutes=26), 6, "twelve"),
    ])

    out_dir = str(tmp_path / "out")
    q = stream_ingest_stats(
        spark, str(docs_dir), out_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = {
        r["window_start"].minute: (r["n_docs"], r["n_tokens"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # only the 12:00 window finalized; the late doc did NOT mutate it
    # (3+2 tokens, 2 docs — not 3 docs / 9 tokens); the 12:20 window
    # stays open (watermark never passed 12:30) so it is absent
    assert got == {0: (2, 5)}


def test_stream_domain_cap_across_batches(spark, tmp_path):
    """The per-host admission counter persists ACROSS micro-batches: a
    host that exhausts its cap in batch 0 gets every later page
    rejected; an under-cap host keeps admitting; per-host admitted
    totals equal min(cap, n_pages) — the batch domain_cap semantics
    applied online."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pvsyst_pdf_parser_spark.streaming import stream_domain_cap

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    mtime = [1_700_000_000]

    def write_docs(name, urls):
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "text": pa.array(["x"] * len(urls), pa.string()),
                }
            ),
            str(docs_dir / f"{name}.parquet"),
        )
        # Pin strictly increasing mtimes so batch order == intended order.
        mtime[0] += 10
        os.utime(docs_dir / f"{name}.parquet", (mtime[0], mtime[0]))

    write_docs("b0", [
        "http://big.example.com/1", "http://big.example.com/2",
        "http://WWW.Big.example.com:80/3",   # same host after norm rules
        "http://small.example.com/1",
    ])
    write_docs("b1", [
        "http://big.example.com/4",          # over cap=3: rejected
        "http://big.example.com/5",          # rejected
        "http://small.example.com/2",        # admitted
    ])

    out_dir = str(tmp_path / "out")
    q = stream_domain_cap(
        spark, str(docs_dir), out_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, cap=3,
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 7
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r)
    assert sorted(by_host) == ["big.example.com", "small.example.com"]
    big = sorted(by_host["big.example.com"], key=lambda r: r["host_seq"])
    assert [r["host_seq"] for r in big] == [1, 2, 3, 4, 5]
    assert [r["admitted"] for r in big] == [1, 1, 1, 0, 0]
    # batch-1 arrivals continued the batch-0 counter (cross-batch state)
    assert {r["url"] for r in big if r["admitted"] == 0} == {
        "http://big.example.com/4", "http://big.example.com/5",
    }
    small = sorted(by_host["small.example.com"], key=lambda r: r["host_seq"])
    assert [r["admitted"] for r in small] == [1, 1]
    # per-host admitted totals == min(cap, n) — the batch semantics
    assert sum(r["admitted"] for r in big) == 3
    assert sum(r["admitted"] for r in small) == 2
