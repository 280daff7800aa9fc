"""Structured Streaming ingest variant.

The reference is strictly batch, and the north rule's resumability is
implemented as batch manifests (scale.py).  This module adds the
continuous-ingest deployment shape for a crawl that keeps appending
pages: a file-source stream over the pages table directory, with the
SAME extraction pipeline applied per micro-batch via ``foreachBatch`` —
so each micro-batch inherits the bucketed sink + manifest lineage, and
checkpointing makes the stream itself exactly-once per file.

Why foreachBatch rather than a fully streaming plan: the extraction DAG
aggregates per url (complete documents arrive atomically as rows), so
no cross-batch state or watermarking is required — per-batch batch
semantics are exactly right, and every operator stays identical to the
batch path (no dual implementations to drift apart).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    num_partitions: int | None = None,
):
    """Start a streaming query: pages parquet dir → extraction → bucketed
    results + manifest per micro-batch.  Returns the StreamingQuery."""
    from .scale import resumable_extract

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        resumable_extract(
            batch_df.sparkSession,
            batch_df,
            out_dir,
            run_id=f"stream-batch-{batch_id:08d}",
            num_partitions=num_partitions,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: incremental page → document reassembly
# ---------------------------------------------------------------------------

PAGE_EVENT_SCHEMA = "url string, page_no int, n_pages int, full_text string"
DOC_OUT_SCHEMA = "url string, n_pages int, doc_text string, status string"
_STATE_SCHEMA = (
    "page_nos array<int>, texts array<string>, n_pages int"
)


def _assemble_state_func(key, pdfs, state, timeout_ms: int = 60_000):
    """applyInPandasWithState body: accumulate per-url pages in group
    state; emit the document once all page numbers 1..n_pages have
    arrived (first-wins on duplicate page events); a processing-time
    timeout flushes stalled documents as status='partial' so nothing is
    silently dropped."""
    import pandas as pd

    url = key[0]
    if state.hasTimedOut:
        page_nos, texts, n_pages = state.get
        by_no = {}
        for no, txt in zip(page_nos, texts):
            by_no.setdefault(no, txt)
        doc_text = "\n".join(t for _, t in sorted(by_no.items()))
        state.remove()
        yield pd.DataFrame(
            {"url": [url], "n_pages": [len(by_no)],
             "doc_text": [doc_text], "status": ["partial"]}
        )
        return

    if state.exists:
        page_nos, texts, n_pages = state.get
        page_nos, texts = list(page_nos), list(texts)
    else:
        page_nos, texts, n_pages = [], [], None
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            page_nos.append(int(row.page_no))
            texts.append(row.full_text or "")
            if row.n_pages is not None:
                n_pages = int(row.n_pages)

    seen = {}
    for no, txt in zip(page_nos, texts):
        seen.setdefault(no, txt)
    if n_pages is not None and len(seen) >= n_pages:
        doc_text = "\n".join(t for _, t in sorted(seen.items()))
        state.remove()
        yield pd.DataFrame(
            {"url": [url], "n_pages": [n_pages],
             "doc_text": [doc_text], "status": ["complete"]}
        )
    else:
        # Store the first-wins DEDUPLICATED pages, not the raw event log:
        # a crawler re-fetching the same page every micro-batch would
        # otherwise grow state without bound for stalled documents.
        dedup_nos = sorted(seen)
        state.update((dedup_nos, [seen[no] for no in dedup_nos], n_pages))
        state.setTimeoutDuration(timeout_ms)


def assemble_documents_stream(page_events, timeout_ms: int = 60_000):
    """Streaming page events (url, page_no, n_pages, full_text) →
    complete documents, via ``applyInPandasWithState``.

    This is the custom stateful operator the batch engine cannot
    express: pages of one document arrive across micro-batches (a
    crawler re-fetching, a paginating decoder) and the document must be
    emitted exactly once when its last page lands.  State is the
    per-url page accumulator; eviction is by processing-time timeout
    (``timeout_ms``; stalled docs flush as status='partial' —
    observable, not dropped).  Scale: state is keyed by url — the same
    hash distribution as the batch pipeline — and each group's state is
    O(document) (duplicate page events are deduplicated before the
    state write), bounded by the same Arrow limits as decode."""
    import functools

    return page_events.groupBy("url").applyInPandasWithState(
        functools.partial(_assemble_state_func, timeout_ms=timeout_ms),
        outputStructType=DOC_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


DOC_EVENT_SCHEMA = (
    "url string, warc_ts timestamp, fingerprint bigint, text string"
)


def dedup_documents_stream(docs, fingerprint_col: str = "fingerprint",
                           event_time_col: str = "warc_ts",
                           watermark: str = "1 hour"):
    """Cross-micro-batch EXACT dedup of a document stream: the first
    event with a given fingerprint passes; later duplicates (a crawler
    re-fetching an unchanged page, mirror urls with identical content)
    are dropped.  Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+),
    NOT plain ``dropDuplicates``: with the latter the watermark never
    evicts fingerprint-keyed state (the event-time column is not part of
    the dedup key), so state would grow one row per distinct fingerprint
    forever.  WithinWatermark keeps each fingerprint's state only until
    the watermark passes its first-seen event time, so state is truly
    bounded by the watermark horizon — a duplicate arriving later than
    ``watermark`` behind the max seen event time is no longer detected,
    and the batch exact-dedup (training/dedup.py) over the accumulated
    sink is the full-history backstop.  This is the streaming face of
    the same dedup semantics; fingerprints come from doc_fingerprints /
    md5_56."""
    return docs.withWatermark(
        event_time_col, watermark
    ).dropDuplicatesWithinWatermark([fingerprint_col])


NEARDUP_EVENT_SCHEMA = "url string, text string"
NEARDUP_OUT_SCHEMA = "url string, band_sig string, status string, dup_of string"
_NEARDUP_STATE_SCHEMA = "first_url string"


def _neardup_state_func(key, pdfs, state, timeout_ms: int = 3_600_000):
    """applyInPandasWithState body for streaming near-dup blocking: the
    first document in a band bucket passes as status='first'; every
    later same-bucket document is flagged 'near_dup_candidate' with the
    first url attached (the batch verify join is the precision stage —
    banding is the recall stage, same contract as batch LSH).
    Processing-time timeout evicts idle buckets, bounding state."""
    import pandas as pd

    band_sig = key[0]
    if state.hasTimedOut:
        state.remove()
        return
    first_url = state.get[0] if state.exists else None
    urls, statuses, dup_ofs = [], [], []
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            if first_url is None:
                first_url = row.url
                urls.append(row.url)
                statuses.append("first")
                dup_ofs.append(None)
            else:
                urls.append(row.url)
                statuses.append("near_dup_candidate")
                dup_ofs.append(first_url)
    state.update((first_url,))
    state.setTimeoutDuration(timeout_ms)
    yield pd.DataFrame(
        {"url": urls, "band_sig": [band_sig] * len(urls),
         "status": statuses, "dup_of": dup_ofs}
    )


def neardup_candidates_stream(docs, band_idx: int = 0,
                              timeout_ms: int = 3_600_000):
    """Streaming NEAR-duplicate candidate detection — the streaming face
    of batch MinHash LSH: each document's band signature is computed
    ROW-LOCALLY (training/dedup.row_minhash_bands — a pure projection,
    bit-identical to the batch signature path, so stream and batch
    agree on blocking keys), then one stateful stage keyed by the
    chosen band flags later same-bucket arrivals.

    Single-band blocking trades recall for a single stateful operator
    (Spark restricts chained stateful stages); run one query per band
    for OR-amplification, or treat this as the cheap online screen with
    the batch `minhash_lsh_verified` sweep as the precision backstop.
    State is one url per occupied bucket, evicted by processing-time
    timeout — bounded by bucket fan-out, not corpus size."""
    import functools

    from pyspark.sql import functions as F

    from .training.dedup import row_minhash_bands

    keyed = docs.select(
        "url",
        F.element_at(row_minhash_bands(), band_idx + 1).alias("band_sig"),
    ).filter(F.col("band_sig").isNotNull())
    return keyed.groupBy("band_sig").applyInPandasWithState(
        functools.partial(_neardup_state_func, timeout_ms=timeout_ms),
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=_NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


def stream_neardup_docs(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    band_idx: int = 0,
):
    """File-source stream of (url, text) docs → streaming near-dup
    blocking → parquet sink.  maxFilesPerTrigger=1 forces near-dups to
    arrive in LATER micro-batches, exercising cross-batch band state."""
    docs = (
        spark.readStream.schema(NEARDUP_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        neardup_candidates_stream(docs, band_idx=band_idx)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_docs(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    watermark: str = "1 hour",
):
    """File-source stream of document events → watermarked exact dedup
    → parquet sink.  maxFilesPerTrigger=1 forces duplicates to arrive
    in LATER micro-batches, exercising cross-batch dedup state."""
    docs = (
        spark.readStream.schema(DOC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        dedup_documents_stream(docs, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_assemble_docs(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    timeout_ms: int = 60_000,
):
    """File-source stream of page events → stateful reassembly →
    parquet sink (append).  maxFilesPerTrigger=1 forces documents to
    span micro-batches, exercising cross-batch state."""
    events = (
        spark.readStream.schema(PAGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    docs = assemble_documents_stream(events, timeout_ms=timeout_ms)
    return (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def clean_documents_stream(docs, event_time_col: str = "warc_ts",
                           watermark: str = "1 hour"):
    """Streaming face of the corpus-cleaning funnel: the SAME language
    + quality gate arithmetic as the batch funnel
    (textstats.cleaning_gate_exprs — stateless projections, so they
    attach to a stream unchanged) followed by first-copy exact dedup
    on the content fingerprint via ``dropDuplicatesWithinWatermark``
    (bounded state — see :func:`dedup_documents_stream` for why plain
    dropDuplicates is wrong here).

    A crawler ingest loop runs THIS; the batch funnel over the
    accumulated sink is the full-history backstop with byte-identical
    gate decisions."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        cleaning_gate_exprs,
    )

    pass_lang, pass_quality = cleaning_gate_exprs()
    gated = docs.filter((pass_lang == 1) & (pass_quality == 1))
    return gated.withWatermark(
        event_time_col, watermark
    ).dropDuplicatesWithinWatermark(["fingerprint"])


def stream_clean_docs(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    watermark: str = "1 hour",
):
    """File-source stream of document events → gates + watermarked
    dedup → parquet sink.  maxFilesPerTrigger=1 forces duplicates into
    later micro-batches, exercising cross-batch dedup state behind the
    stateless gates."""
    docs = (
        spark.readStream.schema(DOC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        clean_documents_stream(docs, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_ingest_stats_stream(docs, window_dur: str = "10 minutes",
                                 watermark: str = "10 minutes",
                                 event_time_col: str = "warc_ts"):
    """Watermarked tumbling-window ingest dashboard — the canonical
    Structured Streaming windowed aggregation over the crawl event
    stream: per event-time window, how many documents and tokens
    arrived.  The watermark bounds state (a window's aggregate is
    dropped once the watermark passes its end) AND defines the
    late-data contract: an event older than the watermark is dropped,
    never retro-mutating an already-finalized window — exactly the
    semantics a downstream consumer of append-mode output requires.

    At production scale this is one shuffle per micro-batch on the
    window key with partial aggregation map-side — the same profile as
    the batch per-source agg."""
    from pyspark.sql import functions as F

    n_tokens = F.size(F.split("text", " ", -1))
    return (
        docs.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window_dur).alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tokens).alias("n_tokens"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs",
            "n_tokens",
        )
    )


def stream_ingest_stats(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    window_dur: str = "10 minutes",
    watermark: str = "10 minutes",
):
    """File-source stream → watermarked windowed agg → parquet sink in
    APPEND mode (a window row is written once, when the watermark
    finalizes it)."""
    docs = (
        spark.readStream.schema(DOC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        windowed_ingest_stats_stream(
            docs, window_dur=window_dur, watermark=watermark
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# -- streaming per-host admission cap ----------------------------------

DOMAINCAP_OUT_SCHEMA = "url string, host string, host_seq bigint, admitted int"
_DOMAINCAP_STATE_SCHEMA = "n_seen bigint"


def _domain_cap_state_func(key, pdfs, state, cap: int = 5,
                           timeout_ms: int = 86_400_000):
    """applyInPandasWithState body for streaming domain capping: a
    per-host counter admits the first ``cap`` pages and flags the rest
    — the online face of webclean.domain_cap_report (C4/RefinedWeb's
    per-host frequency guard applied at INGEST, before storage is paid,
    instead of at corpus-build time).

    Online semantics are arrival-order; within one micro-batch the
    arrival order is made deterministic by url sort so replays and
    tests are stable.  State is ONE bigint per host seen inside the
    timeout horizon — bounded by live-host cardinality, not stream
    length — and processing-time timeout evicts idle hosts (a re-seen
    evicted host starts a fresh budget: the cap is per-horizon, which
    is what a crawl window wants)."""
    import pandas as pd

    host = key[0]
    if state.hasTimedOut:
        state.remove()
        return
    n = state.get[0] if state.exists else 0
    rows = []
    for pdf in pdfs:
        rows.extend(pdf.itertuples(index=False))
    rows.sort(key=lambda r: r.url)
    urls, seqs, adm = [], [], []
    for row in rows:
        n += 1
        urls.append(row.url)
        seqs.append(n)
        adm.append(1 if n <= cap else 0)
    state.update((n,))
    state.setTimeoutDuration(timeout_ms)
    yield pd.DataFrame(
        {
            "url": urls,
            "host": [host] * len(urls),
            "host_seq": pd.array(seqs, dtype="int64"),
            "admitted": pd.array(adm, dtype="int32"),
        }
    )


def domain_cap_stream(docs, cap: int = 5, timeout_ms: int = 86_400_000):
    """Streaming per-host admission cap: (url, host, host_seq,
    admitted) — admitted=0 pages are the ones a storage-frugal ingest
    drops on the floor.

    The host key is a ROW-LOCAL projection (the same host rules as
    urlnorm/webclean), so the only stateful stage is the host-keyed
    counter; at crawl scale the shuffle is host-keyed with live-host
    state only."""
    import functools

    from pyspark.sql import functions as F

    from .training.webclean import host_of

    keyed = docs.select(
        "url",
        F.regexp_replace(host_of(F.col("url")), r"^www\.", "").alias("host"),
    ).filter(F.col("host") != "")
    return keyed.groupBy("host").applyInPandasWithState(
        functools.partial(_domain_cap_state_func, cap=cap,
                          timeout_ms=timeout_ms),
        outputStructType=DOMAINCAP_OUT_SCHEMA,
        stateStructType=_DOMAINCAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


def stream_domain_cap(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    cap: int = 5,
):
    """File-source stream of (url, text) docs → streaming domain cap →
    parquet sink.  maxFilesPerTrigger=1 forces same-host arrivals into
    LATER micro-batches, exercising the cross-batch counter."""
    docs = (
        spark.readStream.schema(NEARDUP_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        domain_cap_stream(docs, cap=cap)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
