"""Physical-plan regression gates: the plan-shape properties the scale
design depends on (broadcast dimension joins, column pruning to the
scan, materialized fan-out roots, no accidental cartesian products)
asserted on the EXECUTED plan string, so a refactor that silently
degrades a plan fails here rather than in a 100 TB run."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _op_exchanges(p: str) -> int:
    """Exchange count excluding the small-input parallelism dispatch
    (ensure_scan_parallelism's REPARTITION_BY_NUM, r6): that exchange
    exists only on degenerate tiny-SF scans and never at real split
    counts, so plan pins count the OPERATOR's own shuffles."""
    return p.count("Exchange") - p.count("REPARTITION_BY_NUM")


def test_broadcast_join_revenue_uses_broadcast(spark):
    from pvsyst_pdf_parser_spark import demo_queries as Q

    p = _plan(Q.broadcast_join_revenue(spark, SF))
    assert "BroadcastHashJoin" in p  # dims under the broadcast threshold
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_q1_scan_prunes_columns(spark):
    from pvsyst_pdf_parser_spark import demo_queries as Q

    p = _plan(Q.q1_pricing_summary(spark, SF))
    # projection pruning must reach the parquet scan: unused wide
    # columns may not appear anywhere in the plan
    assert "l_comment" not in p
    assert "l_shipdate" not in p
    # map-side partial aggregation (two HashAggregate levels)
    assert p.count("HashAggregate") >= 2


def test_extraction_scan_reads_only_needed_columns(spark, pages_parquet):
    from pvsyst_pdf_parser_spark.pipeline import extract_documents

    p = _plan(extract_documents(spark.read.parquet(pages_parquet)))
    assert "ReadSchema: struct<url:string,html:binary,text:string>" in p
    assert "CartesianProduct" not in p
    # fan-out roots are materialized: the decode subtree must appear as
    # a cached relation, not N re-executions of the parquet scan
    assert "InMemoryTableScan" in p


def test_dedup_pairs_reuse_materialized_shingles(spark):
    from pvsyst_pdf_parser_spark.training import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # round-2 regression: every one of the shingle frame's 6-8 plan
    # references re-executed the scan + shingle HOF + explode.  With
    # the persist, each reference must be an InMemoryTableScan of the
    # cached frame.  (FileScan still APPEARS once per reference in the
    # plan STRING — it is part of the cached relation's description,
    # not a re-execution.)
    p = _plan(D.ngram_jaccard_pairs(docs, max_df=10))
    assert p.count("InMemoryTableScan") >= 3  # sizes + both join sides
    p2 = _plan(D.minhash_lsh_verified(docs))
    assert p2.count("InMemoryTableScan") >= 4  # signatures + verify refs


def test_ann_joins_are_not_cartesian(spark):
    from pvsyst_pdf_parser_spark.training import simsearch as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    for df in (S.multiband_topk(emb), S.ivf_topk(emb)):
        p = _plan(df)
        assert "CartesianProduct" not in p  # bucket/cell equi-joins only


def test_salted_agg_is_two_phase(spark):
    from pvsyst_pdf_parser_spark import demo_queries as Q

    p = _plan(Q.salted_hot_key_agg(spark, SF))
    # phase 1 (key, salt) agg + phase 2 (key) agg, each with its own
    # partial/final pair
    assert p.count("HashAggregate") >= 4
    assert "CartesianProduct" not in p


def test_unigram_logprob_broadcasts_vocab(spark):
    """The per-token frequency join must BROADCAST the vocab side — a
    sort-merge join here would shuffle the trillion-token occurrence
    side at corpus scale."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.textstats import unigram_logprob_scores

    p = _plan(unigram_logprob_scores(docs))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_url_canonicalize_is_pure_projection(spark):
    """Canonicalization is a map-only plan: no exchange anywhere (at
    10^12 urls this stage must be free)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.urlnorm import canonical_url_stats

    p = _plan(canonical_url_stats(docs))
    assert "Exchange" not in p
    assert "*(1)" in p  # whole-stage-codegen marker: stays JVM-side


def test_corpus_build_shares_one_documents_scan(spark):
    """The composed corpus build (gate -> near-dup dedup -> budget) must
    fan out from the PERSISTED funnel-flag frame: every downstream
    consumer (gate aggregate, shingle pipeline, keeper join, budget
    cursor) reads the cached relation, so the documents parquet is
    executed once.  A raw FileScan outside a cached-relation
    description would mean a branch silently re-reads the corpus —
    the recompute-amplification bug class at 10^12 docs."""
    from pvsyst_pdf_parser_spark.training.corpus import corpus_build_report

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(corpus_build_report(docs))
    # flagged fan-out: gate aggregate + keeper-size join + kept branch
    # all read the cached relation (the shingle branch consumed it
    # eagerly inside the CC fixpoint loop and re-enters via the
    # localCheckpoint below, so it is absent from this final plan)
    assert p.count("InMemoryTableScan") >= 3
    # the CC result re-enters as a checkpointed RDD, not a recompute
    assert "ExistingRDD" in p
    # every FileScan line in the plan is the pruned cached-relation
    # child (InMemoryRelation prints its cached plan); a raw re-read
    # of the corpus would surface an un-pruned or extra scan
    for line in p.splitlines():
        if "FileScan parquet" in line:
            assert "[doc_id#" in line and "text#" in line, line
    assert "CartesianProduct" not in p


def test_decontam_benchmark_side_broadcasts(spark):
    """The eval-set shingles must BROADCAST: a sort-merge join here
    means the trillion-row corpus side shuffles on the shingle key —
    the exact cost the operator exists to avoid."""
    from pvsyst_pdf_parser_spark.training.decontam import decontaminate_report

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(decontaminate_report(docs, n=4))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_fuzzy_decontam_bench_bands_broadcast_no_cartesian(spark):
    """Fuzzy decontam's candidate stage must be a BROADCAST join of the
    tiny benchmark bands against the corpus bands — a corpus-side
    shuffle or a cartesian here is the all-pairs failure mode the
    banded design exists to exclude."""
    from pvsyst_pdf_parser_spark.training.decontam import fuzzy_decontam_report

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(fuzzy_decontam_report(docs, bench_mod=10))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_pii_scrub_is_pure_projection(spark):
    from pvsyst_pdf_parser_spark.training.webclean import pii_scrub_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(pii_scrub_stats(docs))
    # zero shuffle beyond the small-input parallelism dispatch: a free
    # map stage at scale
    assert _op_exchanges(p) == 0
    assert "HashAggregate" not in p and "Window" not in p


def test_paragraph_dedup_single_window_no_cartesian(spark):
    """Paragraph dedup must cost ONE corpus-wide shuffle (the para-keyed
    window) + the per-doc re-aggregation — the exact-dedup shuffle
    profile on a finer key, never a self-join."""
    from pvsyst_pdf_parser_spark.training.paragraphs import (
        dedup_paragraphs_report,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(dedup_paragraphs_report(docs))
    assert p.count("Window") == 1
    assert _op_exchanges(p) <= 2  # window key + doc_id agg
    assert "CartesianProduct" not in p and "Join" not in p


def test_quality_model_score_is_literal_projection(spark):
    """The frozen-model score is a pure HOF projection — the weights
    enter as an array literal, no Python UDF, and the only exchange in
    the report is the final per-source aggregate (scoring itself is a
    free map stage over 10^12 docs)."""
    import json

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.qualitymodel import (
        quality_model_report,
    )

    with open("fixtures/quality_model.json") as f:
        m = json.load(f)
    p = _plan(quality_model_report(docs, m["weights"], m["bias"]))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert _op_exchanges(p) == 1  # the groupBy(source) agg only


def test_bloom_gate_is_inset_probe_no_probe_side_shuffle(spark):
    """The Bloom incremental-dedup gate must stay an O(1) literal-mask
    probe over the new batch (r6: one m-slot array literal indexed with
    element_at — replaced the r5 three-IN-list InSet form, which paid
    ~6k plan literals per run) — no Python eval, no sort-merge join,
    and the only exchanges belong to the PRIOR side (distinct-hash agg
    + its broadcast): the trillion-row probe side never shuffles."""
    from pvsyst_pdf_parser_spark.training.crawl import (
        bloom_incremental_dedup,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(bloom_incremental_dedup(docs))
    assert "element_at" in p  # literal bit-mask probed O(1) per hash
    assert "BroadcastHashJoin" in p  # exact verification is broadcast
    assert "SortMergeJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange") <= 2  # prior-side agg + broadcast only


def test_exact_substring_windows_are_rowlocal_one_corpus_shuffle(spark):
    """ExactSubstr's k-gram windows must be built row-locally (array
    HOFs, no Python eval) and the corpus-wide cost must be the ONE
    window-hash exchange + the doc-key fold-back — never a cartesian
    or a per-window explosion join."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        exact_substring_dedup_report,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(exact_substring_dedup_report(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    # wkey window + dup doc-agg + join-side exchanges + final sort
    assert p.count("Exchange") <= 6, p


def test_bpe_merge_round_is_broadcast_fold_no_python(spark):
    """Each BPE training round must stay JVM-side (the greedy fold is
    an aggregate HOF, not a UDF) and the 1-row merge pair must re-enter
    the bounded word table via a broadcast nested-loop join — never a
    shuffled join on the word side."""
    from pyspark.sql import functions as F

    from pvsyst_pdf_parser_spark.training import bpe

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    words = bpe._word_table(docs, bpe.BPE_MAX_WORD_LEN).select(
        "word", "cnt",
        F.regexp_extract_all("word", F.lit("."), 0).alias("syms"),
    )
    top = (
        bpe._pair_counts(words)
        .orderBy(F.col("pair_count").desc(), "a", "b")
        .limit(1)
    )
    p = _plan(bpe._apply_merge(words, top))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_robots_rules_broadcast_url_side_single_window_exchange(spark):
    """The robots rule table must BROADCAST (bounded hosts × prefixes)
    and the url side must reach the verdict window without its own
    pre-join shuffle; everything stays JVM-side."""
    from pvsyst_pdf_parser_spark.training.crawl import robots_filter_report

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(robots_filter_report(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Broadcast" in p          # hash or nested-loop, rules side
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_winnowing_is_pure_projection_no_join_no_python(spark):
    """Winnowing is row-local end to end: no joins, no Python eval;
    the only exchanges are the final presentation sort plus (on a
    degenerate one-row-group scan only) the small-input parallelism
    dispatch — at real split counts the dispatch is a no-op and the
    sort exchange is the single one left."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        winnowing_fingerprints,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(winnowing_fingerprints(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p
    assert p.count("Exchange") <= 2, p  # dispatch + sort
    # the dispatch must vanish when the scan is already parallel:
    # a many-partition in-memory frame keeps the plan at sort-only
    wide = docs.repartition(64, "doc_id")
    pw = _plan(winnowing_fingerprints(wide))
    # input repartition(64) + presentation sort — winnowing itself
    # must not add a third
    assert pw.count("Exchange") <= 2, pw


def test_sequence_pack_chunks_bounded_exchanges_no_python(spark):
    """Materialized packing: one source-key window exchange + one
    chunk-key agg exchange + the final sort — and no Python eval (the
    reassembly is sort_array/transform inside the agg)."""
    from pvsyst_pdf_parser_spark.training.sampling import (
        sequence_pack_chunks,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(sequence_pack_chunks(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p
    assert p.count("Exchange") <= 3, p


def test_mojibake_repair_is_pure_projection(spark):
    """Encoding repair is a map-only plan: no exchange, no Python —
    at 10^12 docs this stage must be free (same gate class as url
    canonicalization and PII scrub)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.encoding import (
        mojibake_repair_stats,
    )

    p = _plan(mojibake_repair_stats(docs))
    assert _op_exchanges(p) == 0
    assert "BatchEvalPython" not in p


def test_frontier_slots_single_host_exchange(spark):
    """Both windows (fetch_seq rank + host page count) must ride ONE
    host-keyed exchange — the second window reuses the partitioning.
    Slot assignment adds no exchange (pure hash projection)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.crawl import frontier_slots_report

    p = _plan(frontier_slots_report(docs))
    assert p.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_domain_cap_single_host_exchange(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.webclean import domain_cap_report

    p = _plan(domain_cap_report(docs))
    assert p.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in p


def test_tfidf_df_table_is_broadcast(spark):
    """The document-frequency table is vocabulary-bounded and must
    re-enter as a broadcast join — the token frame (trillions of rows
    at scale) shuffles exactly once, on its own aggregate key."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.tfidf import tfidf_top_terms

    p = _plan(tfidf_top_terms(docs))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed+sorted on the same key must join with NO
    Exchange and NO per-task Sort on either side — the pay-the-shuffle-
    once-at-write-time layout fact-to-fact joins rely on at 100 TB."""
    from pvsyst_pdf_parser_spark.scale import colocated_join, write_bucketed

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    left = docs.select("doc_id", "text")
    right = docs.select("doc_id", "source", "n_chars")
    write_bucketed(left, "bj_left", n_buckets=8,
                   path=str(tmp_path / "bj_left"))
    write_bucketed(right, "bj_right", n_buckets=8,
                   path=str(tmp_path / "bj_right"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: this gate is about the
        # co-located SMJ that fact-to-fact joins must fall back on
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        p = _plan(colocated_join(spark, "bj_left", "bj_right"))
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, p
        assert "SelectedBucketsCount" in p or "Bucketed: true" in p, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bj_left")
        spark.sql("DROP TABLE IF EXISTS bj_right")


def test_dsir_feature_table_is_broadcast_no_python(spark):
    """DSIR's log-ratio table is bounded at n_buckets rows and must
    re-enter the per-document side as a BROADCAST join; bigram
    construction is row-local HOFs (no Python UDF anywhere), so the
    corpus pays exactly its aggregation shuffles at 10^12 docs."""
    from pvsyst_pdf_parser_spark.training.dsir import dsir_importance_report

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(dsir_importance_report(docs))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p  # the 1-row totals join broadcasts
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_c4_line_filters_pure_projection(spark):
    """The C4 line rules are row-local list HOFs over each page — the
    report may not shuffle or leave the JVM."""
    from pvsyst_pdf_parser_spark.training.webclean import c4_line_filter_report

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(c4_line_filter_report(docs))
    assert _op_exchanges(p) == 0
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_funnel_attribution_one_window_one_agg(spark):
    """Gate attribution rides the funnel's one text-keyed window; the
    flag aggregate adds a map-side-combined <=8-key shuffle and the ppm
    window runs over the aggregate output, never the corpus."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        funnel_attribution_stats,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(funnel_attribution_stats(docs))
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2  # partial + final on the mask key
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_semdedup_cell_equijoin_and_broadcast_centroids(spark):
    """SemDeDup's pairwise stage is an equi-join on the cell key (never
    a cross join) and the n_cells-row centroid table enters as a
    broadcast join; assignment is the one Arrow map stage."""
    from pvsyst_pdf_parser_spark.training.simsearch import semdedup_keepers

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(semdedup_keepers(emb))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p  # the centroid table


def test_quality_threshold_cutoff_join_is_broadcast(spark):
    """The per-lang cutoff table (~#langs rows) must come back as a
    BroadcastHashJoin — a sort-merge join here would shuffle the full
    scored corpus a second time at 10^12 docs."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.calibrate import (
        quality_threshold_by_lang,
    )

    p = _plan(quality_threshold_by_lang(docs))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_quality_drift_psi_single_lowcard_agg_no_python(spark):
    """PSI = one 10-key hash aggregate (partial_ prefix proves the
    map-side combine that makes the shuffle ~10 rows/partition) plus
    the tiny window over 10 bin rows; no Python, no join."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pvsyst_pdf_parser_spark.training.calibrate import quality_drift_psi

    p = _plan(quality_drift_psi(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_sum" in p  # map-side combine before the bin shuffle
    assert "Join" not in p


def test_pq_adc_lut_is_broadcast_never_cartesian(spark):
    """The ADC lookup table (n_queries × M × K rows) must re-enter the
    corpus-sized code frame as a BROADCAST join, and the encode path
    must stay the pq_encode map stage — no cartesian product anywhere
    (all-pairs rescoring is the failure mode ADC exists to avoid)."""
    from pvsyst_pdf_parser_spark.training.simsearch import pq_adc_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(pq_adc_topk(emb))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_ivf_pq_candidates_are_cell_bounded(spark):
    """IVFADC must never degenerate to all-pairs: candidates ride the
    cell-keyed posting-list join and codes join the bounded candidate
    frame; the lut stays broadcast."""
    from pvsyst_pdf_parser_spark.training.simsearch import ivf_pq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(ivf_pq_topk(emb))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bm25_query_terms_are_broadcast(spark):
    """The n_terms query table is constant-bounded and must re-enter
    the tf frame as a BROADCAST join; the only sort-merge exchange
    allowed is the corpus-keyed dl join (both sides corpus-sized)."""
    from pvsyst_pdf_parser_spark.training.tfidf import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(bm25_topk(docs))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bpe_encode_is_jvm_projection_one_agg(spark):
    """The chained-replace encode is pure JVM codegen — no Python in
    the plan — and since r6 it runs once per DISTINCT word (dictionary
    encode): the plan is word-explode → distinct-word agg → encode
    projection → join back → doc_id re-agg.  Exchanges: the distinct
    agg, the (AQE-broadcastable) join alignment, and the final re-agg;
    crucially the K-replace chain sits ABOVE the distinct, never on the
    occurrence stream."""
    from pvsyst_pdf_parser_spark.training.bpe import bpe_encode_stats

    import __spark_entry__ as entry

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(bpe_encode_stats(docs, entry._bpe_merges()))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert _op_exchanges(p) <= 4  # distinct + join align + re-agg
    assert "InMemoryTableScan" in p  # word frame persisted, not re-run


def test_global_ranks_never_single_partition_window(spark):
    """Corpus- and vocabulary-sized global ranks must plan as
    TakeOrderedAndProject (top-k paths: BM25's two ranked selections,
    the posting-list term cut) or as a range exchange + local rank +
    broadcast offset join (shard_assignment's every-row LPT rank) —
    never as an unpartitioned window over the full frame."""
    import pyspark.sql.functions as F

    from pvsyst_pdf_parser_spark.training.cache import release_persisted
    from pvsyst_pdf_parser_spark.training.sampling import (
        shard_assignment_stats,
    )
    from pvsyst_pdf_parser_spark.training.tfidf import (
        bm25_topk,
        inverted_postings,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    try:
        p = _plan(bm25_topk(docs))
        assert "TakeOrderedAndProject" in p
        p = _plan(inverted_postings(docs))
        assert "TakeOrderedAndProject" in p

        p = _plan(shard_assignment_stats(docs))
        assert "rangepartitioning" in p.lower()  # the sampled range exchange
        # every Window in the plan is either partition-local (_gpart) or
        # over the bounded per-partition offset table — no corpus-sized
        # global sort into one task
        assert "Window" in p and "_gpart" in p
    finally:
        release_persisted()


def test_global_row_number_matches_single_task_rank(spark):
    """global_row_number must be byte-identical to the unpartitioned
    window it replaces, including across range-partition boundaries."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from pvsyst_pdf_parser_spark.training.cache import release_persisted
    from pvsyst_pdf_parser_spark.training.rankutil import global_row_number

    df = spark.range(0, 997).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(31)).alias("k"),
    )
    order = [F.col("k").desc(), F.col("id").asc()]
    try:
        got = {
            r["id"]: r["rk"]
            for r in global_row_number(df, order, "rk", num_partitions=7)
            .collect()
        }
    finally:
        release_persisted()
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        ).collect()
    }
    assert got == want


def test_jl_projection_is_literal_map_stage(spark):
    """jl_project must stay a pure JVM projection: the ±1 sign arrays
    enter as constant-folded literals (no per-row sequence/transform
    rebuild), no Python eval, and ZERO exchanges — the projection is a
    free map stage over the trillion-row embedding table."""
    from pvsyst_pdf_parser_spark.training.simsearch import jl_project

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(jl_project(emb))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p
    assert "sequence(" not in p  # literals folded at plan time


def test_trigram_model_tables_broadcast_no_python(spark):
    """All five model-side joins of the Stupid Backoff scorer must be
    broadcasts (the pruned tri/bi tables and the vocab-sized unigram
    table), the corpus side must never sort-merge or cartesian, and
    the whole chain stays JVM-side."""
    from pvsyst_pdf_parser_spark.training import textstats as X

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(X.trigram_backoff_scores(docs))
    assert p.count("BroadcastHashJoin") >= 4
    assert "BroadcastNestedLoopJoin" in p  # the bounded 1-row total
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_weighted_sample_is_take_ordered(spark):
    """The A-ES weighted sample must plan as TakeOrderedAndProject
    (per-partition top-k, bounded driver merge) — never a global sort
    or a corpus-sized single-partition window."""
    from pvsyst_pdf_parser_spark.training import sampling as SA

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(SA.weighted_sample_topk(docs))
    assert "TakeOrderedAndProject" in p
    # the only Window in the plan ranks the ≤ k merged rows, which sit
    # in a single bounded partition by construction; no global Sort of
    # the corpus may appear outside it
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_zorder_key_is_pure_projection_one_agg(spark):
    """Morton-key derivation must be a zero-exchange JVM projection;
    the only shuffle is the bounded per-file stats fold."""
    from pvsyst_pdf_parser_spark.training import zorder as Z

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(Z.zorder_file_stats(docs))
    assert p.count("Exchange") <= 2  # agg exchange + orderBy of ≤ n_files
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("HashAggregate") >= 2  # map-side partials


def test_salted_skew_join_shape(spark):
    """The salted join must actually join on (key, salt) through a
    shuffled hash join (the hint pins it even at demo scale where the
    dim would auto-broadcast) — that is the skew-splitting exchange
    the operator exists to demonstrate."""
    from pvsyst_pdf_parser_spark import demo_queries as Q

    p = _plan(Q.salted_skew_join(spark, SF))
    assert "ShuffledHashJoin" in p
    assert "salt" in p  # the salt column participates in the join keys
    assert "CartesianProduct" not in p


def test_bitext_mine_equijoins_only(spark):
    """Bitext candidates come from the page-key equi-join and two
    id-keyed embedding joins — never a cross join — and the whole
    operator stays JVM-side (cosine is a zip_with/aggregate HOF)."""
    from pvsyst_pdf_parser_spark.training.bitext import bitext_mine

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(bitext_mine(docs, emb))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_domain_quality_prior_broadcasts_totals(spark):
    """The corpus-mean side is ONE row: its re-entry must broadcast,
    and the document side shuffles exactly once (the host groupBy);
    everything is JVM-side arithmetic."""
    from pvsyst_pdf_parser_spark.training.webclean import domain_quality_prior

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(domain_quality_prior(docs))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # 1-row totals enter via broadcast (BroadcastExchange/NestedLoop on
    # a 1-row build side is the cheap, correct plan for a keyless join)
    assert "BroadcastExchange" in p
    # host is computed in the same projection as the score: no doc_id
    # self-join may appear
    assert "SortMergeJoin" not in p


def test_unimax_corpus_agg_then_tiny_table(spark):
    """UNIMAX's only corpus-sized work is the lang-keyed aggregation
    (map-side combined: two HashAggregate levels); the waterfill
    windows run on the bounded language table, JVM-side throughout."""
    from pvsyst_pdf_parser_spark.training.sampling import unimax_budgets

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(unimax_budgets(docs))
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_source_overlap_reuses_shingle_frame(spark):
    """The distinct per-source shingle frame fans out to the self-join
    sides and the sizes agg — it must be materialized once, and the
    self-join is a shingle equi-join, never a cross join."""
    from pvsyst_pdf_parser_spark.training.dedup import source_overlap

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(source_overlap(docs))
    assert p.count("InMemoryTableScan") >= 3
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_corpus_datasheet_one_window_one_agg(spark):
    """The datasheet must cost the cleaning funnel's shuffle profile:
    ONE text-keyed window + one map-side-combined (source, lang) agg,
    all JVM-side."""
    from pvsyst_pdf_parser_spark.training.textstats import corpus_datasheet

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(corpus_datasheet(docs))
    assert p.count("Window") == 1
    assert p.count("HashAggregate") >= 2  # partial + final
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_minhash_calibration_shares_one_shingle_frame(spark):
    """Exact pairs, sizes, AND signatures all derive from ONE
    materialized shingle frame; the pair join is a shingle equi-join,
    JVM-side throughout."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        minhash_estimate_calibration,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(minhash_estimate_calibration(docs))
    assert p.count("InMemoryTableScan") >= 4
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_incremental_pairs_shingle_keyed_no_cartesian(spark):
    """The daily-increment pair plan must keep both the stored
    (exist×exist) and increment (new×all) joins shingle-keyed — never
    cartesian — and run every shingle reference off the ONE persisted
    shingle frame (4 refs: stored×2, incr×2; sizes ride the shingle
    rows since r6 — doc_shingles_sized — instead of a 5th reference
    joined onto the pair frame)."""
    from pvsyst_pdf_parser_spark.training import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(D.incremental_near_dup_pairs(docs))
    assert "CartesianProduct" not in p
    assert p.count("InMemoryTableScan") >= 4


def test_soft_dedup_scalar_frames_broadcast_no_cartesian(spark):
    """SoftDeDup: the shingle-df join stays shingle-keyed (never
    cartesian — only the two ONE-ROW scalar frames re-enter as
    broadcast nested loop), and no window runs over the corpus."""
    from pvsyst_pdf_parser_spark.training import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(D.soft_dedup_weights(docs))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # the scalar total/mean rows
    assert "Window" not in p


def test_doremi_one_corpus_shuffle_then_vocab_tables(spark):
    """DoReMi: the per-(source, token) aggregation is the only
    corpus-wide stage; the marginal joins are hash/broadcast keyed,
    never cartesian, and nothing windows over the corpus."""
    from pvsyst_pdf_parser_spark.training import sampling as SA

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(SA.doremi_weights(docs))
    assert "CartesianProduct" not in p
    assert "Window" not in p
    # scalar grand-total / normalizer frames enter as broadcast
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_length_bucket_batches_single_agg_no_window(spark):
    """Length-bucket profile: one ladder-keyed aggregate (map-side
    combined), no window, no join of any kind."""
    from pvsyst_pdf_parser_spark.training import sampling as SA

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(SA.length_bucket_batch_stats(docs))
    assert "Join" not in p and "Window" not in p
    assert p.count("HashAggregate") <= 4  # partial+final, nothing more


def test_link_hits_cached_final_frames_no_cartesian(spark):
    """HITS: the final auth and hub frames fan out (max broadcasts +
    the scored join), so the FINAL plan must read them from cache
    (InMemoryTableScan — not a re-execution of the iteration chain per
    reference), and the only nested-loop joins are the two one-row max
    broadcasts."""
    from pvsyst_pdf_parser_spark.training import crawl as CR

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(CR.link_hits(docs, iters=2))
    assert "CartesianProduct" not in p
    assert p.count("InMemoryTableScan") >= 2  # cached auth + hub
    assert "BroadcastNestedLoopJoin" in p  # the one-row max frames


def test_quality_reliability_single_agg_no_join(spark):
    """Reliability binning: one score projection + one n_bins-group
    aggregate — no join, no window, nothing corpus-wide after the agg."""
    import json

    from pvsyst_pdf_parser_spark.training import qualitymodel as QM

    with open("fixtures/quality_model.json") as f:
        m = json.load(f)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(QM.quality_reliability_report(docs, m["weights"], m["bias"]))
    assert "Join" not in p and "Window" not in p


def test_span_corruption_zero_shuffle_projection(spark):
    """Span corruption is entirely row-local: the executed plan may not
    contain ANY exchange, join, window, or aggregate."""
    from pvsyst_pdf_parser_spark.training import sampling as SA

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(SA.span_corruption_stats(docs))
    assert _op_exchanges(p) == 0
    for op in ("Join", "Window", "HashAggregate"):
        assert op not in p, op


def test_kneser_ney_model_tables_broadcast(spark):
    """KN scoring: all three model tables (pruned c12, left context,
    continuation) plus the one-row type total must BROADCAST into the
    pair side — a sort-merge join would shuffle the trillion-pair
    corpus once per table."""
    from pvsyst_pdf_parser_spark.training import textstats as X

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(X.kneser_ney_scores(docs))
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_hashed_embedding_zero_shuffle_projection(spark):
    """The hashing-trick embedding is one map pass: no exchange, no
    join, no aggregate anywhere in the executed plan."""
    from pvsyst_pdf_parser_spark.training import simsearch as S

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(S.hashed_doc_embedding(docs))
    for op in ("Exchange", "Join", "HashAggregate", "Window"):
        assert op not in p, op


def test_normalized_dedup_one_shuffle_window(spark):
    """Normalized-key dedup must cost ONE corpus-wide shuffle (the
    md5-key window) — the exact-dedup profile on the 32-byte hashed
    key, never a self-join."""
    from pvsyst_pdf_parser_spark.training import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(D.normalized_exact_dedup(docs))
    assert "Join" not in p
    # operator-owned exchanges only (the degenerate-scan dispatch
    # repartition is excluded by convention — no-op at real splits)
    assert _op_exchanges(p) == 1


def test_zipf_heaps_bounded_topk_no_sortmerge(spark):
    """Corpus-law report: top-k selection must be a distributed
    TakeOrdered (never a global sort of the vocabulary), the regression
    runs on the bounded table, and the scalar totals broadcast."""
    from pvsyst_pdf_parser_spark.training import textstats as X

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(X.zipf_heaps_report(docs))
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_script_mix_is_pure_projection(spark):
    """Script detection is a map-only plan: five regexp-class counts +
    integer ppm arithmetic per row, no exchange except the presentation
    sort — free at 10^12 docs."""
    from pvsyst_pdf_parser_spark.training.textstats import script_mix_report

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(script_mix_report(docs))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p
    assert _op_exchanges(p) <= 1, p  # rangepartitioning for the sort


def test_simhash_calibration_bounded_joins_no_cartesian(spark):
    """Calibration candidates must come from the pigeonhole equi-join
    and the exact side must touch only candidate pairs via token-keyed
    equi-joins of the persisted count frame — never a cartesian."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        simhash_estimate_calibration,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(simhash_estimate_calibration(docs))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the token-count frame is persisted and feeds norms + both dot
    # sides from the cache
    assert p.count("InMemoryTableScan") >= 3


def test_cluster_silhouette_broadcasts_centroids_no_cartesian(spark):
    """Silhouette audit: the n_cells-row centroid table must enter as
    broadcast joins (never shuffled against the corpus) and the
    assignment matmul is the only Python stage."""
    from pvsyst_pdf_parser_spark.training.simsearch import (
        cluster_silhouette_report,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(cluster_silhouette_report(emb))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p, p


def test_hill_tail_index_bounded_topk(spark):
    """Hill estimator: the corpus-wide stage is ONE TakeOrdered top-65
    (never a global sort); the k-grid joins against the bounded frame
    via broadcast nested loop (range condition, 65x3 rows)."""
    from pvsyst_pdf_parser_spark.training.textstats import hill_tail_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(hill_tail_index(docs))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p, p


def test_stopword_drift_single_agg_no_join(spark):
    """Drift regression is one projection + one map-side-combined
    groupBy(source): no joins, no Python, at most the agg exchange plus
    a presentation exchange."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        stopword_drift_regression,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(stopword_drift_regression(docs))
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange") <= 2, p


def test_quality_threshold_budget_broadcasts_thresholds(spark):
    """Gate calibration: the per-source threshold table (|sources|
    rows) must broadcast back over the scored frame — a SortMergeJoin
    there would re-shuffle the whole corpus twice."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        quality_threshold_budget,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(quality_threshold_budget(docs))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_detector_agreement_no_cartesian_bounded_buckets(spark):
    """Agreement audit: both detector sides keep their bounded
    bucket-join shapes and the pair-key comparison never degenerates
    to a cartesian product."""
    from pvsyst_pdf_parser_spark.training.dedup import detector_agreement

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(detector_agreement(docs))
    assert "CartesianProduct" not in p
