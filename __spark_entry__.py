"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on /root/testdata/sf0.001.
``queries()`` — one entry per implemented operator class from
SURVEY.md §2 plus the training-data operators (dedup, similarity
search, text analysis, multimodal plumbing).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for each query.  The
pvsyst_extract smoke has a full differential oracle: its SQL reads the
committed reference-golden parquet (the reference parser's own output
for the same fixture docs) so the hash compare is Spark vs reference.

Column names/rounding/tiebreaks are aligned between both sides so the
driver's order-insensitive value-hash matches (see demo_queries.py and
training/ for the Spark implementations).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pvsyst_pdf_parser_spark import demo_queries as Q  # noqa: E402
from pvsyst_pdf_parser_spark.training import calibrate as CA  # noqa: E402
from pvsyst_pdf_parser_spark.training import corpus as C  # noqa: E402
from pvsyst_pdf_parser_spark.training import bitext as BT  # noqa: E402
from pvsyst_pdf_parser_spark.training import bpe as B  # noqa: E402
from pvsyst_pdf_parser_spark.training import crawl as CR  # noqa: E402
from pvsyst_pdf_parser_spark.training import decontam as DC  # noqa: E402
from pvsyst_pdf_parser_spark.training import dsir as DS  # noqa: E402
from pvsyst_pdf_parser_spark.training import encoding as EN  # noqa: E402
from pvsyst_pdf_parser_spark.training import dedup as D  # noqa: E402
from pvsyst_pdf_parser_spark.training import paragraphs as P  # noqa: E402
from pvsyst_pdf_parser_spark.training import qualitymodel as QM  # noqa: E402
from pvsyst_pdf_parser_spark.training import multimodal as M  # noqa: E402
from pvsyst_pdf_parser_spark.training import sampling as SA  # noqa: E402
from pvsyst_pdf_parser_spark.training import simsearch as S  # noqa: E402
from pvsyst_pdf_parser_spark.training import sketches as SK  # noqa: E402
from pvsyst_pdf_parser_spark.training import textstats as X  # noqa: E402
from pvsyst_pdf_parser_spark.training import tfidf as TI  # noqa: E402
from pvsyst_pdf_parser_spark.training import urlnorm as U  # noqa: E402
from pvsyst_pdf_parser_spark.training import webclean as W  # noqa: E402
from pvsyst_pdf_parser_spark.training import zorder as Z  # noqa: E402
from pvsyst_pdf_parser_spark.text import layout as LY  # noqa: E402
from pvsyst_pdf_parser_spark.training.hashing import (  # noqa: E402
    MERSENNE_P,
    perm_params,
)


def _ensure_workers_have_repo(spark: SparkSession) -> None:
    """Python workers resolve UDF closures' module references by import;
    if the driver session wasn't launched from the repo root, ship the
    packages via addPyFile (same content-hashed artifact spark-submit
    jobs pass as --py-files; see packaging.build_package_zip)."""
    from pvsyst_pdf_parser_spark.packaging import build_package_zip

    try:
        spark.sparkContext.addPyFile(build_package_zip(_REPO))
    except Exception:  # noqa: BLE001 - already added / not supported
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (driver checks rows>0)."""
    return Q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


_SMOKE_GOLDENS = os.path.join(_REPO, "fixtures", "smoke_goldens.parquet")
_SPAN_GOLDENS = os.path.join(_REPO, "fixtures", "span_goldens.parquet")


def _trained_centroids() -> list[list[float]]:
    """Frozen Lloyd-trained IVF centroids (scripts/train_ivf.py).  The
    committed JSON is the single source of truth: both the Spark plan
    (numpy closure literals) and the DuckDB oracle (DOUBLE[] literals
    via repr) embed exactly these floats, the same way a production job
    broadcasts retrained model parameters."""
    import json

    with open(os.path.join(_REPO, "fixtures", "ivf_trained_centroids.json")) as f:
        return json.load(f)["centroids"]


def _bpe_merges() -> list:
    """Frozen BPE merge table (scripts/train_bpe.py).  The committed
    JSON is the single source of truth: the Spark encoder embeds the
    merges as closure literals and the DuckDB oracle as chained literal
    replaces — the trained-tokenizer analog of the IVF centroids
    fixture."""
    import json

    with open(os.path.join(_REPO, "fixtures", "bpe_merges.json")) as f:
        return [tuple(m) for m in json.load(f)["merges"]]


def _quality_model() -> dict:
    """Frozen hashed-BoW quality classifier (scripts/train_quality.py):
    class-balanced logistic GD over rule-gate weak labels, weights
    committed as the single source of truth for BOTH engines (same
    contract as the IVF centroids fixture)."""
    import json

    with open(os.path.join(_REPO, "fixtures", "quality_model.json")) as f:
        return json.load(f)


def _pvsyst_field_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule span sink: per-url (field, start, end, value) anchor
    spans over the same deterministic fixture pages as the smoke query.
    The oracle reads fixtures/span_goldens.parquet — the single-process
    span scan over each doc's ground-truth text layer — so the hash
    compare gates the DISTRIBUTED path end-to-end: payload decode,
    per-page explode, order-sensitive doc-text reassembly (any page
    order / separator drift shifts offsets), Arrow span scan, explode."""
    from fixtures.gen import make_docs
    from fixtures.refharness import ensure_span_goldens_parquet

    from pvsyst_pdf_parser_spark.text.spans import extract_field_spans

    _ensure_workers_have_repo(spark)
    ensure_span_goldens_parquet(_SPAN_GOLDENS)
    docs = make_docs(9)
    pages = spark.createDataFrame(
        [(d.url, d.payload, d.text, "en") for d in docs],
        "url string, html binary, text string, lang string",
    )
    return extract_field_spans(pages)


def _pvsyst_extract_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship extraction pipeline on deterministically generated fixture
    pages.  The oracle reads fixtures/smoke_goldens.parquet — the
    REFERENCE parser's output for the same docs (committed; regenerated
    here if absent) — and recomputes the projection in DuckDB, so the
    driver's hash compare is a true Spark-vs-reference differential
    check.  The full byte-identity gate lives in tests/test_golden.py."""
    import pyspark.sql.functions as F

    from fixtures.gen import make_docs
    from fixtures.refharness import ensure_smoke_goldens_parquet

    from pvsyst_pdf_parser_spark.pipeline import extract_documents

    _ensure_workers_have_repo(spark)
    ensure_smoke_goldens_parquet(_SMOKE_GOLDENS)
    docs = make_docs(9)
    pages = spark.createDataFrame(
        [(d.url, d.payload, d.text, "en") for d in docs],
        "url string, html binary, text string, lang string",
    )
    out = extract_documents(pages)
    return out.select(
        "url",
        "kind",
        "n_pages",
        F.length("extracted_json").alias("json_len"),
        F.get_json_object("extracted_json", "$.metadata.total_inverters")
        .cast("int")
        .alias("total_inverters"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict order IS the driver's run order, and the driver's correctness
    # budget can truncate the tail (it did in round 4: stopped at 50/55).
    # So the queries whose hard signal matters most run FIRST: the
    # flagship whole-pipeline differential, then queries that have never
    # had (or lost) a driver verdict; redundant demo-class relational
    # queries go last — they are the right rows to lose to a truncated
    # run.
    return {
        # flagship extraction (differential hash oracle vs the committed
        # reference-golden parquet; full byte gate in pytest)
        "pvsyst_extract_smoke": _pvsyst_extract_smoke,
        # north-rule span sink (never yet verified - run early)
        "pvsyst_field_spans": _pvsyst_field_spans,
        # Unicode-script detection over the synthesized multiscript
        # fixture (never verified - run early)
        "text_script_detect": lambda s, d: X.script_mix_report(_docs(s, d)),
        # round-5 final-session operators (never verified - run early):
        # Levenshtein-verified near-dup pairs (Lee 2022 NearDup verify
        # metric) over the shingle-blocked candidate set
        "dedup_edit_similarity": lambda s, d: D.edit_similarity_pairs(
            _docs(s, d)
        ),
        # C4 bad-words page filter with exact token-boundary semantics
        # (sentinel blocklist; digest verifies the exact flag set)
        "c4_badwords_filter": lambda s, d: W.badwords_filter_report(
            _docs(s, d)
        ),
        # corpus-level distinct-1/distinct-2 diversity per source
        # (Li 2016) — the per-SOURCE twin of the per-doc TTR gate
        "text_distinct_ngrams": lambda s, d: X.distinct_ngram_diversity(
            _docs(s, d)
        ),
        # greedy k-center (Gonzalez 1985) coreset trace over the
        # embeddings — diversity-based data selection; oracle is the
        # identical recursive-CTE farthest-point traversal
        "kcenter_coreset": lambda s, d: S.kcenter_coreset_trace(_emb(s, d)),
        # round-5 closing operators (never verified - run early):
        # per-cell simplified silhouette over the IVF cells — the
        # quantizer-drift audit for IVF/SemDeDup deployments
        "cluster_silhouette": lambda s, d: S.cluster_silhouette_report(
            _emb(s, d)
        ),
        # Hill MLE tail index of the document-size distribution — the
        # skew audit that decides size-aware packing vs plain hashing
        "hill_tail_index": lambda s, d: X.hill_tail_index(_docs(s, d)),
        # per-source stopword-ratio-vs-length regression — boilerplate
        # drift detector (closed-form moments, one groupBy)
        "stopword_drift": lambda s, d: X.stopword_drift_regression(
            _docs(s, d)
        ),
        # quality-gate calibration to a retention budget (keep best
        # 60% per source) with the tie-overshoot audit
        "quality_threshold_budget": lambda s, d: X.quality_threshold_budget(
            _docs(s, d)
        ),
        # MinHash-vs-SimHash pair-set agreement on one universe — the
        # detectors-interchangeable? audit completing the sketch-QA set
        "detector_agreement": lambda s, d: D.detector_agreement(
            _docs(s, d)
        ),
        # Muennighoff 2023 repeat-epoch decay pricing — what the R-th
        # epoch over a source is worth (fourth mixing lens beside
        # temperature / UNIMAX / DoReMi)
        "repeat_decay_value": lambda s, d: SA.repeat_decay_value(
            _docs(s, d)
        ),
        # banded-LSH candidate recall vs exact Jaccard ground truth —
        # where the S-curve actually sits on this corpus
        "minhash_band_recall": lambda s, d: D.minhash_band_recall(
            _docs(s, d)
        ),
        # pairwise JS divergence between per-source unigram
        # distributions — the distributional twin of source_overlap
        "source_js_divergence": lambda s, d: X.source_js_divergence(
            _docs(s, d)
        ),
        # web-scale url canonicalization over synthesized messy urls
        "url_canonicalize": lambda s, d: U.canonical_url_stats(_docs(s, d)),
        # bitext mining: URL-pattern candidates + embedding-margin
        # verification (ParaCrawl/CCMatrix practice; never verified -
        # run early)
        "bitext_mine": lambda s, d: BT.bitext_mine(_docs(s, d), _emb(s, d)),
        # empirical-Bayes per-host quality shrinkage (never verified)
        "domain_quality_prior": lambda s, d: W.domain_quality_prior(_docs(s, d)),
        # UNIMAX per-language epoch-capped token budgets (never verified)
        "unimax_budgets": lambda s, d: SA.unimax_budgets(_docs(s, d)),
        # inter-source shingle overlap matrix (never verified)
        "source_overlap": lambda s, d: D.source_overlap(_docs(s, d)),
        # per (source, lang) datasheet rollup (never verified)
        "corpus_datasheet": lambda s, d: X.corpus_datasheet(_docs(s, d)),
        # MinHash estimate-vs-exact calibration (never verified)
        "minhash_calibration": lambda s, d: D.minhash_estimate_calibration(
            _docs(s, d)
        ),
        # SimHash Hamming-vs-exact-cosine calibration (never verified -
        # run early)
        "simhash_calibration": lambda s, d: D.simhash_estimate_calibration(
            _docs(s, d)
        ),
        # daily-increment pair plan, batch-identical labels (never
        # verified)
        "dedup_clusters_incremental": lambda s, d: (
            D.incremental_cluster_labels(_docs(s, d))
        ),
        # SoftDeDup inverse-commonness reweighting (never verified —
        # the keep-everything-but-downweight dedup posture)
        "dedup_soft_weights": lambda s, d: D.soft_dedup_weights(_docs(s, d)),
        # DoReMi EG domain-weight update over closed-form KL excess
        # loss (never verified — third mixing recipe beside
        # temperature and UNIMAX)
        "doremi_weights": lambda s, d: SA.doremi_weights(_docs(s, d)),
        # length-bucketed batching ladder with exact padding-waste
        # accounting (never verified — the padding counterpart to
        # sequence packing)
        "length_bucket_batches": lambda s, d: SA.length_bucket_batch_stats(
            _docs(s, d)
        ),
        # HITS hub/authority over the same link graph as PageRank
        # (never verified — the directory-vs-content split a crawl
        # scheduler uses for seed lists)
        "link_hits": lambda s, d: CR.link_hits(_docs(s, d)),
        # reliability-diagram / ECE binning of the frozen quality model
        # vs its weak rule-gate label (never verified)
        "quality_reliability": lambda s, d: (
            lambda m: QM.quality_reliability_report(
                _docs(s, d), m["weights"], m["bias"]
            )
        )(_quality_model()),
        # T5 span-corruption masking profile, hash-deterministic spans
        # with T5's merge-adjacent-sentinels rule (never verified)
        "span_corruption": lambda s, d: SA.span_corruption_stats(_docs(s, d)),
        # interpolated Kneser-Ney bigram NLL/ppl — the KenLM smoothing,
        # completing the LM ladder (never verified)
        "text_kneser_ney": lambda s, d: X.kneser_ney_scores(_docs(s, d)),
        # feature-hashed doc embedding (Weinberger 2009): text -> exact
        # integer ANN-ready vectors, zero shuffle (never verified)
        "hashed_embedding": lambda s, d: S.hashed_doc_embedding(_docs(s, d)),
        # C4/Dolma-style fuzzy-exact dedup on the normalized-text key
        # (never verified)
        "dedup_normalized": lambda s, d: D.normalized_exact_dedup(_docs(s, d)),
        # one-row Zipf slope + Heaps exponent corpus-law diagnostics
        # (never verified)
        "zipf_heaps": lambda s, d: X.zipf_heaps_report(_docs(s, d)),
        # REAL header decode: deterministic PNG/JPEG/GIF payloads whose
        # dimensions are read back from the encoded header fields (pure
        # public-spec byte parsing, no codec library); the oracle
        # replays the generator arithmetic
        "multimodal_image_headers": lambda s, d: (
            _ensure_workers_have_repo(s),
            M.image_header_metadata(_docs(s, d)),
        )[1],
        "multimodal_metadata": lambda s, d: (
            _ensure_workers_have_repo(s),
            M.extract_media_metadata(_docs(s, d)),
        )[1],
        "multimodal_frame_sample": lambda s, d: (
            _ensure_workers_have_repo(s),
            M.sample_frames(_docs(s, d)),
        )[1],
        # same clusters via Kiveris star contraction (giant-component-
        # safe path, auto-dispatched); oracle is the identical
        # recursive-CTE fixpoint.  Failed in r04 (ANSI overflow in the
        # fixpoint probe, fixed in r05) — run early for a fresh verdict.
        "dedup_clusters_stars": lambda s, d: D.dedup_cluster_reps(
            _docs(s, d), algo="stars"
        ),
        # embedding near-dup pairs -> star clusters -> keep/drop verdict
        "dedup_embedding_keepers": lambda s, d: S.embedding_dedup_keepers(
            _emb(s, d)
        ),
        # trained (Lloyd) IVF centroids vs hash anchors, A/B'd on one
        # shared brute-force truth — the driver row that makes the
        # training win visible (recall: trained >= anchors)
        "ann_ivf_trained_recall": lambda s, d: S.ivf_trained_recall_ab(
            _emb(s, d), _trained_centroids()
        ),
        # END-TO-END corpus build: gate -> near-dup dedup -> token-budget
        # mix composed over ONE documents scan (plan-gated in
        # tests/test_plans.py) — the full cleaning-run decision
        "corpus_build": lambda s, d: C.corpus_build_report(_docs(s, d)),
        # JL ±1 random-projection recall report (Achlioptas 2003):
        # recall@k of cosine top-k in 16-dim projected space vs the
        # 64-dim brute-force truth — the measured cost of 4× embedding
        # compression on this corpus (never driver-verified: run early)
        "ann_jl_recall": lambda s, d: S.jl_recall_report(_emb(s, d)),
        # round-5e operators (never yet verified — run early):
        # trigram Stupid Backoff LM scoring (Brants 2007) over pruned
        # broadcast n-gram tables — one order past the bigram scorer
        "text_trigram_backoff": lambda s, d: X.trigram_backoff_scores(
            _docs(s, d)
        ),
        # Efraimidis–Spirakis weighted sampling without replacement as
        # a distributed TakeOrdered top-k (weight = token count)
        "weighted_sample_topk": lambda s, d: SA.weighted_sample_topk(
            _docs(s, d)
        ),
        # Morton-key (z-order) layout: per-output-file min/max bounding
        # boxes over (source-hash, length-bucket) — the two-dimension
        # file-skipping layout for the Iceberg write path
        "zorder_layout": lambda s, d: Z.zorder_file_stats(_docs(s, d)),
        # salted replicated JOIN for the skewed fact key — the join-
        # side twin of salted_hot_key_agg; oracle is the plain join
        "salted_skew_join": Q.salted_skew_join,
        # round-5g (never yet verified — run early): CCNet head/middle/
        # tail perplexity terciles PER LANGUAGE (Wenzek 2020 §4.3) —
        # the tiered-corpus artifact CCNet publishes
        "ccnet_buckets": lambda s, d: CA.ccnet_perplexity_buckets(
            _docs(s, d)
        ),
        # tokenizer fertility per language (Rust 2021): tokens/word and
        # chars/token under the FROZEN trained merge table — the
        # over-segmentation diagnostic for multilingual tokenizers
        "bpe_fertility": lambda s, d: B.bpe_fertility_stats(
            _docs(s, d), _bpe_merges()
        ),
        # round-5d operators (never yet verified — run early):
        # BM25 retrieval for a deterministic mid-frequency query-term
        # set — the search stage on top of the postings machinery
        "bm25_topk": lambda s, d: TI.bm25_topk(_docs(s, d)),
        # PQ asymmetric-distance (ADC) top-k: compressed codes on the
        # database side, exact subvectors on the query side, the lut
        # broadcast — the search stage on top of pq_encode
        "pq_adc_topk": lambda s, d: S.pq_adc_topk(_emb(s, d)),
        # IVFADC: probed posting lists prune, PQ asymmetric distance
        # re-scores — the composed billion-scale ANN architecture
        "ivf_pq_topk": lambda s, d: S.ivf_pq_topk(_emb(s, d)),
        # BPE inference with the FROZEN trained merge table
        # (fixtures/bpe_merges.json, scripts/train_bpe.py): per-doc
        # token counts + an md5 of the full encoded stream
        "bpe_encode": lambda s, d: B.bpe_encode_stats(
            _docs(s, d), _bpe_merges()
        ),
        # round-5c operators (never yet verified — run early):
        # hard-negative mining for contrastive training: per query, the
        # top-k most-similar candidates BELOW the near-dup threshold,
        # candidates from the same multiband bucket join as ann topk
        "ann_hard_negatives": lambda s, d: S.hard_negatives(_emb(s, d)),
        # temperature-based multi-source mixing weights (w_i ∝ n_i^α) +
        # expected token draw and repeat-epochs per source
        "source_mixture": lambda s, d: SA.source_mixture_stats(_docs(s, d)),
        # fuzzy (MinHash-banded) benchmark decontamination: broadcast
        # bench bands, cross-set candidate join, exact-Jaccard verify
        "decontam_fuzzy": lambda s, d: DC.fuzzy_decontam_report(_docs(s, d)),
        # size-balanced output shards: serpentine LPT deal over the
        # byte-rank — the writer-side balance step for training shards
        "shard_assignment": lambda s, d: SA.shard_assignment_stats(_docs(s, d)),
        # quality-curriculum order: integer flag-count phases, md5-hash
        # rank within phase (cleanest documents stream first)
        "curriculum_order": lambda s, d: X.curriculum_order(_docs(s, d)),
        # per-language calibrated quality cutoff (CCNet/FineWeb
        # practice): exact q-th order statistic per lang, broadcast
        # cutoff join; percentile_approx swap documented for 10^12
        "quality_threshold_by_lang": lambda s, d: CA.quality_threshold_by_lang(
            _docs(s, d)
        ),
        # snapshot drift gate: PSI over fixed score bins between the
        # even/odd doc_id halves; one 10-key groupBy, map-side combine
        "quality_drift_psi": lambda s, d: CA.quality_drift_psi(_docs(s, d)),
        # round-5d operators (never yet verified — run early):
        # DSIR importance resampling (Xie 2023): hashed-bigram log-ratio
        # weights in integer micro-nats, target = the quality gate;
        # bounded 128-row feature table broadcasts back
        "dsir_importance": lambda s, d: DS.dsir_importance_report(_docs(s, d)),
        # C4 line-level page cleaning (Raffel 2020 §2.2): terminal-punct
        # / min-words / javascript line rules + page verdict, all
        # row-local HOFs (zero shuffle); kept text md5-verified
        "c4_line_filters": lambda s, d: W.c4_line_filter_report(_docs(s, d)),
        # gate-attribution breakdown of the cleaning funnel: which gate
        # removes what, exactly-one-gate vs multi-gate overlap
        "funnel_attribution": lambda s, d: X.funnel_attribution_stats(
            _docs(s, d)
        ),
        # SemDeDup (Abbas 2023): centroid-partitioned semantic dedup —
        # within-cell cosine pairs, lowest-sim-to-centroid keeper
        "semdedup_keepers": lambda s, d: S.semdedup_keepers(_emb(s, d)),
        # host-keyed train/val split: whole sites on one side (the
        # leakage-safe variant of train_val_split)
        "leakage_safe_split": lambda s, d: SA.leakage_safe_split_stats(
            _docs(s, d)
        ),
        # sliding context windows with stride overlap (HF overflow
        # semantics), every window md5-verified; zero shuffle
        "context_windows": lambda s, d: SA.context_windows(_docs(s, d)),
        # round-5b operators (never yet verified — run early):
        # cp1252-mojibake repair (ftfy-class encoding fixup — literal
        # replace chain, zero shuffle; damage planted deterministically)
        "mojibake_repair": lambda s, d: EN.mojibake_repair_stats(_docs(s, d)),
        # C4/RefinedWeb per-host frequency cap (hash-ordered rank so the
        # survivor set is input-order-free)
        "domain_cap": lambda s, d: W.domain_cap_report(_docs(s, d)),
        # Mercator-style crawl-frontier sharding: host->slot projection
        # + per-host fetch sequence (politeness without coordination)
        "frontier_slots": lambda s, d: CR.frontier_slots_report(_docs(s, d)),
        # top-k TF-IDF terms per doc: one token shuffle, broadcast df
        "tfidf_top_terms": lambda s, d: TI.tfidf_top_terms(_docs(s, d)),
        # capped posting lists for the top-df terms (inverted index)
        "inverted_postings": lambda s, d: TI.inverted_postings(_docs(s, d)),
        # jusText-lite context-sensitive boilerplate classification
        "boilerplate_paragraphs": lambda s, d: P.boilerplate_paragraph_report(
            _docs(s, d)
        ),
        # round-5 crawl-lifecycle operators (never yet verified — run
        # early): cross-snapshot keep-latest over canonical urls,
        # fixed-iteration PageRank with dangling mass, Bloom-gated
        # incremental ingest dedup (oracle reproduces the FP rows)
        "snapshot_latest": lambda s, d: CR.latest_snapshot(_docs(s, d)),
        "link_pagerank": lambda s, d: CR.link_pagerank(_docs(s, d)),
        "bloom_incremental_dedup": lambda s, d: CR.bloom_incremental_dedup(
            _docs(s, d)
        ),
        # round-5 web-corpus hygiene operators (never yet verified —
        # keep ahead of the demo classes so a budget-truncated
        # correctness run still reaches them)
        "decontam_benchmark": lambda s, d: DC.decontaminate_report(
            _docs(s, d), n=4
        ),
        "dedup_paragraphs": lambda s, d: P.dedup_paragraphs_report(_docs(s, d)),
        # C4 three-sentence-span dedup (overlapping spans, component
        # sentences removed from later copies) — boilerplate planted
        # deterministically, oracle replays the same CASE
        "dedup_sentence_spans": lambda s, d: P.dedup_sentence_spans_report(
            P.inject_prefix(_docs(s, d), 4, P.SPAN_DEMO_BOILER)
        ),
        # RefinedWeb within-doc line dedup: zero-shuffle projection
        "intradoc_line_dedup": lambda s, d: P.intradoc_line_dedup_report(
            P.inject_prefix(
                _docs(s, d), 3, P.LINE_DEMO_BOILER + " " + P.LINE_DEMO_BOILER
            )
        ),
        # round-5 geometric layout engine (north-rule clause: word-bbox
        # line clustering, column detection, y-grouped / x-aligned table
        # reconstruction — never yet verified, run early): pure
        # window+groupBy relational plans over deterministically
        # synthesized word boxes; oracles replay the identical spec
        "layout_reconstruct": lambda s, d: LY.layout_reconstruct_report(
            _docs(s, d)
        ),
        "layout_columns": lambda s, d: LY.layout_column_report(_docs(s, d)),
        "layout_grid": lambda s, d: LY.layout_grid_report(_docs(s, d)),
        # ExactSubstr dedup (Lee 2022): duplicated k-token windows cut
        # corpus-wide, first occurrence keeps; boilerplate planted
        # deterministically so real cross-doc duplicates exist
        "dedup_exact_substring": lambda s, d: D.exact_substring_dedup_report(
            P.inject_prefix(_docs(s, d), 4, D.EXSUB_BOILER)
        ),
        # GPT-style concat-and-chunk packing: per-(source, chunk) fill +
        # boundary-carry stats over the deterministic hash order
        "sequence_pack": lambda s, d: SA.sequence_pack_stats(_docs(s, d)),
        # tokenizer-prep vocab coverage: top-V vocabulary + per-source
        # OOV (exact integer ppm so both engines agree bit-for-bit)
        "vocab_coverage": lambda s, d: X.vocab_coverage_stats(_docs(s, d)),
        # in-link anchor-text aggregation over the synthetic link graph
        "anchor_text": lambda s, d: CR.anchor_text_stats(_docs(s, d)),
        # pruned bigram LM quality scores (one order past unigram)
        "text_bigram_logprob": lambda s, d: X.bigram_logprob_scores(
            _docs(s, d)
        ),
        # BPE merge training over the bounded word-frequency table
        # (corpus touched once; each step = bounded pair agg + argmax +
        # broadcast greedy fold)
        "bpe_merges": lambda s, d: B.bpe_train_merges(_docs(s, d)),
        # char-level Shannon entropy + distinct chars (compressibility)
        "text_char_entropy": lambda s, d: X.char_entropy_stats(_docs(s, d)),
        # type-token ratio in exact integer ppm (lexical diversity)
        "text_ttr": lambda s, d: X.type_token_ratio_stats(_docs(s, d)),
        # winnowing (MOSS) local fingerprints, whole set md5-verified
        "winnowing_fingerprints": lambda s, d: X.winnowing_fingerprints(
            _docs(s, d)
        ),
        # HyperLogLog distinct-token estimate vs exact (calibration)
        "hll_distinct": lambda s, d: SK.hll_distinct_report(_docs(s, d)),
        # Count-Min heavy-hitter estimates vs true counts
        "cms_heavy_hitters": lambda s, d: SK.cms_heavy_hitters_report(
            _docs(s, d)
        ),
        # incremental crawl diff: added/removed/changed/unchanged pages
        "snapshot_delta": lambda s, d: CR.snapshot_delta_report(_docs(s, d)),
        # near-dup cluster-size histogram (dedup-run health report)
        "dedup_cluster_sizes": lambda s, d: D.dedup_cluster_size_histogram(
            _docs(s, d)
        ),
        # per-source power-of-two token-length histogram
        "token_length_histogram": lambda s, d: X.token_length_histogram(
            _docs(s, d)
        ),
        # RFC 9309 robots-exclusion verdicts (longest match, allow ties)
        "robots_filter": lambda s, d: CR.robots_filter_report(_docs(s, d)),
        # MATERIALIZED sequence packing: every training chunk's token
        # text md5-verified across engines
        "sequence_pack_chunks": lambda s, d: SA.sequence_pack_chunks(
            _docs(s, d)
        ),
        # product-quantization codebook balance + distortion report
        "pq_codebook": lambda s, d: S.pq_codebook_stats(_emb(s, d)),
        "pii_scrub": lambda s, d: W.pii_scrub_stats(_docs(s, d)),
        "domain_stats": lambda s, d: W.domain_stats(_docs(s, d)),
        "training_order": lambda s, d: SA.training_order(_docs(s, d)),
        # model-based quality gate: frozen hashed-BoW logistic scores as
        # a pure HOF projection (weights enter as an array literal);
        # report = per-source score/agreement vs the rule-gate labels
        "quality_model_score": lambda s, d: (
            lambda m: QM.quality_model_report(
                _docs(s, d), m["weights"], m["bias"]
            )
        )(_quality_model()),
        "warc_roundtrip": lambda s, d: _warc_roundtrip(s, d),
        # asymmetric containment (Broder 1997): doc-inside-doc pairs —
        # kept in the never-driver-verified block so a budget-truncated
        # correctness run reaches it before the long-green demos below
        "dedup_containment": lambda s, d: D.containment_pairs(_docs(s, d)),
        # relational operator classes (SURVEY §2)
        "q1_pricing_summary": Q.q1_pricing_summary,
        "broadcast_join_revenue": Q.broadcast_join_revenue,
        "topk_customers": Q.topk_customers,
        "window_lead_gaps": Q.window_lead_gaps,
        "fill_forward_last_purchase": Q.fill_forward_last_purchase,
        "sessionize": Q.sessionize,
        "even_split_allocation": Q.even_split_allocation,
        "capped_round_robin": Q.capped_round_robin,
        "gap_fill_rank": Q.gap_fill_rank,
        "asof_nearest_view": Q.asof_nearest_view,
        "proportional_allocation": Q.proportional_allocation,
        "first_seen_type_ids": Q.first_seen_type_ids,
        "salted_hot_key_agg": Q.salted_hot_key_agg,
        "regex_kv_extract": Q.regex_kv_extract,
        "sequence_unnest": Q.sequence_unnest,
        "two_level_unnest": Q.two_level_unnest,
        # training-data operators
        "dedup_exact": lambda s, d: D.exact_dedup_stats(_docs(s, d)),
        "dedup_ngram_jaccard": lambda s, d: D.ngram_jaccard_pairs(_docs(s, d)),
        "dedup_ngram_capped": lambda s, d: D.ngram_jaccard_pairs(
            _docs(s, d), max_df=10
        ),
        "dedup_minhash_lsh": lambda s, d: D.minhash_lsh_verified(_docs(s, d)),
        "dedup_minhash_capped": lambda s, d: D.minhash_lsh_verified(
            _docs(s, d), max_df=10
        ),
        # wide-signature operating point (public practice: 64+ perms) —
        # same verified-Jaccard output contract, finer band granularity
        "dedup_minhash_wide": lambda s, d: D.minhash_lsh_verified(
            _docs(s, d), n_perms=64, n_bands=32
        ),
        "dedup_simhash": lambda s, d: D.simhash(_docs(s, d)),
        # pigeonhole-blocked hamming pairs over the simhash fingerprints
        "dedup_simhash_pairs": lambda s, d: D.simhash_neardup_pairs(
            _docs(s, d)
        ),
        "dedup_clusters": lambda s, d: D.dedup_cluster_reps(_docs(s, d)),
        "dedup_keepers": lambda s, d: D.dedup_keepers(_docs(s, d)),
        "ann_cosine_topk": lambda s, d: S.brute_force_topk(_emb(s, d)),
        "ann_lsh_buckets": lambda s, d: S.lsh_bucket_stats(_emb(s, d)),
        "ann_lsh_topk": lambda s, d: S.lsh_topk(_emb(s, d)),
        "ann_multiband_topk": lambda s, d: S.multiband_topk(_emb(s, d)),
        "ann_ivf_cells": lambda s, d: S.ivf_cell_stats(_emb(s, d)),
        "ann_ivf_topk": lambda s, d: S.ivf_topk(_emb(s, d)),
        "ann_ivf_recall": lambda s, d: S.ivf_recall_report(_emb(s, d)),
        "ann_recall": lambda s, d: S.ann_recall_report(_emb(s, d)),
        "dedup_embedding_cosine": lambda s, d: S.embedding_neardup_pairs(
            _emb(s, d)
        ),
        "text_token_count": lambda s, d: X.token_count_stats(_docs(s, d)),
        "text_lang_id": lambda s, d: X.lang_id_heuristic(_docs(s, d)),
        "text_lang_id_multi": lambda s, d: X.lang_id_multi(_docs(s, d)),
        "text_repetition": lambda s, d: X.repetition_stats(_docs(s, d)),
        "stratified_sample": lambda s, d: SA.stratified_sample_stats(_docs(s, d)),
        "train_val_split": lambda s, d: SA.train_val_split_stats(_docs(s, d)),
        # per-source token-budget mixing sample (prefix of hash order)
        "token_budget_sample": lambda s, d: SA.token_budget_sample_stats(
            _docs(s, d)
        ),
        "text_quality_score": lambda s, d: X.quality_scores(_docs(s, d)),
        "text_quality_v2": lambda s, d: X.quality_scores_v2(_docs(s, d)),
        "doc_fingerprint": lambda s, d: X.doc_fingerprints(_docs(s, d)),
        # CCNet-style perplexity proxy: corpus unigram NLL per doc
        "text_unigram_logprob": lambda s, d: X.unigram_logprob_scores(
            _docs(s, d)
        ),
        # exact length-distribution percentiles (corpus report)
        "text_length_percentiles": lambda s, d: X.length_percentile_stats(
            _docs(s, d)
        ),
        # the whole cleaning decision (lang + quality + dedup) per source
        "cleaning_funnel": lambda s, d: X.cleaning_funnel_stats(_docs(s, d)),
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_H56 = "(('0x' || substr(md5({expr}), 1, 14))::bigint)"


def _shingle_cte(sample_mod: int) -> str:
    return f"""
  docs AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks
    FROM documents WHERE doc_id % {sample_mod} = 0),
  sh AS (
    SELECT DISTINCT doc_id,
           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
    FROM docs, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)),
  sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""


_CAP_CTES = """,
  dfreq AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_df}),
  shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)),
  sizesc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id)"""


def _minhash_sql(max_df: int | None = None, n_perms: int = 8,
                 n_bands: int = 4, sample_mod: int = 5) -> str:
    params = perm_params(n_perms)
    rpb = n_perms // n_bands
    h = _H56.format(expr="shingle")
    mh_cols = ", ".join(
        f"min(({a} * hm + {b}) % {MERSENNE_P}) AS mh{j}"
        for j, (a, b) in enumerate(params)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        + " || '_' || ".join(
            f"mh{b * rpb + r}::varchar" for r in range(rpb)
        )
        + " AS band_sig FROM sig"
        for b in range(n_bands)
    )
    # signatures/banding always on the UNCAPPED shingle sets (matches
    # Spark: banding bounded by collision rate); the verify join and
    # sizes use the capped universe when max_df is set
    cap = _CAP_CTES.format(max_df=max_df) if max_df else ""
    vsh = "shc" if max_df else "sh"
    vsizes = "sizesc" if max_df else "sizes"
    return f"""
WITH {_shingle_cte(sample_mod)}{cap},
  h AS (SELECT doc_id, ({h} % {MERSENNE_P}) AS hm FROM sh),
  sig AS (SELECT doc_id, {mh_cols} FROM h GROUP BY doc_id),
  banded AS ({band_rows}),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b USING (band_idx, band_sig)
    WHERE a.doc_id < b.doc_id),
  common AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM cand c
    JOIN {vsh} sa ON sa.doc_id = c.doc_a
    JOIN {vsh} sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b,
       round(n_common / (za.n + zb.n - n_common), 4) AS jaccard
FROM common JOIN {vsizes} za ON za.doc_id = doc_a
JOIN {vsizes} zb ON zb.doc_id = doc_b
WHERE round(n_common / (za.n + zb.n - n_common), 4) >= 0.01
"""


def _minhash_calibration_sql(n_perms: int = 64,
                             min_exact_ppm: int = 10_000) -> str:
    """DuckDB replay of dedup.minhash_estimate_calibration: same
    shingles, same (a·h+b) mod P signature mins, exact integer ppm."""
    params = perm_params(n_perms)
    h = _H56.format(expr="shingle")
    mh_cols = ", ".join(
        f"min(({a} * hm + {b}) % {MERSENNE_P}) AS mh{j}"
        for j, (a, b) in enumerate(params)
    )
    match_terms = " + ".join(
        f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
        for j in range(n_perms)
    )
    return f"""
WITH {_shingle_cte(5)},
  h AS (SELECT doc_id, ({h} % {MERSENNE_P}) AS hm FROM sh),
  sig AS (SELECT doc_id, {mh_cols} FROM h GROUP BY doc_id),
  pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
  ex AS (
    SELECT doc_a, doc_b,
           (n_common * 1000000 // (za.n + zb.n - n_common))::BIGINT
             AS exact_ppm
    FROM pairs JOIN sizes za ON za.doc_id = doc_a
    JOIN sizes zb ON zb.doc_id = doc_b
    WHERE n_common * 1000000 // (za.n + zb.n - n_common)
          >= {min_exact_ppm}),
  m AS (
    SELECT doc_a, doc_b, exact_ppm, ({match_terms})::BIGINT AS n_matches
    FROM ex JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, n_matches,
       (n_matches * 1000000 // {n_perms})::BIGINT AS est_ppm,
       exact_ppm,
       abs(n_matches * 1000000 // {n_perms} - exact_ppm)::BIGINT AS err_ppm
FROM m
"""


def _count_sql(t: str, needle: str) -> str:
    """Same portable occurrence count as textstats._count_occurrences."""
    return (
        f"((length({t}) - length(replace({t}, '{needle}', '')))"
        f" / {len(needle)})::bigint"
    )


def _lang_multi_sql() -> str:
    """DuckDB replay of textstats.lang_id_multi (shared LANG_MARKERS)."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        LANG_MARKERS,
        LANG_MIN_RATIO_DEN,
    )

    codes = [c for c, _ in LANG_MARKERS]
    hit_exprs = ", ".join(
        "(" + " + ".join(_count_sql("t", m) for m in markers) + f") AS hits_{code}"
        for code, markers in LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"hits_{c}" for c in codes) + ")"
    first = (
        "CASE "
        + " ".join(f"WHEN hits_{c} = best THEN '{c}'" for c in codes)
        + " ELSE 'und' END"
    )
    return f"""
WITH s AS (
  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents),
h AS (SELECT doc_id, lang, n_tokens, {hit_exprs} FROM s),
b AS (SELECT *, {best} AS best FROM h),
g AS (SELECT lang, best, n_tokens,
             CASE WHEN best * {LANG_MIN_RATIO_DEN} >= n_tokens AND best > 0
                  THEN {first} ELSE 'und' END AS guess
      FROM b)
SELECT lang, guess, count(*) AS n_docs,
       round(avg(best / n_tokens), 4) AS avg_best_ratio
FROM g GROUP BY lang, guess
"""


def _quality_v2_sql() -> str:
    """DuckDB replay of textstats.quality_scores_v2 (Gopher/C4 rules)."""
    stop = " + ".join(_count_sql("t", m) for m in (" the ", " and ", " a "))
    return f"""
WITH s AS (
  SELECT doc_id, text, length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_types,
         ' ' || lower(text) || ' ' AS t
  FROM documents WHERE doc_id % 10 = 0),
h AS (
  SELECT doc_id, n_tokens,
         (n_chars - (n_tokens - 1)) / n_tokens AS mwl,
         n_types / n_tokens AS ttr,
         ({stop}) AS stop_hits,
         ({_count_sql("text", "#")} + {_count_sql("text", "...")}) AS symbol_hits
  FROM s),
f AS (
  SELECT doc_id, n_tokens, mwl, ttr,
         (mwl >= 3.0 AND mwl <= 10.0)::int AS flag_word_len,
         (stop_hits >= 2)::int AS flag_stopwords,
         (symbol_hits * 10 <= n_tokens)::int AS flag_symbols,
         (ttr >= 0.2)::int AS flag_ttr,
         (n_tokens >= 50 AND n_tokens <= 100000)::int AS flag_length
  FROM h)
SELECT doc_id, n_tokens,
       round(mwl, 4) AS mean_word_len,
       round(ttr, 4) AS type_token_ratio,
       flag_word_len, flag_stopwords, flag_symbols, flag_ttr, flag_length,
       round((flag_word_len + flag_stopwords + flag_symbols + flag_ttr
              + flag_length) / 5.0, 4) AS quality2_score
FROM f
"""


def _q4_score_cte() -> str:
    """Shared CTE ``q(doc_id, lang, q4)``: the v1 composite quality
    score rounded to 4 decimals (calibrate.quality_score_q4)."""
    stop = " + ".join(_count_sql("t", m) for m in (" the ", " and ", " a "))
    return f"""q AS (
  SELECT doc_id, lang,
         round(0.4 * least(1.0, n_chars / 500.0)
               + 0.3 * least(1.0, ({stop}) * 10.0 / n_tokens)
               + 0.3 * least(1.0, (n_chars / n_tokens) / 8.0), 4) AS q4
  FROM (SELECT doc_id, lang, length(text) AS n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               ' ' || lower(text) || ' ' AS t
        FROM documents))"""


def _quality_threshold_sql(q: float = 0.3) -> str:
    """DuckDB replay of calibrate.quality_threshold_by_lang: exact
    q-th order statistic per language (rank ceil(q*n), ties by doc_id),
    keep = q4 >= cutoff."""
    return f"""
WITH {_q4_score_cte()},
r AS (SELECT lang, doc_id, q4,
             row_number() OVER (PARTITION BY lang ORDER BY q4, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM q),
c AS (SELECT lang, q4 AS cutoff FROM r WHERE rn = ceil({q} * n))
SELECT q.lang, count(*)::bigint AS n_docs, min(c.cutoff) AS cutoff,
       sum((q.q4 >= c.cutoff)::int)::bigint AS n_kept,
       round(sum((q.q4 >= c.cutoff)::int) / count(*), 4) AS kept_frac
FROM q JOIN c USING (lang) GROUP BY q.lang
"""


def _quality_psi_sql(n_bins: int = 10) -> str:
    """DuckDB replay of calibrate.quality_drift_psi: Laplace-smoothed
    PSI over fixed score bins, ref = even doc_id / cur = odd.
    Intermediate raw proportions keep distinct names (pr/pc) so
    DuckDB's lateral column aliases cannot shadow them."""
    return f"""
WITH {_q4_score_cte()},
b AS (SELECT least({n_bins - 1}, floor(q4 * {n_bins}))::int AS bin,
             (doc_id % 2 = 0) AS is_ref
      FROM q),
c AS (SELECT bin, sum(is_ref::int)::bigint AS n_ref,
             sum((NOT is_ref)::int)::bigint AS n_cur
      FROM b GROUP BY bin),
p AS (SELECT bin, n_ref, n_cur,
             (n_ref + 1) / (sum(n_ref) OVER () + {n_bins}) AS pr,
             (n_cur + 1) / (sum(n_cur) OVER () + {n_bins}) AS pc
      FROM c),
t AS (SELECT bin, n_ref, n_cur,
             round(pr, 4) AS p_ref, round(pc, 4) AS p_cur,
             round((pc - pr) * ln(pc / pr), 4) AS psi_term
      FROM p)
SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term,
       round(sum(psi_term) OVER (), 4) AS psi_total
FROM t
"""


def _curriculum_sql(n_phases: int = 3) -> str:
    """DuckDB replay of textstats.curriculum_order: the quality_v2 flag
    count (integer k) buckets documents into phases, md5-hash order
    ranks within each phase."""
    stop = " + ".join(_count_sql("t", m) for m in (" the ", " and ", " a "))
    hk = _H56.format(expr="doc_id::varchar")
    return f"""
WITH s AS (
  SELECT doc_id, text, length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_types,
         ' ' || lower(text) || ' ' AS t
  FROM documents),
h AS (
  SELECT doc_id, n_tokens,
         (n_chars - (n_tokens - 1)) / n_tokens AS mwl,
         n_types / n_tokens AS ttr,
         ({stop}) AS stop_hits,
         ({_count_sql("text", "#")} + {_count_sql("text", "...")}) AS symbol_hits
  FROM s),
f AS (
  SELECT doc_id,
         ((mwl >= 3.0 AND mwl <= 10.0)::int
          + (stop_hits >= 2)::int
          + (symbol_hits * 10 <= n_tokens)::int
          + (ttr >= 0.2)::int
          + (n_tokens >= 50 AND n_tokens <= 100000)::int) AS k
  FROM h),
p AS (
  SELECT doc_id, k::int AS n_flags,
         (((5 - k) * {n_phases}) // 6)::int AS phase,
         {hk} AS hk
  FROM f)
SELECT doc_id, phase,
       (row_number() OVER (PARTITION BY phase ORDER BY hk, doc_id))::bigint
         AS rank,
       n_flags
FROM p
"""


def _simhash_cte(sample_mod: int = 10, bits: int = 16) -> str:
    """toks → per-token 56-bit hash → bit-majority simhash (shared by
    the fingerprint and pigeonhole-pair oracles)."""
    hv = _H56.format(expr="tok")
    return f"""
toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE doc_id % {sample_mod} = 0),
h AS (SELECT doc_id, {hv} AS hv FROM toks WHERE tok <> ''),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
  FROM h, unnest(generate_series(0, {bits - 1})) AS t(b)
  GROUP BY doc_id, b),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN votes > 0 THEN (1::bigint << b) ELSE 0 END)::bigint
           AS simhash
  FROM bits GROUP BY doc_id)"""


def _simhash_pairs_sql(max_hamming: int = 3, bits: int = 16,
                       sample_mod: int = 10) -> str:
    n_chunks = max_hamming + 1
    width = bits // n_chunks
    mask = (1 << width) - 1
    popcnt = " + ".join(
        f"((xor(sh_a, sh_b) >> {b}) & 1)" for b in range(bits)
    )
    return f"""
WITH {_simhash_cte(sample_mod, bits)},
ck AS (
  SELECT doc_id, simhash, c AS chunk_idx,
         ((simhash >> (c * {width})) & {mask}) AS chunk_key
  FROM sh, unnest(generate_series(0, {n_chunks - 1})) AS t(c)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM ck a JOIN ck b USING (chunk_idx, chunk_key)
  WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, ({popcnt})::int AS hamming
FROM cand WHERE ({popcnt}) <= {max_hamming}
"""


def _simhash_calibration_sql(max_hamming: int = 3, bits: int = 16,
                             sample_mod: int = 10) -> str:
    """DuckDB replay of dedup.simhash_estimate_calibration: same
    pigeonhole candidates + popcount, same integer est lookup
    (the table is generated by the SAME Python function), same
    single rounded float division for the exact cosine."""
    from pvsyst_pdf_parser_spark.training.dedup import simhash_cos_lookup_ppm

    n_chunks = max_hamming + 1
    width = bits // n_chunks
    mask = (1 << width) - 1
    popcnt = " + ".join(
        f"((xor(sh_a, sh_b) >> {b}) & 1)" for b in range(bits)
    )
    lookup = ", ".join(str(v) for v in simhash_cos_lookup_ppm(bits))
    return f"""
WITH {_simhash_cte(sample_mod, bits)},
ck AS (
  SELECT doc_id, simhash, c AS chunk_idx,
         ((simhash >> (c * {width})) & {mask}) AS chunk_key
  FROM sh, unnest(generate_series(0, {n_chunks - 1})) AS t(c)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM ck a JOIN ck b USING (chunk_idx, chunk_key)
  WHERE a.doc_id < b.doc_id),
pr AS (
  SELECT doc_a, doc_b, ({popcnt})::int AS hamming
  FROM cand WHERE ({popcnt}) <= {max_hamming}),
tc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
norms AS (SELECT doc_id, sum(c * c)::bigint AS n2 FROM tc GROUP BY doc_id),
dots AS (
  SELECT p.doc_a, p.doc_b, sum(a.c * b.c)::bigint AS dot
  FROM pr p
  JOIN tc a ON a.doc_id = p.doc_a
  JOIN tc b ON b.doc_id = p.doc_b AND b.tok = a.tok
  GROUP BY p.doc_a, p.doc_b)
SELECT p.doc_a, p.doc_b, p.hamming,
       ([{lookup}])[p.hamming + 1]::bigint AS est_cos_ppm,
       cast(round(coalesce(d.dot, 0) * 1000000.0
                  / sqrt(na.n2::double * nb.n2), 0) AS bigint)
         AS exact_cos_ppm,
       abs(([{lookup}])[p.hamming + 1]::bigint
           - cast(round(coalesce(d.dot, 0) * 1000000.0
                        / sqrt(na.n2::double * nb.n2), 0) AS bigint))
         AS err_ppm
FROM pr p
LEFT JOIN dots d ON d.doc_a = p.doc_a AND d.doc_b = p.doc_b
JOIN norms na ON na.doc_id = p.doc_a
JOIN norms nb ON nb.doc_id = p.doc_b
"""


def _cleaning_funnel_sql() -> str:
    """DuckDB replay of textstats.cleaning_funnel_stats (language gate
    + Gopher/C4 quality gate + exact-dup first-copy gate)."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        LANG_MARKERS,
        LANG_MIN_RATIO_DEN,
    )

    hit_exprs = ", ".join(
        "(" + " + ".join(_count_sql("t", m) for m in markers) + f") AS h_{code}"
        for code, markers in LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"h_{c}" for c, _ in LANG_MARKERS) + ")"
    stop = " + ".join(_count_sql("t", m) for m in (" the ", " and ", " a "))
    return f"""
WITH s AS (
  SELECT doc_id, source, text, ' ' || lower(text) || ' ' AS t,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM documents),
h AS (
  SELECT doc_id, source, text, n_tokens, {hit_exprs},
         (n_chars - (n_tokens - 1)) / n_tokens AS mwl,
         n_types / n_tokens AS ttr,
         ({stop}) AS stop_hits,
         ({_count_sql("text", "#")} + {_count_sql("text", "...")})
           AS symbol_hits
  FROM s),
f AS (
  SELECT doc_id, source, text, n_tokens, {best} AS best,
         ((mwl >= 3.0 AND mwl <= 10.0)::int + (stop_hits >= 2)::int
          + (symbol_hits * 10 <= n_tokens)::int + (ttr >= 0.2)::int
          + (n_tokens >= 50 AND n_tokens <= 100000)::int) AS q_flags
  FROM h),
g AS (
  SELECT source,
         (best * {LANG_MIN_RATIO_DEN} >= n_tokens AND best > 0)::int
           AS pass_lang,
         (q_flags >= 4)::int AS pass_quality,
         (row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1)::int
           AS first_copy
  FROM f)
SELECT source, count(*) AS n_docs,
       sum(pass_lang)::bigint AS n_pass_lang,
       sum(pass_quality)::bigint AS n_pass_quality,
       sum(first_copy)::bigint AS n_first_copy,
       sum((pass_lang = 1 AND pass_quality = 1 AND first_copy = 1)::int)::bigint
         AS n_retained,
       round(sum((pass_lang = 1 AND pass_quality = 1
                  AND first_copy = 1)::int) / count(*), 4) AS retention_rate
FROM g GROUP BY source
"""


def _gate_flags_ctes(carry: str = "doc_id, source, text, n_tokens") -> str:
    """The s/h/f CTE chain of _cleaning_funnel_sql ending in a table
    ``gf({carry}, pass_lang, pass_quality)`` — the DuckDB replay of
    textstats.gate_flags, shared by the round-5d oracles (the funnel
    oracle keeps its own verified copy untouched)."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        LANG_MARKERS,
        LANG_MIN_RATIO_DEN,
    )

    hit_exprs = ", ".join(
        "(" + " + ".join(_count_sql("t", m) for m in markers) + f") AS h_{code}"
        for code, markers in LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"h_{c}" for c, _ in LANG_MARKERS) + ")"
    stop = " + ".join(_count_sql("t", m) for m in (" the ", " and ", " a "))
    return f"""s AS (
  SELECT doc_id, source, lang, text, ' ' || lower(text) || ' ' AS t,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM documents),
h AS (
  SELECT doc_id, source, lang, text, n_tokens, {hit_exprs},
         (n_chars - (n_tokens - 1)) / n_tokens AS mwl,
         n_types / n_tokens AS ttr,
         ({stop}) AS stop_hits,
         ({_count_sql("text", "#")} + {_count_sql("text", "...")})
           AS symbol_hits
  FROM s),
f AS (
  SELECT doc_id, source, lang, text, n_tokens, {best} AS best,
         ((mwl >= 3.0 AND mwl <= 10.0)::int + (stop_hits >= 2)::int
          + (symbol_hits * 10 <= n_tokens)::int + (ttr >= 0.2)::int
          + (n_tokens >= 50 AND n_tokens <= 100000)::int) AS q_flags
  FROM h),
gf AS (
  SELECT {carry},
         (best * {LANG_MIN_RATIO_DEN} >= n_tokens AND best > 0)::int
           AS pass_lang,
         (q_flags >= 4)::int AS pass_quality
  FROM f)"""


def _dsir_importance_sql(n_buckets: int = 128) -> str:
    """DuckDB replay of dsir.dsir_importance_report: same tokenization,
    same hashed-bigram bucket (md5-56 % n_buckets), same add-1-smoothed
    log ratio rounded ONCE to integer micro-nats, exact integer sums."""
    hb = _H56.format(expr="b")
    return f"""
WITH {_gate_flags_ctes()},
tk AS (
  SELECT doc_id, source, pass_quality AS is_target,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
  FROM gf),
bg AS (
  SELECT doc_id, source, is_target,
         CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
              ELSE list_transform(generate_series(2, len(toks)),
                                  i -> toks[i-1] || ' ' || toks[i]) END
           AS bgs
  FROM tk),
eb AS (SELECT doc_id, source, is_target, unnest(bgs) AS b FROM bg),
pdb AS (
  SELECT doc_id, source, is_target, ({hb}) % {n_buckets} AS bucket,
         count(*)::bigint AS cnt
  FROM eb GROUP BY 1, 2, 3, 4),
feat AS (
  SELECT bucket, sum(cnt) AS raw_cnt, sum(cnt * is_target) AS tgt_cnt
  FROM pdb GROUP BY 1),
tot AS (SELECT sum(raw_cnt) AS raw_total, sum(tgt_cnt) AS tgt_total FROM feat),
lr AS (
  SELECT bucket,
         round((ln((tgt_cnt + 1) / (tgt_total + {n_buckets}))
                - ln((raw_cnt + 1) / (raw_total + {n_buckets})))
               * 1000000)::bigint AS lr_unats
  FROM feat CROSS JOIN tot),
sc AS (
  SELECT doc_id, sum(cnt) AS nb, sum(cnt * lr_unats) AS w
  FROM pdb JOIN lr USING (bucket) GROUP BY 1)
SELECT d.doc_id, d.source,
       coalesce(sc.nb, 0)::bigint AS n_bigrams,
       coalesce(sc.w, 0)::bigint AS weight_unats,
       (coalesce(sc.w, 0) > 0)::int AS selected
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""


def _c4_line_filters_sql(line_tokens: int = 8, min_words: int = 5,
                         min_kept_lines: int = 3) -> str:
    """DuckDB replay of webclean.c4_line_filter_report: same injected
    line structure (8-token lines, punct/javascript/code/lorem planted
    from doc_id arithmetic), same line rules, same page verdict, and
    the SAME md5 digest of the retained text."""
    line_kept = (
        f"l -> ends_with(l, '.') "
        f"AND len(list_filter(string_split(l, ' '), t -> t <> '')) >= {min_words} "
        f"AND NOT contains(l, 'javascript') AND NOT contains(l, '{{')"
    )
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents),
ls AS (
  SELECT doc_id,
         (CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
               ELSE list_transform(
                 generate_series(0, ((len(toks) + {line_tokens} - 1)
                                     // {line_tokens}) - 1),
                 j -> array_to_string(
                        list_slice(toks, j * {line_tokens} + 1,
                                   j * {line_tokens} + {line_tokens}), ' ')
                      || (CASE WHEN (doc_id + j) % 11 = 0
                               THEN ' javascript' ELSE '' END)
                      || (CASE WHEN (doc_id + j) % 3 != 0
                               THEN '.' ELSE '' END)) END)
         || (CASE WHEN doc_id % 13 = 0
                  THEN ['function() {{ return 0; }}']
                  ELSE CAST([] AS VARCHAR[]) END)
         || (CASE WHEN doc_id % 17 = 0
                  THEN ['lorem ipsum dolor sit amet consectetur adipiscing elit.']
                  ELSE CAST([] AS VARCHAR[]) END)
           AS lines
  FROM tk),
k AS (
  SELECT doc_id, lines, list_filter(lines, {line_kept}) AS kept
  FROM ls)
SELECT doc_id,
       len(lines)::bigint AS n_lines,
       len(kept)::bigint AS n_kept_lines,
       (len(kept) >= {min_kept_lines}
        AND len(list_filter(lines,
              l -> contains(l, '{{') OR contains(l, 'lorem ipsum'))) = 0
       )::int AS page_kept,
       -- array_to_string([]) is NULL in DuckDB; Spark array_join gives
       -- '' — coalesce so all-dropped pages digest identically
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS kept_digest
FROM k
"""


def _funnel_attribution_sql() -> str:
    """DuckDB replay of textstats.funnel_attribution_stats: gate flags
    + first-copy window + the 8-way flag-combination aggregate with
    exact integer ppm shares."""
    return f"""
WITH {_gate_flags_ctes()},
g AS (
  SELECT doc_id, source, n_tokens, pass_lang, pass_quality,
         (row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1)::int
           AS first_copy
  FROM gf),
a AS (
  SELECT pass_lang, pass_quality, first_copy,
         count(*) AS n_docs, sum(n_tokens)::bigint AS n_tokens
  FROM g GROUP BY 1, 2, 3)
SELECT pass_lang, pass_quality, first_copy,
       (CASE WHEN pass_lang = 1 AND pass_quality = 1 AND first_copy = 1
             THEN 'retained'
             WHEN pass_lang + pass_quality + first_copy = 2
             THEN 'lost_to_' || (CASE WHEN pass_lang = 0 THEN 'lang'
                                      WHEN pass_quality = 0 THEN 'quality'
                                      ELSE 'dup' END) || '_only'
             ELSE 'lost_to_multiple' END) AS verdict,
       n_docs, n_tokens,
       ((n_docs * 1000000) // (sum(n_docs) OVER ()))::bigint AS share_ppm
FROM a
"""


def _corpus_build_sql(budget: int = 2000, threshold: float = 0.02,
                      sample_mod: int = 5) -> str:
    """DuckDB replay of corpus.corpus_build_report: funnel gates →
    near-dup keeper rule over the GATED survivors (sampled stratum) →
    token-budget prefix over the kept set, per source."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        LANG_MARKERS,
        LANG_MIN_RATIO_DEN,
    )

    hit_exprs = ", ".join(
        "(" + " + ".join(_count_sql("t", m) for m in markers) + f") AS h_{code}"
        for code, markers in LANG_MARKERS
    )
    best = "greatest(" + ", ".join(f"h_{c}" for c, _ in LANG_MARKERS) + ")"
    stop = " + ".join(_count_sql("t", m) for m in (" the ", " and ", " a "))
    hk = _H56.format(expr="doc_id::varchar")
    return f"""
WITH RECURSIVE s AS (
  SELECT doc_id, source, text, ' ' || lower(text) || ' ' AS t,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM documents),
h AS (
  SELECT doc_id, source, text, n_tokens, {hit_exprs},
         (n_chars - (n_tokens - 1)) / n_tokens AS mwl,
         n_types / n_tokens AS ttr,
         ({stop}) AS stop_hits,
         ({_count_sql("text", "#")} + {_count_sql("text", "...")})
           AS symbol_hits
  FROM s),
f AS (
  SELECT doc_id, source, text, n_tokens, {best} AS best,
         ((mwl >= 3.0 AND mwl <= 10.0)::int + (stop_hits >= 2)::int
          + (symbol_hits * 10 <= n_tokens)::int + (ttr >= 0.2)::int
          + (n_tokens >= 50 AND n_tokens <= 100000)::int) AS q_flags
  FROM h),
g AS (
  SELECT doc_id, source, text, n_tokens,
         (best * {LANG_MIN_RATIO_DEN} >= n_tokens AND best > 0)::int
           AS pass_lang,
         (q_flags >= 4)::int AS pass_quality,
         (row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1)::int
           AS first_copy
  FROM f),
gated AS (
  SELECT doc_id, source, text, n_tokens FROM g
  WHERE pass_lang = 1 AND pass_quality = 1 AND first_copy = 1),
gdocs AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks
  FROM gated WHERE doc_id % {sample_mod} = 0),
gsh AS (
  SELECT DISTINCT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM gdocs, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)),
gsizes AS (SELECT doc_id, count(*) AS n FROM gsh GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM gsh a JOIN gsh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b
  FROM p JOIN gsizes za ON za.doc_id = doc_a
  JOIN gsizes zb ON zb.doc_id = doc_b
  WHERE round(n_common / (za.n + zb.n - n_common), 4) >= {threshold}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(src, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.src),
clusters AS (SELECT src AS doc_id, min(label) AS cluster_rep
             FROM reach GROUP BY src),
sized AS (
  SELECT c.doc_id,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY length(d.text) DESC, c.doc_id) AS pick
  FROM clusters c JOIN gated d USING (doc_id)),
drops AS (SELECT doc_id FROM sized WHERE pick > 1),
kept AS (
  SELECT * FROM gated
  WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
cur AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY {hk}, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM kept),
ka AS (
  SELECT source, count(*) AS n_kept,
         sum((cum <= {budget})::int)::bigint AS n_selected,
         sum(CASE WHEN cum <= {budget} THEN n_tokens ELSE 0 END)::bigint
           AS tokens_selected
  FROM cur GROUP BY source),
ps AS (
  SELECT source, count(*) AS n_docs,
         sum((pass_lang = 1 AND pass_quality = 1
              AND first_copy = 1)::int)::bigint AS n_gated
  FROM g GROUP BY source)
SELECT ps.source, ps.n_docs, ps.n_gated,
       (ps.n_gated - coalesce(ka.n_kept, 0))::bigint AS n_neardup_dropped,
       coalesce(ka.n_kept, 0)::bigint AS n_kept,
       coalesce(ka.n_selected, 0)::bigint AS n_selected,
       coalesce(ka.tokens_selected, 0)::bigint AS tokens_selected,
       round(coalesce(ka.n_kept, 0) / ps.n_docs, 4) AS kept_rate
FROM ps LEFT JOIN ka USING (source)
"""


def _warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC write→parse differential (io/warc.py): worker closures
    reference the repo package, so ship it when the session wasn't
    launched from the repo root (same contract as the extract smoke)."""
    from pvsyst_pdf_parser_spark.io.warc import warc_roundtrip_report

    _ensure_workers_have_repo(spark)
    return warc_roundtrip_report(_docs(spark, sf_dir))


def _warc_roundtrip_sql(n_files: int = 8) -> str:
    """DuckDB replay of warc_roundtrip_report's deterministic
    arithmetic: uri template, fixed 45-byte HTTP prefix, warcinfo at
    rec_idx 0 so responses start at 1, doc_id order within a file."""
    from pvsyst_pdf_parser_spark.io.warc import HTTP_PREFIX_LEN

    return f"""
SELECT doc_id, (doc_id % {n_files})::bigint AS file_id,
       (row_number() OVER (PARTITION BY doc_id % {n_files}
                           ORDER BY doc_id))::int AS rec_idx,
       printf('https://mirror%d.example.com/doc/%d',
              doc_id % 7, doc_id) AS target_uri,
       200 AS http_status,
       ({HTTP_PREFIX_LEN} + octet_length(encode(text)))::bigint
         AS content_length,
       octet_length(encode(text))::bigint AS body_len,
       1 AS matched
FROM documents
"""


def _decontam_sql(n: int = 4, min_overlap: int = 1, bench_mod: int = 50) -> str:
    """DuckDB replay of decontam.decontaminate_report: benchmark =
    doc_id % bench_mod == 0, scan = the rest; distinct n-gram shingles
    both sides; contaminated = ≥ min_overlap shared shingles."""
    gram = " || ' ' || ".join(f"toks[i+{k}]" for k in range(n))
    return f"""
WITH toks AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS toks
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM toks, unnest(generate_series(1, greatest(len(toks) - {n - 1}, 0))) AS t(i)
  WHERE doc_id % {bench_mod} != 0),
bsh AS (
  SELECT DISTINCT {gram} AS shingle
  FROM toks, unnest(generate_series(1, greatest(len(toks) - {n - 1}, 0))) AS t(i)
  WHERE doc_id % {bench_mod} = 0),
perdoc AS (
  SELECT s.doc_id, count(*) AS n_shingles,
         sum((b.shingle IS NOT NULL)::int) AS n_overlap
  FROM sh s LEFT JOIN bsh b USING (shingle) GROUP BY 1),
v AS (
  SELECT d.doc_id, d.source,
         coalesce(p.n_overlap, 0) AS n_overlap,
         (coalesce(p.n_overlap, 0) >= {min_overlap})::int AS contaminated
  FROM (SELECT doc_id, source FROM documents
        WHERE doc_id % {bench_mod} != 0) d
  LEFT JOIN perdoc p USING (doc_id))
SELECT source, count(*) AS n_docs,
       sum(contaminated)::bigint AS n_contaminated,
       round(avg(contaminated), 4) AS contaminated_rate,
       max(n_overlap)::bigint AS max_overlap
FROM v GROUP BY source
"""


def _dedup_paragraphs_sql(k: int = 10) -> str:
    """DuckDB replay of paragraphs.dedup_paragraphs_report: k-token
    chunks, first occurrence by (doc_id, pos) keeps, order-stable
    reassembly."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
paras AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[(i*{k}+1):((i+1)*{k})], ' ') AS para
  FROM toks,
       unnest(generate_series(0,
         cast(ceil(len(toks) / {k}.0) AS int) - 1)) AS t(i)),
flag AS (
  SELECT doc_id, pos, para,
         (row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1)::int
           AS keep
  FROM paras)
SELECT doc_id, count(*) AS n_paras, sum(keep)::bigint AS n_kept,
       coalesce(string_agg(CASE WHEN keep = 1 THEN para END, ' '
                           ORDER BY pos), '') AS clean_text
FROM flag GROUP BY doc_id
"""


def _dedup_sentence_spans_sql(k: int = 5) -> str:
    """DuckDB replay of paragraphs.dedup_sentence_spans_report (C4
    §2.2 three-sentence spans): same k-token sentence grid, same
    boilerplate injection, overlapping spans via two self-joins, first
    occurrence by (doc_id, span_pos) keeps, removed spans drop their 3
    component sentences."""
    from pvsyst_pdf_parser_spark.training.paragraphs import SPAN_DEMO_BOILER

    return f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN '{SPAN_DEMO_BOILER} ' || text
              ELSE text END AS text
  FROM documents),
toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM dirty),
sents AS (
  SELECT doc_id, i AS sidx,
         array_to_string(toks[(i*{k}+1):((i+1)*{k})], ' ') AS sent
  FROM toks,
       unnest(generate_series(0,
         cast(ceil(len(toks) / {k}.0) AS int) - 1)) AS t(i)),
spans AS (
  SELECT a.doc_id, a.sidx AS span_pos,
         a.sent || ' ' || b.sent || ' ' || c.sent AS span
  FROM sents a
  JOIN sents b ON b.doc_id = a.doc_id AND b.sidx = a.sidx + 1
  JOIN sents c ON c.doc_id = a.doc_id AND c.sidx = a.sidx + 2),
rm AS (
  SELECT DISTINCT f.doc_id, f.span_pos + d.d AS sidx
  FROM (SELECT doc_id, span_pos,
               row_number() OVER (PARTITION BY span
                                  ORDER BY doc_id, span_pos) AS rn
        FROM spans) f,
       (SELECT unnest(generate_series(0, 2)) AS d) d
  WHERE f.rn > 1)
SELECT s.doc_id, count(*)::bigint AS n_sents,
       count(r.sidx)::bigint AS n_removed,
       coalesce(string_agg(CASE WHEN r.sidx IS NULL THEN s.sent END, ' '
                           ORDER BY s.sidx), '') AS clean_text
FROM sents s
LEFT JOIN rm r ON r.doc_id = s.doc_id AND r.sidx = s.sidx
GROUP BY s.doc_id
"""


def _intradoc_line_dedup_sql(k: int = 5) -> str:
    """DuckDB replay of paragraphs.intradoc_line_dedup_report: within
    each doc, keep only the first occurrence of each k-token sentence
    (Spark side is array_distinct — first-occurrence order preserved)."""
    from pvsyst_pdf_parser_spark.training.paragraphs import LINE_DEMO_BOILER

    rep = f"{LINE_DEMO_BOILER} {LINE_DEMO_BOILER}"
    return f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN '{rep} ' || text ELSE text END AS text
  FROM documents),
toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM dirty),
sents AS (
  SELECT doc_id, i AS sidx,
         array_to_string(toks[(i*{k}+1):((i+1)*{k})], ' ') AS sent
  FROM toks,
       unnest(generate_series(0,
         cast(ceil(len(toks) / {k}.0) AS int) - 1)) AS t(i)),
flag AS (
  SELECT doc_id, sidx, sent,
         row_number() OVER (PARTITION BY doc_id, sent ORDER BY sidx) AS rn
  FROM sents)
SELECT doc_id, count(*)::bigint AS n_sents,
       sum((rn > 1)::int)::bigint AS n_removed,
       coalesce(string_agg(CASE WHEN rn = 1 THEN sent END, ' '
                           ORDER BY sidx), '') AS clean_text
FROM flag GROUP BY doc_id
"""


def _dedup_exact_substring_sql(k: int | None = None) -> str:
    """DuckDB replay of dedup.exact_substring_dedup_report: same
    boilerplate injection, same k-gram window hashing, same
    first-occurrence-keeps rank over (doc_id, widx), same interval
    coverage of removed tokens."""
    from pvsyst_pdf_parser_spark.training.dedup import EXSUB_BOILER, EXSUB_K

    k = k or EXSUB_K
    return f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN '{EXSUB_BOILER} ' || text
              ELSE text END AS text
  FROM documents),
toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM dirty),
base AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
wins AS (
  SELECT doc_id, i AS widx,
         md5(array_to_string(t[(i+1):(i+{k})], ' ')) AS wkey
  FROM base, unnest(generate_series(0, len(t) - {k})) AS u(i)
  WHERE len(t) >= {k}),
flag AS (
  SELECT doc_id, widx,
         count(*) OVER (PARTITION BY wkey) AS cnt,
         row_number() OVER (PARTITION BY wkey
                            ORDER BY doc_id, widx) AS rn
  FROM wins),
dup AS (SELECT doc_id, widx FROM flag WHERE cnt >= 2 AND rn > 1),
toku AS (
  SELECT doc_id, u.i - 1 AS tidx, t[u.i] AS tok
  FROM base, unnest(generate_series(1, len(t))) AS u(i)),
cov AS (
  SELECT kk.doc_id, kk.tidx, kk.tok, count(d.widx) > 0 AS rm
  FROM toku kk
  LEFT JOIN dup d ON d.doc_id = kk.doc_id
                 AND kk.tidx BETWEEN d.widx AND d.widx + {k - 1}
  GROUP BY kk.doc_id, kk.tidx, kk.tok)
SELECT doc_id, count(*)::bigint AS n_tokens,
       sum(rm::int)::bigint AS n_removed,
       coalesce(string_agg(CASE WHEN NOT rm THEN tok END, ' '
                           ORDER BY tidx), '') AS clean_text
FROM cov GROUP BY doc_id
"""


def _bigram_logprob_sql(top_m: int = 4096, alpha: float = 0.5) -> str:
    """DuckDB replay of textstats.bigram_logprob_scores: same pruned
    top-m bigram model, same add-alpha smoothing, same 4-decimal
    round."""
    a = repr(float(alpha))
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
toku AS (SELECT doc_id, u.tok FROM base, unnest(t) AS u(tok)),
uni AS (SELECT tok, count(*) AS c1 FROM toku GROUP BY tok),
vv AS (SELECT count(*)::double AS v FROM uni),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM base, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2),
bi AS (
  SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2
  ORDER BY c12 DESC, w1, w2 LIMIT {top_m}),
scored AS (
  SELECT p.doc_id,
         -ln((coalesce(b.c12, 0) + {a}) / (u.c1 + {a} * vv.v)) AS nll
  FROM pairs p
  JOIN uni u ON u.tok = p.w1
  LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2, vv)
SELECT doc_id, count(*)::bigint AS n_bigrams,
       round(avg(nll), 4) AS avg_nll
FROM scored GROUP BY doc_id
"""


def _kneser_ney_sql(discount: float = 0.75, top_m: int = 4096) -> str:
    """DuckDB replay of textstats.kneser_ney_scores: same pruned c12
    table (count desc, w1, w2 tie-break), same exact-integer
    continuation counts, per-pair NLL rounded ONCE to micro-nats."""
    d = repr(float(discount))
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM base, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2),
bif AS (SELECT w1, w2, count(*)::bigint AS c12 FROM pairs GROUP BY w1, w2),
lft AS (SELECT w1, sum(c12)::bigint AS c1, count(*)::bigint AS n1f
        FROM bif GROUP BY w1),
rgt AS (SELECT w2, count(*)::bigint AS n1p FROM bif GROUP BY w2),
nbt AS (SELECT count(*)::bigint AS nbt FROM bif),
bi AS (SELECT w1, w2, c12 FROM bif ORDER BY c12 DESC, w1, w2 LIMIT {top_m}),
sc AS (
  SELECT p.doc_id,
         round(-ln(greatest(coalesce(b.c12, 0) - {d}, 0.0) / l.c1
                   + ({d} * l.n1f / l.c1) * (r.n1p / nbt.nbt))
               * 1000000)::bigint AS nll
  FROM pairs p
  JOIN lft l ON l.w1 = p.w1
  JOIN rgt r ON r.w2 = p.w2
  LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2, nbt)
SELECT doc_id, count(*)::bigint AS n_bigrams,
       (sum(nll) // count(*))::bigint AS nll_unats,
       round(exp((sum(nll) // count(*)) / 1000000.0), 4) AS ppl
FROM sc GROUP BY doc_id
"""


def _hashed_embedding_sql(n_dims: int = 8) -> str:
    """DuckDB replay of simsearch.hashed_doc_embedding: ONE md5-56 per
    token, ±1 sign from bit j of that hash (same single-digest
    optimization as the Spark side), exact bigint dimension sums, norm
    from those integers."""
    dim_exprs = ",\n         ".join(
        "coalesce(list_sum(list_transform(hs,"
        f" h -> CASE WHEN (h >> {j}) % 2 = 0 THEN 1 ELSE -1 END)), 0)"
        f"::bigint AS d{j}"
        for j in range(n_dims)
    )
    sumsq = " + ".join(f"d{j} * d{j}" for j in range(n_dims))
    cols = ", ".join(f"d{j}" for j in range(n_dims))
    return f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
  FROM documents),
hk AS (
  SELECT doc_id, len(toks)::bigint AS n_tokens,
         list_transform(toks,
           x -> ('0x' || substr(md5(x), 1, 14))::bigint) AS hs
  FROM tk),
e AS (
  SELECT doc_id, n_tokens,
         {dim_exprs}
  FROM hk)
SELECT doc_id, n_tokens, {cols},
       round(sqrt(({sumsq})::double), 4) AS l2_norm
FROM e
"""


def _anchor_text_sql(anchor_tokens: int = 3) -> str:
    """DuckDB replay of crawl.anchor_text_stats: same edge arithmetic
    as the pagerank oracle, same first-k-token anchors, same majority
    tie-break."""
    return f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * a + b) % n::bigint AS dst
    FROM documents, nn, (VALUES (7, 1), (13, 3), (31, 5)) t(a, b)) e
  WHERE src % 10 != 0 AND src != dst),
anch AS (
  SELECT e.dst,
         array_to_string(
           (list_filter(string_split(d.text, ' '),
                        x -> x <> ''))[1:{anchor_tokens}], ' ') AS anchor
  FROM edges e JOIN documents d ON d.doc_id = e.src),
per AS (SELECT dst, anchor, count(*) AS cnt FROM anch GROUP BY dst, anchor),
rk AS (
  SELECT dst, anchor, cnt,
         row_number() OVER (PARTITION BY dst
                            ORDER BY cnt DESC, anchor) AS rn
  FROM per)
SELECT dst, sum(cnt)::bigint AS n_inlinks, count(*)::bigint AS n_anchors,
       max(CASE WHEN rn = 1 THEN anchor END) AS top_anchor
FROM rk GROUP BY dst
"""


def _sequence_pack_sql(ctx_len: int = 64) -> str:
    """DuckDB replay of sampling.sequence_pack_stats: same hash order,
    same exclusive prefix sum, same chunk-span arithmetic."""
    hk = _H56.format(expr="doc_id::varchar")
    return f"""
WITH base AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
         {hk} AS hk
  FROM documents),
nz AS (SELECT * FROM base WHERE n_tokens > 0),
st AS (
  SELECT source, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY hk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::bigint
           AS start
  FROM nz),
spans AS (
  SELECT source, start, n_tokens, c.chunk_id
  FROM st,
       unnest(generate_series(start // {ctx_len},
                              (start + n_tokens - 1) // {ctx_len}))
         AS c(chunk_id))
SELECT source, chunk_id,
       count(*)::bigint AS n_docs,
       sum(least(start + n_tokens, (chunk_id + 1) * {ctx_len})
           - greatest(start, chunk_id * {ctx_len}))::bigint AS n_tokens,
       sum((start < chunk_id * {ctx_len})::int)::bigint AS n_carried
FROM spans GROUP BY source, chunk_id
"""


def _vocab_coverage_sql(vocab_size: int = 256) -> str:
    """DuckDB replay of textstats.vocab_coverage_stats: same top-V
    vocabulary (count desc, token asc), same exact-integer oov_ppm."""
    return f"""
WITH toks AS (
  SELECT source, u.tok
  FROM (SELECT source,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
       unnest(t) AS u(tok)),
vocab AS (
  SELECT tok
  FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
  ORDER BY cnt DESC, tok LIMIT {vocab_size}),
agg AS (
  SELECT t.source, count(*)::bigint AS n_tokens,
         sum((v.tok IS NULL)::int)::bigint AS n_oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
  GROUP BY t.source)
SELECT source, n_tokens, n_oov,
       (1000000 * n_oov) // n_tokens AS oov_ppm
FROM agg
"""


def _bpe_merges_sql(n_merges: int = 6, max_word_len: int | None = None) -> str:
    """DuckDB replay of bpe.bpe_train_merges: same word table, same
    (count desc, a, b) argmax, same greedy left-to-right fold — each
    merge step unrolled as a (pair-count, top-1, re-fold) CTE triple,
    the pagerank-oracle pattern.  list_reduce's accumulator must be
    element-typed, which is exactly why the Spark side folds into a
    '|'-separated string too."""
    from pvsyst_pdf_parser_spark.training.bpe import BPE_MAX_WORD_LEN

    mw = max_word_len or BPE_MAX_WORD_LEN
    ctes = [
        f"""w AS (
  SELECT word, count(*)::bigint AS cnt
  FROM (SELECT u.tok AS word
        FROM (SELECT list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS t
              FROM documents), unnest(t) AS u(tok))
  WHERE regexp_full_match(word, '[a-z]+') AND length(word) <= {mw}
  GROUP BY word),
s0 AS (SELECT word, cnt, regexp_extract_all(word, '.') AS syms FROM w)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"s{i - 1}"
        ctes.append(f"""p{i} AS (
  SELECT syms[i] AS a, syms[i + 1] AS b, sum(cnt)::bigint AS pair_count
  FROM {prev}, unnest(generate_series(1, len(syms) - 1)) AS u(i)
  WHERE len(syms) >= 2 GROUP BY 1, 2),
t{i} AS (SELECT a, b, pair_count FROM p{i}
         ORDER BY pair_count DESC, a, b LIMIT 1),
s{i} AS (
  SELECT word, cnt,
         string_split(
           CASE WHEN len(syms) >= 2 THEN
             list_reduce(syms, (acc, x) -> CASE
               WHEN regexp_extract(acc, '([^|]*)$', 1) = t{i}.a
                    AND x = t{i}.b
               THEN acc || x ELSE acc || '|' || x END)
           ELSE syms[1] END, '|') AS syms
  FROM {prev}, t{i})""")
    selects = "\nUNION ALL ".join(
        f"SELECT {i} AS step, a, b, pair_count FROM t{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects + "\nORDER BY step"


def _script_mix_sql() -> str:
    """DuckDB replay of textstats.script_mix_report: same synthesized
    multiscript fixture (profile = doc_id % 6, repeat 1 + doc_id % 4,
    'd<doc_id>' tail), same per-script char counts via RE2
    \\p{Script} classes, same integer-DIV ppm and first-wins majority
    argmax."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        SCRIPT_CLASSES,
        SCRIPT_DOMINANT_PPM,
        _SCRIPT_PHRASES,
    )

    phrase_case = "CASE doc_id % 6 " + " ".join(
        f"WHEN {i} THEN '{p}'" for i, (p, _) in enumerate(_SCRIPT_PHRASES)
    ) + " END"
    label_case = "CASE doc_id % 6 " + " ".join(
        f"WHEN {i} THEN '{lab}'" for i, (_, lab) in enumerate(_SCRIPT_PHRASES)
    ) + " END"
    count_sel = ", ".join(
        f"length(regexp_replace(text, '[^\\p{{{name.capitalize()}}}]', '', 'g'))"
        f" AS n_{name}"
        for name, _ in SCRIPT_CLASSES
    )
    ppm_sel = ", ".join(
        f"n_{name} * 1000000 // n_chars AS {name}_ppm"
        for name, _ in SCRIPT_CLASSES
    )
    best = "greatest(" + ", ".join(
        f"{name}_ppm" for name, _ in SCRIPT_CLASSES
    ) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN {name}_ppm = {best} THEN '{name}'"
        for name, _ in SCRIPT_CLASSES
    ) + " END"
    return f"""
WITH synth AS (
  SELECT doc_id, {label_case} AS script_label,
         repeat({phrase_case} || ' ', cast(1 + doc_id % 4 AS int))
           || 'd' || doc_id::varchar AS text
  FROM documents),
base AS (
  SELECT doc_id, script_label,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_chars,
         {count_sel}
  FROM synth),
scored AS (
  SELECT doc_id, script_label, n_chars, {ppm_sel} FROM base)
SELECT doc_id, script_label, n_chars,
       {', '.join(f'{name}_ppm' for name, _ in SCRIPT_CLASSES)},
       CASE WHEN {best} > {SCRIPT_DOMINANT_PPM} THEN {argmax}
            ELSE 'mixed' END AS dominant
FROM scored
"""


def _char_entropy_sql() -> str:
    """DuckDB replay of textstats.char_entropy_stats: same per-(doc,
    char) counts, same H = ln(n) - (Σ c·ln c)/n algebra, same round."""
    return """
WITH chars AS (
  SELECT doc_id, u.ch
  FROM (SELECT doc_id, regexp_extract_all(text, '.') AS cs FROM documents),
       unnest(cs) AS u(ch)),
per AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch)
SELECT doc_id, sum(c)::bigint AS n_chars,
       count(*)::bigint AS distinct_chars,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
FROM per GROUP BY doc_id
"""


def _ttr_sql() -> str:
    """DuckDB replay of textstats.type_token_ratio_stats: same
    two-level agg, same exact-integer ppm."""
    return """
WITH toks AS (
  SELECT doc_id, u.tok
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
       unnest(t) AS u(tok)),
per AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
SELECT doc_id, sum(c)::bigint AS n_tokens, count(*)::bigint AS n_types,
       (1000000 * count(*)) // sum(c) AS ttr_ppm
FROM per GROUP BY doc_id
"""


def _winnowing_sql(k: int | None = None, w: int | None = None) -> str:
    """DuckDB replay of textstats.winnowing_fingerprints: same k-gram
    hashes, same rightmost-min-per-window selection (ORDER BY h ASC,
    p DESC), same position-ordered fingerprint digest."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        WINNOW_K,
        WINNOW_W,
    )

    k = k or WINNOW_K
    w = w or WINNOW_W
    h = _H56.format(expr=f"array_to_string(toks[(i + 1):(i + {k})], ' ')")
    return f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, i AS p, {h} AS h
  FROM base, unnest(generate_series(0, len(toks) - {k})) AS u(i)
  WHERE len(toks) >= {k}),
ng AS (SELECT doc_id, count(*)::bigint AS n_grams FROM g GROUP BY doc_id),
wins AS (
  SELECT gg.doc_id, s.s, gg.p, gg.h,
         row_number() OVER (PARTITION BY gg.doc_id, s.s
                            ORDER BY gg.h ASC, gg.p DESC) AS rn
  FROM ng,
       unnest(generate_series(0, greatest(ng.n_grams - {w}, 0))) AS s(s),
       g gg
  WHERE gg.doc_id = ng.doc_id AND gg.p BETWEEN s.s AND s.s + {w} - 1),
sel AS (SELECT DISTINCT doc_id, p, h FROM wins WHERE rn = 1)
SELECT ng.doc_id, ng.n_grams,
       count(*)::bigint AS n_selected,
       md5(string_agg(sel.h::varchar, ',' ORDER BY sel.p)) AS fp_hash
FROM ng JOIN sel ON sel.doc_id = ng.doc_id
GROUP BY ng.doc_id, ng.n_grams
"""


def _hll_distinct_sql() -> str:
    """DuckDB replay of sketches.hll_distinct_report: same top-p-bit
    bucketing, same bit-length rank, same alpha and linear-counting
    branch."""
    from pvsyst_pdf_parser_spark.training.sketches import (
        HLL_ALPHA_256,
        HLL_P,
    )

    m = 1 << HLL_P
    rest_bits = 56 - HLL_P
    amm = repr(HLL_ALPHA_256 * m * m)
    h = _H56.format(expr="tok")
    return f"""
WITH toks AS (
  SELECT source, u.tok
  FROM (SELECT source,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
       unnest(t) AS u(tok)),
hh AS (SELECT source, {h} AS h FROM toks),
r AS (SELECT source, h // {1 << rest_bits} AS bucket,
             h % {1 << rest_bits} AS rest
      FROM hh),
rk AS (
  SELECT source, bucket,
         CASE WHEN rest > 0 THEN {rest_bits} - length(bin(rest)) + 1
              ELSE {rest_bits + 1} END AS rank
  FROM r),
regs AS (SELECT source, bucket, max(rank) AS mx
         FROM rk GROUP BY source, bucket),
folded AS (
  SELECT source, count(*) AS n_present,
         sum(power(2.0, -mx)) AS s_present
  FROM regs GROUP BY source),
est AS (
  SELECT source, ({m} - n_present) AS v,
         {amm} / (s_present + ({m} - n_present)) AS raw
  FROM folded),
fin AS (
  SELECT source, v,
         CASE WHEN raw <= {2.5 * m} AND v > 0
              THEN {float(m)} * ln({float(m)} / v)
              ELSE raw END AS e
  FROM est),
exact AS (SELECT source, count(DISTINCT tok)::bigint AS exact_distinct
          FROM toks GROUP BY source)
SELECT f.source, v::bigint AS n_empty_registers,
       round(e, 2) AS hll_estimate, exact_distinct,
       round((e - exact_distinct) / exact_distinct, 4) AS rel_err
FROM fin f JOIN exact USING (source)
"""


def _cms_heavy_hitters_sql() -> str:
    """DuckDB replay of sketches.cms_heavy_hitters_report: same d
    hash rows (md5('i:' || tok)), same min-over-rows estimate."""
    from pvsyst_pdf_parser_spark.training.sketches import (
        CMS_D,
        CMS_TOP,
        CMS_W,
    )

    h = _H56.format(expr="i.i::varchar || ':' || tok")
    vals = ", ".join(f"({i})" for i in range(CMS_D))
    return f"""
WITH toks AS (
  SELECT u.tok
  FROM (SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
        FROM documents),
       unnest(t) AS u(tok)),
counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
cells AS (
  SELECT i.i AS hrow, {h} % {CMS_W} AS cell, cnt
  FROM counts, (VALUES {vals}) i(i)),
cms AS (SELECT hrow, cell, sum(cnt) AS c FROM cells GROUP BY hrow, cell),
top AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT {CMS_TOP}),
probes AS (
  SELECT t.tok, t.cnt, i.i AS hrow, {h} % {CMS_W} AS cell
  FROM top t, (VALUES {vals}) i(i)),
est AS (
  SELECT tok, cnt, min(c)::bigint AS cms_estimate
  FROM probes JOIN cms USING (hrow, cell) GROUP BY tok, cnt)
SELECT tok, cnt::bigint AS true_count, cms_estimate,
       (cms_estimate - cnt)::bigint AS overcount
FROM est
"""


def _snapshot_delta_sql() -> str:
    """DuckDB replay of crawl.snapshot_delta_report: same page/side
    split, same content-hash rule, same full-outer verdict."""
    return """
WITH base AS (
  SELECT doc_id // 2 AS page, doc_id % 2 AS side,
         CASE WHEN (doc_id // 2) % 3 = 0 THEN md5((doc_id // 2)::varchar)
              ELSE md5(text) END AS content
  FROM documents),
old AS (SELECT page, content AS old_content FROM base
        WHERE side = 0 AND page % 5 <> 0),
new AS (SELECT page, content AS new_content FROM base
        WHERE side = 1 AND page % 7 <> 3),
j AS (
  SELECT page,
         CASE WHEN old_content IS NULL THEN 'added'
              WHEN new_content IS NULL THEN 'removed'
              WHEN old_content = new_content THEN 'unchanged'
              ELSE 'changed' END AS verdict
  FROM old FULL OUTER JOIN new USING (page))
SELECT verdict, count(*)::bigint AS n_pages,
       min(page)::bigint AS min_page, max(page)::bigint AS max_page
FROM j GROUP BY verdict
"""


def _cluster_sizes_sql() -> str:
    """DuckDB replay of dedup.dedup_cluster_size_histogram: the
    dedup_clusters recursive-CTE fixpoint folded into a size
    histogram."""
    return f"""
WITH RECURSIVE {_shingle_cte(5)},
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b
  FROM p JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
  WHERE round(n_common / (za.n + zb.n - n_common), 4) >= 0.02),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(src, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.src),
clusters AS (SELECT src AS doc_id, min(label) AS cluster_rep
             FROM reach GROUP BY src),
sz AS (SELECT cluster_rep, count(*) AS cluster_size
       FROM clusters GROUP BY cluster_rep)
SELECT cluster_size::bigint AS cluster_size,
       count(*)::bigint AS n_clusters,
       (count(*) * cluster_size)::bigint AS n_docs
FROM sz GROUP BY cluster_size
"""


def _token_length_histogram_sql() -> str:
    """DuckDB replay of textstats.token_length_histogram: same
    bit-length bucket (exact integer, no float log2)."""
    return """
WITH t AS (
  SELECT source,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::bigint
           AS n_tokens
  FROM documents)
SELECT source, length(bin(n_tokens))::bigint AS bucket,
       count(*)::bigint AS n_docs, sum(n_tokens)::bigint AS n_tokens
FROM t GROUP BY source, length(bin(n_tokens))
"""


def _sequence_pack_chunks_sql(ctx_len: int = 64) -> str:
    """DuckDB replay of sampling.sequence_pack_chunks: same hash order
    and span arithmetic as the stats oracle, plus per-chunk token-text
    reassembly (string_agg in start order) hashed with md5."""
    hk = _H56.format(expr="doc_id::varchar")
    return f"""
WITH base AS (
  SELECT source, doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         {hk} AS hk
  FROM documents),
nz AS (SELECT *, len(toks)::bigint AS n_tokens FROM base WHERE len(toks) > 0),
st AS (
  SELECT source, toks, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY hk, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::bigint
           AS start
  FROM nz),
spans AS (
  SELECT source, start, n_tokens, toks, c.chunk_id
  FROM st,
       unnest(generate_series(start // {ctx_len},
                              (start + n_tokens - 1) // {ctx_len}))
         AS c(chunk_id)),
segs AS (
  SELECT source, chunk_id, start,
         array_to_string(
           toks[(greatest(start, chunk_id * {ctx_len}) - start + 1)
                : (least(start + n_tokens, (chunk_id + 1) * {ctx_len})
                   - start)], ' ') AS seg,
         least(start + n_tokens, (chunk_id + 1) * {ctx_len})
           - greatest(start, chunk_id * {ctx_len}) AS seg_tokens
  FROM spans)
SELECT source, chunk_id, count(*)::bigint AS n_docs,
       sum(seg_tokens)::bigint AS n_tokens,
       md5(string_agg(seg, ' ' ORDER BY start)) AS chunk_hash
FROM segs GROUP BY source, chunk_id
"""


def _robots_filter_sql() -> str:
    """DuckDB replay of crawl.robots_filter_report: same synthetic url
    + rule arithmetic, same longest-match / allow-tie / default-allow
    window."""
    return """
WITH u AS (
  SELECT doc_id,
         'site' || (doc_id % 13) || '.example.com' AS host,
         '/page/' || (doc_id % 9) || '/'
           || CASE WHEN doc_id % 2 = 0 THEN 'open' ELSE 'item' END
           || '/' || doc_id AS path
  FROM documents),
h AS (SELECT DISTINCT (doc_id % 13)::int AS hh FROM documents),
rules AS (
  SELECT 'site' || hh || '.example.com' AS rhost,
         'disallow' AS rule_type, '/page/' || (hh % 3) AS prefix FROM h
  UNION ALL
  SELECT 'site' || hh || '.example.com', 'disallow',
         '/page/' || (hh % 3 + 3) FROM h
  UNION ALL
  SELECT 'site' || hh || '.example.com', 'allow',
         '/page/' || (hh % 3) || '/open' FROM h),
j AS (
  SELECT u.doc_id, u.host, u.path, r.rule_type, r.prefix
  FROM u LEFT JOIN rules r
    ON r.rhost = u.host AND starts_with(u.path, r.prefix)),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id
    ORDER BY length(prefix) DESC NULLS LAST,
             rule_type ASC NULLS LAST, prefix ASC NULLS LAST) AS rn
  FROM j)
SELECT doc_id, host, path, rule_type, prefix AS rule_prefix,
       (rule_type IS NULL OR rule_type = 'allow')::int AS allowed
FROM rk WHERE rn = 1
"""


def _pq_codebook_sql() -> str:
    """DuckDB replay of simsearch.pq_codebook_stats: the M×K codebook
    enters as DOUBLE[] literals (repr round-trips floats exactly), the
    argmin is the same (score desc, code asc) window, distortion uses
    the same ‖x‖² − 2·score algebra."""
    from pvsyst_pdf_parser_spark.training.simsearch import (
        PQ_K,
        PQ_M,
        _seq_half_norm,
        pq_centroid_values,
    )

    sub_dim = 64 // PQ_M
    rows = []
    for s in range(PQ_M):
        for c in range(PQ_K):
            cent = pq_centroid_values(s, c, sub_dim)
            lit = "[" + ", ".join(repr(v) for v in cent) + "]::DOUBLE[]"
            hn = repr(_seq_half_norm(cent))
            rows.append(f"({s}, {c}, {lit}, {hn})")
    values = ",\n    ".join(rows)
    return f"""
WITH cb(subspace, code, cent, hn) AS (VALUES
    {values}),
sc AS (
  SELECT e.vec_id, cb.subspace, cb.code,
         list_dot_product(
           e.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[],
           cb.cent) - cb.hn AS score,
         list_dot_product(
           e.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[],
           e.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[])
           AS xnorm
  FROM embeddings e, cb),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                               ORDER BY score DESC, code) AS rn
  FROM sc)
SELECT subspace, code, count(*)::bigint AS n_vectors,
       round(avg(xnorm - 2 * score), 4) AS avg_distortion
FROM rk WHERE rn = 1
GROUP BY subspace, code
"""


def _pq_adc_topk_sql(n_queries: int = 5, topk: int = 5) -> str:
    """DuckDB replay of simsearch.pq_adc_topk: codes via the same
    (score desc, code asc) argmin window as the pq_codebook oracle, the
    ADC lut by the quadratic expansion ‖q_s‖² − 2·q_s·c + ‖c‖² against
    the repr'd codebook literals (algebraically equal to the Spark
    side's per-element Σ(q−c)²; both sides round the summed distance to
    6 dp BEFORE ranking, which absorbs the last-ulp association drift),
    ties on cand_id ascending."""
    from pvsyst_pdf_parser_spark.training.simsearch import (
        PQ_K,
        PQ_M,
        _seq_half_norm,
        pq_centroid_values,
    )

    sub_dim = 64 // PQ_M
    rows = []
    for s in range(PQ_M):
        for c in range(PQ_K):
            cent = pq_centroid_values(s, c, sub_dim)
            lit = "[" + ", ".join(repr(v) for v in cent) + "]::DOUBLE[]"
            hn = repr(_seq_half_norm(cent))
            rows.append(f"({s}, {c}, {lit}, {hn})")
    values = ",\n    ".join(rows)
    return f"""
WITH cb(subspace, code, cent, hn) AS (VALUES
    {values}),
sc AS (
  SELECT e.vec_id, cb.subspace, cb.code,
         list_dot_product(
           e.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[],
           cb.cent) - cb.hn AS score
  FROM embeddings e, cb),
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY score DESC, code) AS rn
    FROM sc) WHERE rn = 1),
lut AS (
  SELECT q.vec_id AS query_id, cb.subspace, cb.code,
         list_dot_product(
           q.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[],
           q.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[])
         - 2 * list_dot_product(
             q.embedding[cb.subspace * {sub_dim} + 1
                         : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[],
             cb.cent)
         + 2 * cb.hn AS d
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id < {n_queries}) q, cb),
scored AS (
  SELECT lut.query_id, codes.vec_id AS cand_id,
         round(sum(lut.d), 6) AS adc_dist
  FROM codes JOIN lut USING (subspace, code)
  WHERE lut.query_id <> codes.vec_id
  GROUP BY 1, 2)
SELECT query_id, cand_id, adc_dist,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_dist ASC, cand_id ASC)::bigint
         AS adc_rank
FROM scored
QUALIFY adc_rank <= {topk}
"""


def _bm25_topk_sql(
    n_terms: int = 3, skip: int = 1, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    """DuckDB replay of tfidf.bm25_topk: same tokenization and df-rank
    query-term selection, the same left-associated Okapi expression
    (constants repr'd from the Python-folded values so both engines see
    identical doubles), scores rounded to 6 dp BEFORE ranking, ties on
    doc_id ascending."""
    k1r, k1p1, one_m_b, br = repr(k1), repr(k1 + 1.0), repr(1.0 - b), repr(b)
    return f"""
WITH tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
    FROM documents)
  WHERE t <> ''),
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*)::bigint AS df FROM tf GROUP BY 1),
qt AS (
  SELECT term, df FROM (
    SELECT term, df,
           row_number() OVER (ORDER BY df DESC, term ASC) AS trk
    FROM df)
  WHERE trk > {skip} AND trk <= {skip + n_terms}),
dl AS (SELECT doc_id, sum(tf)::bigint AS dl FROM tf GROUP BY 1),
tot AS (SELECT count(DISTINCT doc_id)::bigint AS n,
               sum(tf)::bigint AS toks FROM tf),
scored AS (
  SELECT t.doc_id, count(*)::bigint AS n_hit,
         round(sum(
           (ln(1.0 + ((tot.n::DOUBLE - qt.df) + 0.5) / (qt.df + 0.5))
            * (t.tf * {k1p1}))
           / (t.tf + {k1r} * ({one_m_b}
                              + (({br} * dl.dl)
                                 / (tot.toks::DOUBLE / tot.n))))
         ), 6) AS score
  FROM tf t JOIN qt USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
  GROUP BY t.doc_id)
SELECT doc_id, n_hit, score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC)::bigint
         AS bm25_rank
FROM scored
QUALIFY bm25_rank <= {k}
"""


def _ivf_pq_topk_sql(
    n_queries: int = 5, topk: int = 5, n_probe: int = 2
) -> str:
    """DuckDB replay of simsearch.ivf_pq_topk (IVFADC): candidates from
    the probed IVF posting lists (the same rank CTE as the ivf oracles)
    re-scored by the same PQ code/lut algebra as the pq_adc_topk
    oracle; both engines round the summed asymmetric distance to 6 dp
    BEFORE ranking, ties on cand_id ascending."""
    from pvsyst_pdf_parser_spark.training.simsearch import (
        PQ_K,
        PQ_M,
        _seq_half_norm,
        pq_centroid_values,
    )

    sub_dim = 64 // PQ_M
    rows = []
    for s in range(PQ_M):
        for c in range(PQ_K):
            cent = pq_centroid_values(s, c, sub_dim)
            lit = "[" + ", ".join(repr(v) for v in cent) + "]::DOUBLE[]"
            hn = repr(_seq_half_norm(cent))
            rows.append(f"({s}, {c}, {lit}, {hn})")
    values = ",\n    ".join(rows)
    return f"""
WITH {_ivf_rank_cte()},
home AS (SELECT vec_id AS cand_id, cell FROM r WHERE rk = 1),
probes AS (SELECT vec_id AS query_id, cell FROM r
           WHERE rk <= {n_probe} AND vec_id < {n_queries}),
cand AS (
  SELECT DISTINCT probes.query_id, home.cand_id
  FROM probes JOIN home USING (cell)
  WHERE probes.query_id <> home.cand_id),
cb(subspace, code, cent, hn) AS (VALUES
    {values}),
psc AS (
  SELECT e.vec_id, cb.subspace, cb.code,
         list_dot_product(
           e.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[],
           cb.cent) - cb.hn AS score
  FROM embeddings e, cb),
pcodes AS (
  SELECT vec_id AS cand_id, subspace, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY score DESC, code) AS rn
    FROM psc) WHERE rn = 1),
lut AS (
  SELECT q.vec_id AS query_id, cb.subspace, cb.code,
         list_dot_product(
           q.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[],
           q.embedding[cb.subspace * {sub_dim} + 1
                       : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[])
         - 2 * list_dot_product(
             q.embedding[cb.subspace * {sub_dim} + 1
                         : cb.subspace * {sub_dim} + {sub_dim}]::DOUBLE[],
             cb.cent)
         + 2 * cb.hn AS d
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE vec_id < {n_queries}) q, cb),
scored AS (
  SELECT cand.query_id, cand.cand_id,
         round(sum(lut.d), 6) AS adc_dist
  FROM cand
  JOIN pcodes USING (cand_id)
  JOIN lut ON lut.query_id = cand.query_id
          AND lut.subspace = pcodes.subspace
          AND lut.code = pcodes.code
  GROUP BY 1, 2)
SELECT query_id, cand_id, adc_dist,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_dist ASC, cand_id ASC)::bigint
         AS adc_rank
FROM scored
QUALIFY adc_rank <= {topk}
"""


def _bpe_encode_sql(max_word_len: int | None = None) -> str:
    """DuckDB replay of bpe.bpe_encode_stats: the same word contract
    (lowercase [a-z]+, length cap), the same ``[sym]`` bracketized
    representation, and the SAME chained literal replaces from the
    frozen merge fixture — so the md5 of the encoded stream verifies
    every merge decision byte-for-byte."""
    from pvsyst_pdf_parser_spark.training.bpe import BPE_MAX_WORD_LEN

    cap = BPE_MAX_WORD_LEN if max_word_len is None else max_word_len
    enc = "regexp_replace(word, '(.)', '[\\1]', 'g')"
    for a, b in _bpe_merges():
        enc = f"replace({enc}, '[{a}][{b}]', '[{a}{b}]')"
    return f"""
WITH parts AS (
  SELECT doc_id, string_split(lower(text), ' ') AS p FROM documents),
rawtok AS (
  SELECT doc_id, p[i] AS word, i
  FROM parts, unnest(generate_series(1, len(p))) AS t(i)
  WHERE p[i] <> ''),
w AS (
  SELECT doc_id, i, word FROM rawtok
  WHERE regexp_full_match(word, '[a-z]+') AND length(word) <= {cap}),
enc AS (
  SELECT doc_id, i, {enc} AS enc FROM w)
SELECT doc_id,
       count(*)::bigint AS n_words,
       sum(length(enc) - length(replace(enc, '[', '')))::bigint AS n_tokens,
       md5(string_agg(enc, '' ORDER BY i)) AS enc_md5
FROM enc GROUP BY doc_id
"""


def _bpe_fertility_sql(max_word_len: int | None = None) -> str:
    """DuckDB replay of bpe.bpe_fertility_stats: the same word contract
    and chained literal replaces as _bpe_encode_sql, grouped by lang;
    integer sums divide once at the end so round(·, 4) agrees
    bit-for-bit."""
    from pvsyst_pdf_parser_spark.training.bpe import BPE_MAX_WORD_LEN

    cap = BPE_MAX_WORD_LEN if max_word_len is None else max_word_len
    enc = "regexp_replace(word, '(.)', '[\\1]', 'g')"
    for a, b in _bpe_merges():
        enc = f"replace({enc}, '[{a}][{b}]', '[{a}{b}]')"
    return f"""
WITH parts AS (
  SELECT lang, string_split(lower(text), ' ') AS p FROM documents),
rawtok AS (
  SELECT lang, p[i] AS word
  FROM parts, unnest(generate_series(1, len(p))) AS t(i)
  WHERE p[i] <> ''),
w AS (
  SELECT lang, word FROM rawtok
  WHERE regexp_full_match(word, '[a-z]+') AND length(word) <= {cap}),
enc AS (
  SELECT lang, length(word)::bigint AS n_char,
         (length({enc}) - length(replace({enc}, '[', '')))::bigint AS n_tok
  FROM w)
SELECT lang,
       count(*)::bigint AS n_words,
       sum(n_tok)::bigint AS n_tokens,
       sum(n_char)::bigint AS n_chars,
       round(sum(n_tok)::bigint / count(*), 4) AS fertility,
       round(sum(n_char)::bigint / sum(n_tok)::bigint, 4) AS chars_per_token
FROM enc GROUP BY lang
"""


def _layout_placed_cte() -> str:
    """Shared DuckDB CTE replaying layout.synth_word_boxes: the same
    fixed-width slot grid (8 slots x 16 chars, 24-unit gutter before
    slot 4) over documents.text, word idx renumbered after dropping
    empty split tokens exactly as the Spark side does."""
    from pvsyst_pdf_parser_spark.text import layout as L

    half = L.WORDS_PER_LINE // 2
    return f"""
parts AS (
  SELECT doc_id, string_split(text, ' ') AS p FROM documents),
rawtok AS (
  SELECT doc_id, p[i] AS tok, i
  FROM parts, unnest(generate_series(1, len(p))) AS t(i)
  WHERE p[i] <> ''),
toks AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS idx,
         left(tok, {L.MAX_WLEN}) AS word
  FROM rawtok),
placed AS (
  SELECT doc_id, idx, word,
         (idx // {L.WORDS_PER_LINE})::int AS line_id,
         ((idx % {L.WORDS_PER_LINE}) * {L.SLOT_W}
          + CASE WHEN idx % {L.WORDS_PER_LINE} >= {half}
                 THEN {L.GUTTER} ELSE 0 END) AS x0,
         ((idx % {L.WORDS_PER_LINE}) * {L.SLOT_W}
          + CASE WHEN idx % {L.WORDS_PER_LINE} >= {half}
                 THEN {L.GUTTER} ELSE 0 END
          + len(word)) AS x1
  FROM toks)"""


def _layout_reconstruct_sql() -> str:
    """DuckDB replay of layout.layout_reconstruct_report: same boxes,
    same spacing arithmetic (gap = x0 - prev_x1 spaces, min 1; indent =
    x0; one newline per consecutive 12-unit line step), same md5."""
    return f"""
WITH {_layout_placed_cte()},
wtok AS (
  SELECT doc_id, line_id, x0,
         CASE WHEN lag(x1) OVER w IS NULL
              THEN repeat(' ', greatest(0, x0)::int)
              ELSE repeat(' ', greatest(1, x0 - lag(x1) OVER w)::int)
         END || word AS tok
  FROM placed WINDOW w AS (PARTITION BY doc_id, line_id ORDER BY x0)),
lns AS (
  SELECT doc_id, line_id, count(*) AS nw,
         string_agg(tok, '' ORDER BY x0) AS line_str
  FROM wtok GROUP BY doc_id, line_id)
SELECT doc_id, count(*)::bigint AS n_lines, sum(nw)::bigint AS n_words,
       md5(string_agg(line_str, chr(10) ORDER BY line_id)) AS text_md5
FROM lns GROUP BY doc_id
"""


def _layout_columns_sql() -> str:
    """DuckDB replay of layout.layout_column_report: the same running
    max(x1) interval-union scan, widest interior gap wins (ties by
    gx0), side counts against the band edges."""
    from pvsyst_pdf_parser_spark.text import layout as L

    return f"""
WITH {_layout_placed_cte()},
xs AS (SELECT doc_id, x0, max(x1) AS x1 FROM placed GROUP BY doc_id, x0),
g AS (
  SELECT doc_id,
         max(x1) OVER (PARTITION BY doc_id ORDER BY x0
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS gx0,
         x0 AS gx1
  FROM xs),
gaps AS (SELECT * FROM g WHERE gx0 IS NOT NULL AND gx1 > gx0),
best AS (
  SELECT doc_id, gx0, gx1
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY (gx1 - gx0) DESC, gx0, gx1)
               AS rn
        FROM gaps)
  WHERE rn = 1),
sides AS (
  SELECT p.doc_id, max(b.gx0) AS gx0, max(b.gx1) AS gx1,
         sum(CASE WHEN p.x1 <= b.gx0 THEN 1 ELSE 0 END)::bigint AS n_left,
         sum(CASE WHEN p.x0 >= b.gx1 THEN 1 ELSE 0 END)::bigint AS n_right
  FROM placed p LEFT JOIN best b ON p.doc_id = b.doc_id
  GROUP BY p.doc_id)
SELECT doc_id,
       coalesce(gx0, 0)::int AS band_x0,
       coalesce(gx1, 0)::int AS band_x1,
       coalesce(gx1 - gx0, 0)::int AS band_w,
       n_left, n_right,
       (coalesce(gx1 - gx0, 0) >= {L.MIN_BAND_W}) AS is_two_col
FROM sides
"""


def _layout_grid_sql(x_tol: float = 2.0) -> str:
    """DuckDB replay of layout.layout_grid_report: x-starts clustered
    with the same gap-segmentation idiom, cells keyed (line, col),
    order-pinned md5 over line_id:col_id:cell strings."""
    return f"""
WITH {_layout_placed_cte()},
xs AS (SELECT DISTINCT doc_id, x0 FROM placed),
brk AS (
  SELECT doc_id, x0,
         CASE WHEN x0 - lag(x0) OVER (PARTITION BY doc_id ORDER BY x0)
                   > {x_tol} THEN 1 ELSE 0 END AS is_brk
  FROM xs),
cols AS (
  SELECT doc_id, x0,
         (sum(is_brk) OVER (PARTITION BY doc_id ORDER BY x0
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW))::int AS col_id
  FROM brk),
cells AS (
  SELECT p.doc_id, p.line_id, c.col_id, p.x0,
         p.line_id::varchar || ':' || c.col_id::varchar || ':' || p.word
           AS cell_str
  FROM placed p JOIN cols c ON p.doc_id = c.doc_id AND p.x0 = c.x0)
SELECT doc_id, count(DISTINCT line_id)::bigint AS n_rows,
       count(DISTINCT col_id)::bigint AS n_cols,
       md5(string_agg(cell_str, '|'
                      ORDER BY line_id, col_id, x0, cell_str)) AS grid_md5
FROM cells GROUP BY doc_id
"""


# -- round-5b oracle builders -----------------------------------------

_SYNTH_HOST = (
    "regexp_replace(regexp_replace("
    "lower(regexp_extract(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),"
    "':(80|443)$', ''), '^www\\.', '')"
)

_SYNTH_RAW_URL = """CASE WHEN doc_id % 2 = 0
    THEN printf('HTTPS://WWW.Mirror%d.Example.COM:443/Docs/%d/?utm_source=feed&id=%d&utm_campaign=x#frag',
                doc_id % 7, doc_id, doc_id)
    ELSE printf('http://mirror%d.example.com:80/Docs/%d?fbclid=abc%d&page=2',
                doc_id % 7, doc_id, doc_id)
    END"""


def _mojibake_repair_sql() -> str:
    """DuckDB replay of encoding.mojibake_repair_stats: the SAME
    generated damage literals and the SAME generated repair table
    (encoding.MOJIBAKE_TABLE is the single source of truth for both
    engines — nothing here is hand-typed)."""
    from pvsyst_pdf_parser_spark.training.encoding import (
        ARTIFACT_PAT,
        MOJIBAKE_TABLE,
        _DMG2,
        _DMG3,
        _DMG5,
    )

    clean = "t"
    for artifact, repaired in MOJIBAKE_TABLE:
        clean = f"replace({clean}, '{artifact}', '{repaired}')"
    return f"""
WITH dirty AS (
  SELECT doc_id,
         text
      || CASE WHEN doc_id % 2 = 0 THEN '{_DMG2}' ELSE '' END
      || CASE WHEN doc_id % 3 = 0 THEN '{_DMG3}' ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN '{_DMG5}' ELSE '' END AS t
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{ARTIFACT_PAT}'))::bigint AS n_artifacts,
       length(t)::bigint AS chars_dirty,
       length({clean})::bigint AS chars_clean,
       {clean} AS clean_text
FROM dirty
"""


def _domain_cap_sql(cap: int = 5) -> str:
    """DuckDB replay of webclean.domain_cap_report: same synthesized
    host, same md5-portable rank key, same cap."""
    hk = _H56.format(expr="doc_id::varchar")
    return f"""
WITH r AS (SELECT doc_id, {_SYNTH_RAW_URL} AS raw_url FROM documents),
h AS (SELECT doc_id, {_SYNTH_HOST} AS host, {hk} AS rank_key FROM r),
k AS (SELECT doc_id, host,
        row_number() OVER (PARTITION BY host ORDER BY rank_key, doc_id)
          AS host_rank
      FROM h)
SELECT doc_id, host, host_rank::bigint AS host_rank,
       (host_rank <= {cap})::int AS kept
FROM k
"""


def _frontier_slots_sql(n_slots: int = 8) -> str:
    """DuckDB replay of crawl.frontier_slots_report: host->slot hash
    projection + per-host fetch sequence + host page count."""
    hk = _H56.format(expr="doc_id::varchar")
    hh = _H56.format(expr="host")
    return f"""
WITH r AS (SELECT doc_id, {_SYNTH_RAW_URL} AS raw_url FROM documents),
h AS (SELECT doc_id, {_SYNTH_HOST} AS host, {hk} AS rank_key FROM r)
SELECT doc_id, host,
       ({hh} % {n_slots})::bigint AS slot,
       row_number() OVER (PARTITION BY host ORDER BY rank_key, doc_id)::bigint
         AS fetch_seq,
       count(*) OVER (PARTITION BY host)::bigint AS n_host_pages
FROM h
"""


def _tfidf_top_terms_sql(k: int = 3) -> str:
    """DuckDB replay of tfidf.tfidf_top_terms: same tokenization, same
    smoothed idf, scores rounded to 6 dp BEFORE ranking (rank ties
    then break on term, stable across engines)."""
    return f"""
WITH tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
    FROM documents)
  WHERE t <> ''),
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*)::bigint AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         round(tf * (ln((n + 1)::double / (df + 1)) + 1), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS term_rank
  FROM scored)
SELECT doc_id, term, tf, df, score, term_rank::bigint AS term_rank
FROM ranked WHERE term_rank <= {k}
"""


def _inverted_postings_sql(top_n: int = 20, cap: int = 10) -> str:
    """DuckDB replay of tfidf.inverted_postings: top-df term selection
    (df desc, term asc), per-term doc list capped by doc_id order,
    comma-joined ascending."""
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
    FROM documents)
  WHERE t <> ''),
df AS (SELECT term, count(*)::bigint AS df FROM tok GROUP BY 1),
top AS (
  SELECT term, df,
         row_number() OVER (ORDER BY df DESC, term ASC) AS trk
  FROM df),
capped AS (
  SELECT t.term, s.df, t.doc_id,
         row_number() OVER (PARTITION BY t.term ORDER BY t.doc_id) AS drk
  FROM tok t JOIN (SELECT term, df FROM top WHERE trk <= {top_n}) s
    USING (term))
SELECT term, df,
       string_agg(doc_id::varchar, ',' ORDER BY doc_id) AS postings
FROM capped WHERE drk <= {cap}
GROUP BY term, df
"""


def _boilerplate_paragraphs_sql(k: int = 10) -> str:
    """DuckDB replay of paragraphs.boilerplate_paragraph_report: same
    k-token paragraph grid, same stopword density thresholds, same
    lag/lead context resolution."""
    from pvsyst_pdf_parser_spark.training.paragraphs import (
        GOOD_RATIO,
        NEAR_RATIO,
        SHORT_WORDS,
        STOPWORDS,
    )

    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
paras AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[(i*{k}+1):((i+1)*{k})], ' ') AS para
  FROM toks,
       unnest(generate_series(0,
         cast(ceil(len(toks) / {k}.0) AS int) - 1)) AS t(i)),
m AS (
  SELECT doc_id, pos,
         len(string_split(para, ' '))::bigint AS n_words,
         round(len(list_filter(string_split(para, ' '),
                               x -> list_contains([{stop}], x)))
               / len(string_split(para, ' ')), 6) AS stop_ratio
  FROM paras),
lab AS (
  SELECT doc_id, pos, n_words, stop_ratio,
         CASE WHEN n_words < {SHORT_WORDS} THEN 'short'
              WHEN stop_ratio >= {GOOD_RATIO} THEN 'good'
              WHEN stop_ratio >= {NEAR_RATIO} THEN 'near'
              ELSE 'bad' END AS raw_label
  FROM m),
ctx AS (
  SELECT *,
         lag(raw_label) OVER (PARTITION BY doc_id ORDER BY pos) AS prv,
         lead(raw_label) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM lab)
SELECT doc_id, pos, n_words, stop_ratio, raw_label,
       CASE WHEN raw_label IN ('good', 'bad') THEN raw_label
            WHEN (prv = 'good' OR nxt = 'good') THEN 'good'
            ELSE 'bad' END AS label
FROM ctx
"""


def _pii_scrub_sql() -> str:
    """DuckDB replay of webclean.pii_scrub_stats: the SAME injected
    PII arithmetic and the SAME portable patterns (module constants are
    the single source of truth)."""
    from pvsyst_pdf_parser_spark.training.webclean import (
        EMAIL_PAT,
        IPV4_PAT,
        PHONE_PAT,
    )

    return f"""
WITH dirty AS (
  SELECT doc_id,
         text || printf(' contact user%d@mail%d.example.org',
                        doc_id, doc_id % 9)
   || CASE WHEN doc_id % 3 = 0
           THEN printf(' host 10.%d.0.%d', doc_id % 256, doc_id % 100)
           ELSE '' END
   || CASE WHEN doc_id % 4 = 0
           THEN printf(' call 555-01%d-%04d', doc_id % 10, doc_id % 10000)
           ELSE '' END AS t
  FROM documents)
SELECT doc_id,
  len(regexp_extract_all(t, '{EMAIL_PAT}'))::bigint AS n_emails,
  len(regexp_extract_all(t, '{IPV4_PAT}'))::bigint AS n_ips,
  len(regexp_extract_all(t, '{PHONE_PAT}'))::bigint AS n_phones,
  regexp_replace(regexp_replace(regexp_replace(t,
    '{EMAIL_PAT}', '<EMAIL>', 'g'),
    '{IPV4_PAT}', '<IP>', 'g'),
    '{PHONE_PAT}', '<PHONE>', 'g') AS clean_text
FROM dirty
"""


def _domain_stats_sql() -> str:
    from pvsyst_pdf_parser_spark.training.webclean import DEFAULT_BLOCKLIST

    blocked = ", ".join(f"'{h}'" for h in DEFAULT_BLOCKLIST)
    return rf"""
WITH r AS (
  SELECT CASE WHEN doc_id % 2 = 0
    THEN printf('HTTPS://WWW.Mirror%d.Example.COM:443/Docs/%d/?utm_source=feed&id=%d&utm_campaign=x#frag',
                doc_id % 7, doc_id, doc_id)
    ELSE printf('http://mirror%d.example.com:80/Docs/%d?fbclid=abc%d&page=2',
                doc_id % 7, doc_id, doc_id)
    END AS raw_url,
    len(string_split(text, ' ')) AS n_tokens
  FROM documents),
h AS (
  SELECT regexp_replace(regexp_replace(
           lower(regexp_extract(raw_url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
           ':(80|443)$', ''), '^www\.', '') AS host,
         n_tokens
  FROM r)
SELECT host,
       regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS registered_domain,
       count(*) AS n_docs, sum(n_tokens)::bigint AS total_tokens,
       (host IN ({blocked}))::int AS blocked
FROM h GROUP BY host
"""


def _training_order_sql() -> str:
    hk = _H56.format(expr="doc_id::varchar")
    return f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {hk}, doc_id) AS rnd
  FROM documents),
s AS (
  SELECT source, row_number() OVER (ORDER BY source) AS src_idx
  FROM (SELECT DISTINCT source FROM documents)),
n AS (SELECT count(*) AS n_sources FROM s)
SELECT ((rnd - 1) * n_sources + src_idx)::bigint AS ord,
       doc_id, source, rnd::bigint AS round
FROM r JOIN s USING (source) CROSS JOIN n
"""


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]) * "
        f"list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])), 3)"
    )


# integer-only hash identical to simsearch.plane_expr (two rounds of
# multiply-mod-2^31 mixing; the naive lattice formula gave near-parallel
# planes and ~0.01 recall)
_PLANE = (
    "list_transform(generate_series(1, 64), "
    "i -> ((((((i * 2654435761 + {jb}) % 2147483648)"
    " * 2654435761) % 2147483648) >> 7) % 2000)::DOUBLE / 1000.0 - 1.0)"
)


def _plane_sql(j: int) -> str:
    # (j+1)*1013904223 precomputed in Python: DuckDB would multiply the
    # two small literals as INT32 and overflow
    return _PLANE.format(jb=(j + 1) * 1013904223)


def _bucket_sql() -> str:
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_plane_sql(j)}) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(8)
    )
    return f"SELECT vec_id, ({bits})::int AS bucket, embedding FROM embeddings"


def _multiband_bucket_sql(n_bands: int = 12, planes_per_band: int = 5) -> str:
    """(vec_id, band_idx, bucket): band b uses global hyperplanes
    b*planes_per_band + j — same formula as simsearch.plane_expr."""
    parts = []
    for b in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
            f"{_plane_sql(b * planes_per_band + j)}) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(planes_per_band)
        )
        parts.append(
            f"SELECT vec_id, {b} AS band_idx, ({bits})::int AS bucket FROM embeddings"
        )
    return " UNION ALL ".join(parts)


# IVF coarse quantizer: same integer-hash family, offset constant
# (simsearch.centroid_values); half-norms embedded as identical Python
# float literals on both engines (simsearch.centroid_half_norm)
_CENTROID = (
    "list_transform(generate_series(1, 64), "
    "i -> ((((((i * 2654435761 + {cb}) % 2147483648)"
    " * 2654435761) % 2147483648) >> 7) % 2000)::DOUBLE / 1000.0 - 1.0)"
)


def _ivf_scores_sql(n_cells: int = 8, centroids: list | None = None) -> str:
    """Long-form (vec_id, cell, score) over all cells (UNION ALL).

    ``centroids`` swaps the hash-anchor formula for TRAINED cells: each
    centroid becomes an explicit DOUBLE[] literal (``repr`` round-trips
    Python floats exactly, so both engines subtract bit-identical
    half-norm constants and dot identical cell vectors — the same
    literal-embedding contract as the hash anchors)."""
    from pvsyst_pdf_parser_spark.training.simsearch import (
        _seq_half_norm,
        centroid_half_norm,
    )

    parts = []
    if centroids is not None:
        n_cells = len(centroids)
    for c in range(n_cells):
        if centroids is None:
            cent = _CENTROID.format(cb=(c + 101) * 40503)
            hn = repr(centroid_half_norm(64, c))
        else:
            cent = "[" + ", ".join(repr(v) for v in centroids[c]) + "]::DOUBLE[]"
            hn = repr(_seq_half_norm(centroids[c]))
        parts.append(
            f"SELECT vec_id, {c} AS cell, "
            f"list_dot_product(embedding::DOUBLE[], {cent}) - {hn} AS score "
            f"FROM embeddings"
        )
    return " UNION ALL ".join(parts)


def _ivf_rank_cte(n_cells: int = 8, centroids: list | None = None) -> str:
    return f"""
s AS ({_ivf_scores_sql(n_cells, centroids)}),
r AS (SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY score DESC, cell) AS rk
      FROM s)"""


def _semdedup_sql(n_cells: int = 8, threshold: float = 0.35) -> str:
    """SemDeDup oracle: cell assignment via the IVF rank CTE, pairwise
    cosine WITHIN a cell only, recursive-CTE components, keeper = the
    member with the lowest 6-dp cosine to its own cell centroid (ties
    to the lower vec_id) — the exact mirror of
    simsearch.semdedup_keepers."""
    cells = " UNION ALL ".join(
        f"SELECT {c} AS cell, {_CENTROID.format(cb=(c + 101) * 40503)} AS centroid"
        for c in range(n_cells)
    )
    cos6 = (
        "round(list_dot_product(m.embedding::DOUBLE[], cl.centroid::DOUBLE[])"
        " / sqrt(list_dot_product(m.embedding::DOUBLE[], m.embedding::DOUBLE[])"
        " * list_dot_product(cl.centroid::DOUBLE[], cl.centroid::DOUBLE[])), 6)"
    )
    return f"""
WITH RECURSIVE {_ivf_rank_cte(n_cells)},
m AS (
  SELECT r.vec_id, r.cell, e.embedding
  FROM r JOIN embeddings e USING (vec_id) WHERE r.rk = 1),
prs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE {_cos_sql("x.embedding", "y.embedding")} >= {threshold}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM prs
  UNION SELECT id_b, id_a FROM prs),
reach(src, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, rc.label FROM reach rc JOIN edges e ON e.src = rc.src),
clusters AS (SELECT src AS vec_id, min(label) AS cluster_rep
             FROM reach GROUP BY src),
cl AS ({cells}),
cs AS (
  SELECT m.vec_id, m.cell,
         coalesce(c.cluster_rep, m.vec_id) AS cluster_rep,
         {cos6} AS cos_centroid
  FROM m LEFT JOIN clusters c USING (vec_id) JOIN cl USING (cell)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_rep
                               ORDER BY cos_centroid, vec_id) AS pick
  FROM cs)
SELECT vec_id, cell, cluster_rep, cos_centroid, (pick = 1)::int AS keep
FROM ranked
"""


def _silhouette_sql(n_cells: int = 8) -> str:
    """Mirror of simsearch.cluster_silhouette_report: rank-1/rank-2
    cells from the IVF rank CTE, squared L2 per vector against both
    centroids (list_dot_product matches Spark's sequential fold), s
    rounded to 6 dp before the per-cell aggregate."""
    cells = " UNION ALL ".join(
        f"SELECT {c} AS cell, {_CENTROID.format(cb=(c + 101) * 40503)} AS centroid"
        for c in range(n_cells)
    )

    def sq_l2(cent: str) -> str:
        return (
            "round(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])"
            f" - 2.0 * list_dot_product(e.embedding::DOUBLE[], {cent}::DOUBLE[])"
            f" + list_dot_product({cent}::DOUBLE[], {cent}::DOUBLE[]), 6)"
        )

    return f"""
WITH {_ivf_rank_cte(n_cells)},
own AS (SELECT vec_id, cell FROM r WHERE rk = 1),
oth AS (SELECT vec_id, cell AS cell2 FROM r WHERE rk = 2),
cl AS ({cells}),
m AS (
  SELECT e.vec_id, own.cell,
         {sq_l2("c1.centroid")} AS a2,
         {sq_l2("c2.centroid")} AS b2
  FROM embeddings e
  JOIN own USING (vec_id) JOIN oth USING (vec_id)
  JOIN cl c1 ON c1.cell = own.cell
  JOIN cl c2 ON c2.cell = oth.cell2),
sil AS (
  SELECT cell,
         CASE WHEN greatest(a2, b2) <= 0.0 THEN 0.0
              ELSE round((b2 - a2) / greatest(a2, b2), 6) END AS s
  FROM m)
SELECT cell, count(*) AS n_vectors, round(avg(s), 4) AS mean_sil,
       min(s) AS min_sil, max(s) AS max_sil
FROM sil GROUP BY cell
"""


def _hill_sql(ks: tuple = (16, 32, 64)) -> str:
    """Mirror of textstats.hill_tail_index: top-(k+1) order statistics
    of n_chars with (size desc, doc_id) ties, Hill MLE per k."""
    klist = ", ".join(str(k) for k in ks)
    return f"""
WITH ranked AS (
  SELECT n_chars::DOUBLE AS x,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents),
ks AS (SELECT unnest([{klist}]) AS k),
j AS (SELECT k, x, rk FROM ks JOIN ranked ON rk <= k + 1),
a AS (
  SELECT k,
         min(CASE WHEN rk = k + 1 THEN x END) AS cut,
         sum(CASE WHEN rk <= k THEN ln(x) END) AS sum_log
  FROM j GROUP BY k)
SELECT k, cut::BIGINT AS tail_cut,
       round(k / (sum_log - k * ln(cut)), 4) AS hill_alpha
FROM a
"""


def _stopword_drift_sql() -> str:
    """Mirror of textstats.stopword_drift_regression: per-source
    population moments of (x = n_tokens, y = stop_hits / n_tokens)."""
    stop = " + ".join(_count_sql("t", m) for m in (" the ", " and ", " a "))
    return f"""
WITH s AS (
  SELECT source, len(string_split(text, ' ')) AS n_tokens,
         ' ' || lower(text) || ' ' AS t
  FROM documents),
p AS (
  SELECT source, n_tokens::DOUBLE AS x,
         ({stop})::DOUBLE / len_tokens AS y
  FROM (SELECT source, n_tokens, t, n_tokens AS len_tokens FROM s)),
m AS (
  SELECT source, count(*) AS n_docs,
         covar_pop(y, x) AS cxy, var_pop(x) AS vx,
         avg(y) AS my, avg(x) AS mx, corr(x, y) AS r
  FROM p GROUP BY source)
SELECT source, n_docs,
       round(1000.0 * cxy / vx, 4) AS slope_per_1k,
       round(my - (cxy / vx) * mx, 4) AS intercept,
       round(r, 4) AS pearson_r
FROM m
"""


def _quality_threshold_budget_sql(keep_num: int = 3, keep_den: int = 5) -> str:
    """Mirror of textstats.quality_threshold_budget: the v1 composite
    score (same replace-count stop_hits as text_quality_score, no
    sample filter), per-source rank window, integer-exact budget."""
    return f"""
WITH s AS (
  SELECT source, doc_id, length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         ' ' || lower(text) || ' ' AS t
  FROM documents),
h AS (
  SELECT source, doc_id,
         round(0.4 * least(1.0, n_chars / 500.0)
               + 0.3 * least(1.0,
                   (((length(t) - length(replace(t, ' the ', ''))) / 5)::bigint
                    + ((length(t) - length(replace(t, ' and ', ''))) / 5)::bigint
                    + ((length(t) - length(replace(t, ' a ', ''))) / 3)::bigint)
                   * 10.0 / n_tokens)
               + 0.3 * least(1.0, (n_chars / n_tokens) / 8.0), 4) AS q
  FROM s),
r AS (
  SELECT source, doc_id, q,
         row_number() OVER (PARTITION BY source
                            ORDER BY q DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n_docs
  FROM h),
th AS (
  SELECT source, max(n_docs) AS n_docs,
         ({keep_num} * max(n_docs) + {keep_den} - 1) // {keep_den}
             AS keep_budget,
         min(CASE WHEN rn <= ({keep_num} * n_docs + {keep_den} - 1)
                            // {keep_den}
                  THEN q END) AS threshold_q
  FROM r GROUP BY source),
k AS (
  SELECT r.source, count(*) AS n_kept_by_threshold
  FROM r JOIN th USING (source)
  WHERE r.q >= th.threshold_q GROUP BY r.source)
SELECT th.source, th.n_docs, th.keep_budget, th.threshold_q,
       k.n_kept_by_threshold,
       (k.n_kept_by_threshold - th.keep_budget) AS overshoot
FROM th JOIN k USING (source)
"""


def _repeat_decay_sql(
    repeats: tuple = (0, 1, 3, 7, 15, 31), r_star: float = 15.4
) -> str:
    """Mirror of sampling.repeat_decay_value: exact per-source token
    counts crossed with the bounded epoch grid; the decay multiplier
    is rounded to 4 dp before scaling so both engines multiply
    identical operands."""
    rlist = ", ".join(str(r) for r in repeats)
    return f"""
WITH per AS (
  SELECT source, sum(len(string_split(text, ' ')))::bigint AS unique_tokens
  FROM documents GROUP BY source),
grid AS (SELECT unnest([{rlist}]) AS repeats),
m AS (
  SELECT source, unique_tokens, (repeats + 1)::int AS epochs,
         round(1.0 + {r_star!r} * (1.0 - exp(-repeats / {r_star!r})), 4)
             AS mult
  FROM per CROSS JOIN grid)
SELECT source, epochs, unique_tokens,
       round(unique_tokens * mult, 2) AS effective_tokens,
       round(mult / epochs, 4) AS utility
FROM m
"""


def _source_js_sql() -> str:
    """Mirror of textstats.source_js_divergence: intersection join over
    per-source unigram distributions + the closed-form one-sided
    correction (½·ln2 per missing-mass unit)."""
    return """
WITH tk AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents),
c AS (SELECT source, tok, count(*) AS c FROM tk WHERE tok <> ''
      GROUP BY source, tok),
t AS (SELECT source, sum(c) AS t FROM c GROUP BY source),
d AS (SELECT c.source, c.tok, c.c / t.t AS p FROM c JOIN t USING (source)),
j AS (
  SELECT a.source AS source_a, b.source AS source_b, a.p AS p, b.p AS q
  FROM d a JOIN d b ON a.tok = b.tok AND a.source < b.source)
SELECT source_a, source_b, count(*) AS n_common_tokens,
       round(sum(0.5 * p * ln(2.0 * p / (p + q))
                 + 0.5 * q * ln(2.0 * q / (p + q)))
             + 0.5 * ln(2.0) * ((1.0 - sum(p)) + (1.0 - sum(q))), 4)
           AS js_nats
FROM j GROUP BY source_a, source_b
"""


def _minhash_band_recall_sql(threshold: float = 0.02, sample_mod: int = 5,
                             n_perms: int = 8, n_bands: int = 4) -> str:
    """Mirror of dedup.minhash_band_recall: exact-Jaccard true pairs
    and banded candidates from the SAME shingle CTE (signature/banding
    SQL generated from the same perm_params the Spark side uses)."""
    params = perm_params(n_perms)
    rpb = n_perms // n_bands
    h = _H56.format(expr="shingle")
    mh_cols = ", ".join(
        f"min(({a} * hm + {b}) % {MERSENNE_P}) AS mh{j}"
        for j, (a, b) in enumerate(params)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        + " || '_' || ".join(
            f"mh{b * rpb + r}::varchar" for r in range(rpb)
        )
        + " AS band_sig FROM sig"
        for b in range(n_bands)
    )
    return f"""
WITH {_shingle_cte(sample_mod)},
tp AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.doc_id < b.doc_id GROUP BY 1, 2) p
  JOIN sizes za ON za.doc_id = p.doc_a
  JOIN sizes zb ON zb.doc_id = p.doc_b
  WHERE round(n_common / (za.n + zb.n - n_common), 4) >= {threshold}),
hh AS (SELECT doc_id, ({h} % {MERSENNE_P}) AS hm FROM sh),
sig AS (SELECT doc_id, {mh_cols} FROM hh GROUP BY doc_id),
banded AS ({band_rows}),
cd AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b USING (band_idx, band_sig)
  WHERE a.doc_id < b.doc_id),
j AS (
  SELECT (tp.doc_a IS NOT NULL)::int AS is_true,
         (cd.doc_a IS NOT NULL)::int AS is_cand
  FROM tp FULL JOIN cd ON tp.doc_a = cd.doc_a AND tp.doc_b = cd.doc_b)
SELECT sum(is_true)::bigint AS n_true_pairs,
       sum(is_cand)::bigint AS n_candidates,
       sum(is_true * is_cand)::bigint AS n_caught,
       round(sum(is_true * is_cand) / sum(is_true), 4) AS recall,
       round(sum(is_true * is_cand) / sum(is_cand), 4) AS precision
FROM j
"""


def _detector_agreement_sql(sample_mod: int = 10) -> str:
    """Mirror of dedup.detector_agreement: the two existing detector
    oracles composed as scoped subqueries (each keeps its own WITH
    namespace) over the SAME sample universe, full-joined on the pair
    key."""
    mh = _minhash_sql(sample_mod=sample_mod)
    sp = _simhash_pairs_sql(sample_mod=sample_mod)
    return f"""
WITH mh AS (SELECT doc_a, doc_b FROM ({mh})),
sp AS (SELECT doc_a, doc_b FROM ({sp})),
j AS (
  SELECT (mh.doc_a IS NOT NULL)::int AS in_mh,
         (sp.doc_a IS NOT NULL)::int AS in_sp
  FROM mh FULL JOIN sp ON mh.doc_a = sp.doc_a AND mh.doc_b = sp.doc_b)
SELECT sum(in_mh)::bigint AS n_minhash_pairs,
       sum(in_sp)::bigint AS n_simhash_pairs,
       sum(in_mh * in_sp)::bigint AS n_both,
       round(sum(in_mh * in_sp) / count(*), 4) AS pair_jaccard
FROM j
"""


def _ivf_topk_sql(n_queries: int = 5, k: int = 3, n_probe: int = 2) -> str:
    return f"""
WITH {_ivf_rank_cte()},
home AS (SELECT vec_id AS cand_id, cell FROM r WHERE rk = 1),
probes AS (SELECT vec_id AS query_id, cell FROM r
           WHERE rk <= {n_probe} AND vec_id < {n_queries}),
cand AS (
  SELECT DISTINCT probes.query_id, home.cand_id
  FROM probes JOIN home USING (cell)
  WHERE probes.query_id <> home.cand_id),
sc AS (
  SELECT cand.query_id, cand.cand_id,
         {_cos_sql("qe.embedding", "ce.embedding")} AS cos_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.cand_id),
rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, cand_id) AS rank
       FROM sc)
SELECT query_id, cand_id, cos_sim, rank::int AS rank FROM rr WHERE rank <= {k}
"""


def _ivf_recall_sql(
    n_queries: int = 20, k: int = 5, n_probe: int = 2,
    centroids: list | None = None,
) -> str:
    return f"""
WITH RECURSIVE {_ivf_rank_cte(centroids=centroids)},
home AS (SELECT vec_id AS cand_id, cell FROM r WHERE rk = 1),
probes AS (SELECT vec_id AS query_id, cell FROM r
           WHERE rk <= {n_probe} AND vec_id < {n_queries}),
cand AS (
  SELECT DISTINCT probes.query_id, home.cand_id
  FROM probes JOIN home USING (cell)
  WHERE probes.query_id <> home.cand_id),
sc AS (
  SELECT cand.query_id, cand.cand_id,
         {_cos_sql("qe.embedding", "ce.embedding")} AS cos_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.cand_id),
approx AS (SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, cand_id) AS rank
    FROM sc) WHERE rank <= {k}),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS cand_id, embedding FROM embeddings),
ts AS (SELECT query_id, cand_id, {_cos_sql("q_emb", "embedding")} AS cos_sim
       FROM q CROSS JOIN c WHERE query_id <> cand_id),
truth AS (SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, cand_id) AS rank
    FROM ts) WHERE rank <= {k}),
hits AS (SELECT t.query_id, t.cand_id
         FROM truth t JOIN approx a USING (query_id, cand_id))
SELECT {n_queries} AS n_queries, {k} AS k,
       (SELECT count(*) FROM hits) AS n_hits,
       (SELECT count(*) FROM truth) AS n_truth,
       round((SELECT count(*) FROM hits) / (SELECT count(*) FROM truth), 4)
         AS recall
"""


def _ivf_trained_recall_ab_sql() -> str:
    """A/B: hash-anchor IVF recall vs trained-centroid IVF recall, one
    row per variant (mirrors simsearch.ivf_trained_recall_ab)."""
    return f"""
SELECT 'anchors' AS variant, * FROM ({_ivf_recall_sql()})
UNION ALL
SELECT 'trained' AS variant, * FROM ({_ivf_recall_sql(centroids=_trained_centroids())})
"""


def _fuzzy_decontam_sql(
    threshold: float = 0.05, bench_mod: int = 50,
    n_perms: int = 8, n_bands: int = 4,
) -> str:
    # cross-set (corpus × benchmark) variant of _minhash_sql: same
    # shingles, hash, signature and banding arithmetic; candidates come
    # from a band join BETWEEN the two sets instead of a self-join
    params = perm_params(n_perms)
    rpb = n_perms // n_bands
    h = _H56.format(expr="shingle")
    mh_cols = ", ".join(
        f"min(({a} * hm + {b}) % {MERSENNE_P}) AS mh{j}"
        for j, (a, b) in enumerate(params)
    )

    def band_rows(sig: str, idc: str) -> str:
        return " UNION ALL ".join(
            f"SELECT doc_id AS {idc}, {b} AS band_idx, "
            + " || '_' || ".join(
                f"mh{b * rpb + r}::varchar" for r in range(rpb)
            )
            + f" AS band_sig FROM {sig}"
            for b in range(n_bands)
        )

    sh_tpl = """
  sh{t} AS (
    SELECT DISTINCT doc_id,
           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
    FROM {src}, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)),
  h{t} AS (SELECT doc_id, ({h} % {p}) AS hm FROM sh{t}),
  sig{t} AS (SELECT doc_id, {mh} FROM h{t} GROUP BY doc_id),
  sz{t} AS (SELECT doc_id, count(*) AS n FROM sh{t} GROUP BY doc_id)"""
    return f"""
WITH d0 AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS toks
  FROM documents),
corp AS (SELECT * FROM d0 WHERE doc_id % {bench_mod} <> 0),
ben AS (SELECT * FROM d0 WHERE doc_id % {bench_mod} = 0),
{sh_tpl.format(t="c", src="corp", h=h, p=MERSENNE_P, mh=mh_cols)},
{sh_tpl.format(t="b", src="ben", h=h, p=MERSENNE_P, mh=mh_cols)},
bandc AS ({band_rows("sigc", "doc_id")}),
bandb AS ({band_rows("sigb", "bench_id")}),
cand AS (
  SELECT DISTINCT c.doc_id, b.bench_id
  FROM bandc c JOIN bandb b USING (band_idx, band_sig)),
common AS (
  SELECT cand.doc_id, cand.bench_id, count(*) AS n_common
  FROM cand
  JOIN shc ON shc.doc_id = cand.doc_id
  JOIN shb ON shb.doc_id = cand.bench_id AND shb.shingle = shc.shingle
  GROUP BY cand.doc_id, cand.bench_id),
jac AS (
  SELECT doc_id, bench_id,
         round(n_common / (szc.n + szb2.n - n_common), 4) AS j
  FROM common
  JOIN szc USING (doc_id)
  JOIN (SELECT doc_id AS bench_id, n FROM szb) szb2 USING (bench_id)
  WHERE round(n_common / (szc.n + szb2.n - n_common), 4) >= {threshold}),
per_doc AS (SELECT doc_id, max(j) AS max_jac FROM jac GROUP BY doc_id)
SELECT source, count(*)::bigint AS n_docs,
       sum(CASE WHEN max_jac IS NOT NULL THEN 1 ELSE 0 END)::bigint
         AS n_flagged,
       round(avg(CASE WHEN max_jac IS NOT NULL THEN 1 ELSE 0 END), 4)
         AS flagged_rate,
       round(coalesce(max(max_jac), 0), 4) AS max_jaccard
FROM corp LEFT JOIN per_doc USING (doc_id)
GROUP BY source
"""


def _hard_negatives_sql(
    n_queries: int = 5, k: int = 5, dup_threshold: float = 0.4
) -> str:
    # same multiband candidate join as _multiband_topk_sql, with the
    # near-dup exclusion (cos < threshold) applied BEFORE ranking —
    # mirrors simsearch.hard_negatives exactly
    return f"""
WITH bb AS ({_multiband_bucket_sql()}),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
  FROM bb q JOIN bb c USING (band_idx, bucket)
  WHERE q.vec_id < {n_queries} AND q.vec_id <> c.vec_id),
s AS (
  SELECT cand.query_id, cand.cand_id,
         {_cos_sql("qe.embedding", "ce.embedding")} AS cos_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.cand_id),
f AS (SELECT * FROM s WHERE cos_sim < {dup_threshold}),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, cand_id) AS rank
      FROM f)
SELECT query_id, cand_id AS neg_id, cos_sim, rank::int AS rank
FROM r WHERE rank <= {k}
"""


def _source_mixture_sql(alpha: float = 0.7, budget: int = 100_000) -> str:
    return f"""
WITH p AS (
  SELECT source, sum(len(string_split(text, ' ')))::bigint AS n_tokens
  FROM documents GROUP BY source),
w AS (SELECT source, n_tokens,
             pow(n_tokens::DOUBLE, {alpha}) AS wraw FROM p),
t AS (SELECT sum(wraw) AS wsum FROM w)
SELECT source, n_tokens,
       round(wraw / wsum, 9) AS weight,
       floor({float(budget)} * wraw / wsum)::bigint AS expected_tokens,
       round({float(budget)} * wraw / wsum / n_tokens, 6) AS epochs
FROM w CROSS JOIN t
"""


def _multiband_topk_sql(n_queries: int = 5, k: int = 3) -> str:
    return f"""
WITH bb AS ({_multiband_bucket_sql()}),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
  FROM bb q JOIN bb c USING (band_idx, bucket)
  WHERE q.vec_id < {n_queries} AND q.vec_id <> c.vec_id),
s AS (
  SELECT cand.query_id, cand.cand_id,
         {_cos_sql("qe.embedding", "ce.embedding")} AS cos_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.cand_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, cand_id) AS rank
      FROM s)
SELECT query_id, cand_id, cos_sim, rank::int AS rank FROM r WHERE rank <= {k}
"""


def _ann_recall_sql(n_queries: int = 20, k: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
           FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS cand_id, embedding FROM embeddings),
ts AS (SELECT query_id, cand_id, {_cos_sql("q_emb", "embedding")} AS cos_sim
       FROM q CROSS JOIN c WHERE query_id <> cand_id),
truth AS (SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, cand_id) AS rank
    FROM ts) WHERE rank <= {k}),
bb AS ({_multiband_bucket_sql()}),
cand AS (
  SELECT DISTINCT bq.vec_id AS query_id, bc.vec_id AS cand_id
  FROM bb bq JOIN bb bc USING (band_idx, bucket)
  WHERE bq.vec_id < {n_queries} AND bq.vec_id <> bc.vec_id),
s AS (
  SELECT cand.query_id, cand.cand_id,
         {_cos_sql("qe.embedding", "ce.embedding")} AS cos_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.cand_id),
approx AS (SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, cand_id) AS rank
    FROM s) WHERE rank <= {k}),
hits AS (SELECT t.query_id, t.cand_id
         FROM truth t JOIN approx a USING (query_id, cand_id))
SELECT {n_queries} AS n_queries, {k} AS k,
       (SELECT count(*) FROM hits) AS n_hits,
       (SELECT count(*) FROM truth) AS n_truth,
       round((SELECT count(*) FROM hits) / (SELECT count(*) FROM truth), 4)
         AS recall
"""


def _ann_jl_recall_sql(
    n_queries: int = 20, k: int = 5, dim: int = 64, out_dim: int = 16
) -> str:
    """DuckDB replay of simsearch.jl_recall_report: the SAME ±1 sign
    arrays (driver-side jl_sign_values, embedded as literals on both
    engines) project every embedding to out_dim components via
    list_dot_product; truth and projected-space top-k both rank by
    (round(cos, 3) DESC, cand_id)."""
    signs = ", ".join(
        "["
        + ", ".join(repr(v) for v in S.jl_sign_values(dim, j))
        + "]::DOUBLE[]"
        for j in range(out_dim)
    )
    proj = ", ".join(
        f"list_dot_product(embedding::DOUBLE[], s.signs[{j + 1}])"
        for j in range(out_dim)
    )
    return f"""
WITH s AS (SELECT [{signs}] AS signs),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS cand_id, embedding FROM embeddings),
ts AS (SELECT query_id, cand_id, {_cos_sql("q_emb", "embedding")} AS cos_sim
       FROM q CROSS JOIN c WHERE query_id <> cand_id),
truth AS (SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, cand_id) AS rank
    FROM ts) WHERE rank <= {k}),
pj AS (SELECT vec_id, [{proj}] AS proj FROM embeddings, s),
ps AS (SELECT pq.vec_id AS query_id, pc.vec_id AS cand_id,
              {_cos_sql("pq.proj", "pc.proj")} AS cos_sim
       FROM pj pq CROSS JOIN pj pc
       WHERE pq.vec_id < {n_queries} AND pq.vec_id <> pc.vec_id),
approx AS (SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, cand_id) AS rank
    FROM ps) WHERE rank <= {k}),
hits AS (SELECT t.query_id, t.cand_id
         FROM truth t JOIN approx a USING (query_id, cand_id))
SELECT {out_dim} AS out_dim, {n_queries} AS n_queries, {k} AS k,
       (SELECT count(*) FROM hits) AS n_hits,
       (SELECT count(*) FROM truth) AS n_truth,
       round((SELECT count(*) FROM hits) / (SELECT count(*) FROM truth), 4)
         AS recall
"""


def _quality_reliability_sql(n_bins: int = 10) -> str:
    """DuckDB replay of qualitymodel.quality_reliability_report: the
    SAME weak-label and frozen-weight score CTEs as the model oracle,
    score rounded ONCE to integer ppm, bin + every aggregate in exact
    bigint arithmetic (Guo 2017 ECE binning)."""
    m = _quality_model()
    nb = m["n_buckets"]
    warr = "[" + ", ".join(repr(float(x)) for x in m["weights"]) + "]::DOUBLE[]"
    bias = repr(float(m["bias"]))
    stop = " + ".join(_count_sql("t", x) for x in (" the ", " and ", " a "))
    bucket = "((('0x' || substr(md5(x), 1, 14))::bigint) % " + str(nb) + ")::int"
    return f"""
WITH s AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS t,
         string_split(lower(text), ' ') AS ltoks,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM documents),
h AS (
  SELECT doc_id, ltoks, n_tokens,
         (n_chars - (n_tokens - 1)) / n_tokens AS mwl,
         n_types / n_tokens AS ttr,
         ({stop}) AS stop_hits,
         ({_count_sql("t", "#")} + {_count_sql("t", "...")}) AS symbol_hits
  FROM s),
lab AS (
  SELECT doc_id, ltoks,
         (((mwl >= 3.0 AND mwl <= 10.0)::int + (stop_hits >= 2)::int
           + (symbol_hits * 10 <= n_tokens)::int + (ttr >= 0.2)::int
           + (n_tokens >= 50 AND n_tokens <= 100000)::int) >= 4)::int
           AS label
  FROM h),
sc AS (
  SELECT label,
         round((1.0 / (1.0 + exp(-({bias}
           + list_sum(list_transform(ltoks,
               x -> ({warr})[{bucket} + 1])) / len(ltoks)))))
           * 1000000)::bigint AS s_ppm
  FROM lab),
b AS (
  SELECT label, s_ppm,
         least(s_ppm * {n_bins} // 1000000, {n_bins - 1})::int AS bin
  FROM sc),
g AS (
  SELECT bin, count(*)::bigint AS n_docs, sum(label)::bigint AS n_pos,
         sum(s_ppm)::bigint AS sum_ppm
  FROM b GROUP BY bin)
SELECT bin, n_docs, n_pos,
       (sum_ppm // n_docs)::bigint AS conf_ppm,
       (n_pos * 1000000 // n_docs)::bigint AS acc_ppm,
       abs(sum_ppm // n_docs - n_pos * 1000000 // n_docs)::bigint AS gap_ppm,
       (abs(sum_ppm // n_docs - n_pos * 1000000 // n_docs)
        * n_docs)::bigint AS ece_part_ppm_docs
FROM g
"""


def _quality_model_sql(tau: float = 0.5) -> str:
    """DuckDB replay of qualitymodel.quality_model_report with the SAME
    frozen fixture weights as array literals: weak label = the 5-rule
    quality gate (textstats.quality_gate_expr), score = sigmoid(bias +
    mean over tokens of weights[md5_56(token) % n_buckets])."""
    m = _quality_model()
    nb = m["n_buckets"]
    warr = "[" + ", ".join(repr(float(x)) for x in m["weights"]) + "]::DOUBLE[]"
    bias = repr(float(m["bias"]))
    stop = " + ".join(_count_sql("t", x) for x in (" the ", " and ", " a "))
    bucket = "((('0x' || substr(md5(x), 1, 14))::bigint) % " + str(nb) + ")::int"
    return f"""
WITH s AS (
  SELECT doc_id, source, ' ' || lower(text) || ' ' AS t,
         string_split(lower(text), ' ') AS ltoks,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM documents),
h AS (
  SELECT doc_id, source, ltoks, n_tokens,
         (n_chars - (n_tokens - 1)) / n_tokens AS mwl,
         n_types / n_tokens AS ttr,
         ({stop}) AS stop_hits,
         ({_count_sql("t", "#")} + {_count_sql("t", "...")}) AS symbol_hits
  FROM s),
lab AS (
  SELECT doc_id, source, ltoks,
         (((mwl >= 3.0 AND mwl <= 10.0)::int + (stop_hits >= 2)::int
           + (symbol_hits * 10 <= n_tokens)::int + (ttr >= 0.2)::int
           + (n_tokens >= 50 AND n_tokens <= 100000)::int) >= 4)::int
           AS label
  FROM h),
sc AS (
  SELECT source, label,
         round(1.0 / (1.0 + exp(-({bias}
           + list_sum(list_transform(ltoks,
               x -> ({warr})[{bucket} + 1])) / len(ltoks)))), 6) AS score
  FROM lab),
p AS (SELECT source, label, score, (score >= {tau})::int AS pred FROM sc)
SELECT source, count(*) AS n_docs,
       sum(label)::bigint AS n_pos,
       round(avg(CASE WHEN label = 1 THEN score END), 4) AS mean_score_pos,
       round(avg(CASE WHEN label = 0 THEN score END), 4) AS mean_score_neg,
       sum(pred)::bigint AS n_above_tau,
       sum((pred = label)::int)::bigint AS n_agree,
       round(avg((pred = label)::int), 4) AS agree_rate
FROM p GROUP BY source
"""


def _snapshot_latest_sql() -> str:
    """Keep-latest per canonical url.  The oracle derives the canonical
    form DIRECTLY from the snapshot-template arithmetic (an independent
    derivation, not a replay of the regex pipeline), so it cross-checks
    both the keep-latest window AND canonicalize_url's output on these
    urls."""
    return """
WITH r AS (
  SELECT doc_id,
         printf('https://www.site%d.example.com/page/%d?v=1',
                (doc_id // 4) % 13, doc_id // 4) AS canonical_url,
         TIMESTAMP '2024-01-01 00:00:00'
           + (doc_id % 4) * INTERVAL 1 DAY
           + (doc_id % 7) * INTERVAL 1 MINUTE AS warc_ts
  FROM documents)
SELECT doc_id, canonical_url, warc_ts,
       count(*) OVER (PARTITION BY canonical_url) AS n_captures,
       (row_number() OVER (PARTITION BY canonical_url
                           ORDER BY warc_ts DESC, doc_id DESC) = 1)::int
         AS is_latest
FROM r
"""


def _pagerank_sql(iters: int = 3, damping: float = 0.85,
                  top_k: int = 20) -> str:
    """Unrolled fixed-iteration damped PageRank with uniform dangling-
    mass redistribution — the same rounds link_pagerank runs, one CTE
    pair (dangling mass, inflow) per iteration."""
    d = repr(float(damping))
    parts = [f"""
WITH nn AS (SELECT count(*)::double AS n FROM documents),
ids AS (SELECT doc_id FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * a + b) % n::bigint AS dst
    FROM documents, nn, (VALUES (7, 1), (13, 3), (31, 5)) t(a, b)) e
  WHERE src % 10 != 0 AND src != dst),
outdeg AS (SELECT src, count(*)::double AS outdeg FROM edges GROUP BY src),
dang AS (SELECT doc_id FROM ids
         WHERE doc_id NOT IN (SELECT src FROM edges)),
pr0 AS (SELECT doc_id, 1.0 / n AS pr FROM ids, nn)"""]
    for i in range(iters):
        parts.append(f""",
dm{i} AS (SELECT coalesce(sum(pr), 0.0) AS dm
          FROM pr{i} JOIN dang USING (doc_id)),
c{i} AS (SELECT e.dst AS doc_id, sum(p.pr / o.outdeg) AS inflow
         FROM edges e
         JOIN pr{i} p ON p.doc_id = e.src
         JOIN outdeg o ON o.src = e.src
         GROUP BY e.dst),
pr{i + 1} AS (
  SELECT i.doc_id,
         (1.0 - {d}) / n + {d} * (coalesce(c.inflow, 0.0) + dm.dm / n) AS pr
  FROM ids i LEFT JOIN c{i} c USING (doc_id), dm{i} dm, nn)""")
    parts.append(f"""
SELECT doc_id, round(pr * n, 8) AS rank_x_n
FROM pr{iters}, nn
ORDER BY rank_x_n DESC, doc_id
LIMIT {top_k}
""")
    return "".join(parts)


def _hits_sql(iters: int = 3, top_k: int = 20) -> str:
    """Unrolled fixed-iteration HITS over the same deterministic edge
    CTE as the PageRank oracle — UNNORMALIZED rounds (no order-
    dependent global float normalizer), one max-scaled rounding at the
    end, top-k sorted on the ROUNDED authority (crawl.link_hits)."""
    parts = ["""
WITH nn AS (SELECT count(*)::double AS n FROM documents),
ids AS (SELECT doc_id FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * a + b) % n::bigint AS dst
    FROM documents, nn, (VALUES (7, 1), (13, 3), (31, 5)) t(a, b)) e
  WHERE src % 10 != 0 AND src != dst),
h0 AS (SELECT doc_id, 1.0 AS h FROM ids)"""]
    for i in range(iters):
        parts.append(f""",
a{i + 1} AS (
  SELECT i.doc_id, coalesce(s.a, 0.0) AS a
  FROM ids i LEFT JOIN (
    SELECT e.dst AS doc_id, sum(h.h) AS a
    FROM edges e JOIN h{i} h ON h.doc_id = e.src GROUP BY e.dst) s
  USING (doc_id)),
h{i + 1} AS (
  SELECT i.doc_id, coalesce(s.h, 0.0) AS h
  FROM ids i LEFT JOIN (
    SELECT e.src AS doc_id, sum(a.a) AS h
    FROM edges e JOIN a{i + 1} a ON a.doc_id = e.dst GROUP BY e.src) s
  USING (doc_id))""")
    parts.append(f""",
mx AS (SELECT max(a) AS amax FROM a{iters}),
mh AS (SELECT max(h) AS hmax FROM h{iters})
SELECT a.doc_id,
       round(a.a / mx.amax, 8) AS auth_norm,
       round(h.h / mh.hmax, 8) AS hub_norm
FROM a{iters} a JOIN h{iters} h USING (doc_id), mx, mh
ORDER BY auth_norm DESC, doc_id
LIMIT {top_k}
""")
    return "".join(parts)


def _bloom_dedup_sql(m: int = CR.BLOOM_M, k: int = CR.BLOOM_K) -> str:
    """Bit-exact replay of the Bloom incremental-dedup gate: same
    md5-derived positions, same m-bit filter over the prior corpus,
    so even the FALSE POSITIVES match row-for-row."""
    g = _H56
    probe = " AND ".join(
        "({h} % {m}) IN (SELECT p FROM bits)".format(
            h=g.format(expr="'b%d:' || text" % j), m=m
        )
        for j in range(k)
    )
    js = ", ".join(str(j) for j in range(k))
    return f"""
WITH prior AS (SELECT * FROM documents),
newb AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 4 = 0 THEN text
              ELSE text || ' fresh ' || doc_id END AS text
  FROM documents),
bits AS (
  SELECT DISTINCT
         ({g.format(expr="'b' || j || ':' || text")} % {m}) AS p
  FROM prior, (SELECT unnest([{js}]) AS j) jj),
ph AS (SELECT DISTINCT {g.format(expr="text")} AS h FROM prior),
np AS (
  SELECT doc_id, source, {g.format(expr="text")} AS h,
         ({probe}) AS maybe
  FROM newb)
SELECT doc_id, source, maybe::int AS bloom_maybe_dup,
       (maybe AND h IN (SELECT h FROM ph))::int AS verified_dup,
       (maybe AND h NOT IN (SELECT h FROM ph))::int AS false_positive
FROM np
"""


def _trigram_backoff_sql(
    top_m3: int = 4096, top_m2: int = 4096, backoff: float = 0.4
) -> str:
    """DuckDB replay of textstats.trigram_backoff_scores: same pruned
    top-m n-gram tables (count-desc, lexicographic tie-break), same
    Stupid Backoff chain and 0.4 factors, same 4-decimal round."""
    b = repr(float(backoff))
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
toku AS (SELECT doc_id, u.tok FROM base, unnest(t) AS u(tok)),
uni AS (SELECT tok, count(*) AS c1 FROM toku GROUP BY tok),
tot AS (SELECT sum(c1)::double AS n_total FROM uni),
pairs AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM base, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2),
bi AS (
  SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2
  ORDER BY c12 DESC, w1, w2 LIMIT {top_m2}),
triples AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
  FROM base, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3),
tri AS (
  SELECT w1, w2, w3, count(*) AS c123 FROM triples GROUP BY w1, w2, w3
  ORDER BY c123 DESC, w1, w2, w3 LIMIT {top_m3}),
scored AS (
  SELECT tr.doc_id,
         CASE WHEN t3.c123 IS NOT NULL AND bc.c12 IS NOT NULL
              THEN 1 ELSE 0 END AS tri_hit,
         CASE WHEN bb.c12 IS NOT NULL THEN 1 ELSE 0 END AS bi_hit,
         CASE WHEN t3.c123 IS NOT NULL AND bc.c12 IS NOT NULL
              THEN ln(t3.c123 / bc.c12)
              WHEN bb.c12 IS NOT NULL
              THEN ln({b} * bb.c12 / u2.c1)
              ELSE ln({b} * {b} * u3.c1 / tot.n_total) END AS lp
  FROM triples tr
  LEFT JOIN tri t3
    ON t3.w1 = tr.w1 AND t3.w2 = tr.w2 AND t3.w3 = tr.w3
  LEFT JOIN bi bc ON bc.w1 = tr.w1 AND bc.w2 = tr.w2
  LEFT JOIN bi bb ON bb.w1 = tr.w2 AND bb.w2 = tr.w3
  JOIN uni u2 ON u2.tok = tr.w2
  JOIN uni u3 ON u3.tok = tr.w3, tot)
SELECT doc_id, count(*)::bigint AS n_trigrams,
       sum(tri_hit)::bigint AS n_tri_hits,
       sum(CASE WHEN tri_hit = 0 THEN bi_hit ELSE 0 END)::bigint
         AS n_bi_hits,
       round(avg(lp), 4) AS avg_lp
FROM scored GROUP BY doc_id
"""


def _weighted_sample_sql(k: int = 40) -> str:
    """DuckDB replay of sampling.weighted_sample_topk: the same
    md5-uniform, the same IEEE double chain ln(u)/w, the same
    (key desc, doc_id) total order."""
    h = _H56.format(expr="doc_id::varchar")
    denom = repr(float(1 << 56))
    return f"""
WITH keyed AS (
  SELECT doc_id, source,
         greatest(1, len(list_filter(string_split(lower(text), ' '),
                                     x -> x <> '')))::bigint AS weight,
         ln(({h} + 1) / {denom})
           / greatest(1, len(list_filter(string_split(lower(text), ' '),
                                         x -> x <> '')))::bigint AS es_key
  FROM documents),
top AS (
  SELECT doc_id, source, weight, es_key
  FROM keyed ORDER BY es_key DESC, doc_id LIMIT {k})
SELECT doc_id, source, weight,
       row_number() OVER (ORDER BY es_key DESC, doc_id)::bigint
         AS sel_rank,
       round(es_key, 6) AS es_key_r
FROM top ORDER BY sel_rank
"""


def _zorder_layout_sql(n_files: int = 16) -> str:
    """DuckDB replay of zorder.zorder_file_stats: identical bucketize
    → Morton bit-interleave → fixed-width range split arithmetic."""
    h = _H56.format(expr="source::varchar")
    terms = " + ".join(
        f"(((a >> {i}) & 1) * {1 << (2 * i + 1)})"
        f" + (((b >> {i}) & 1) * {1 << (2 * i)})"
        for i in range(8)
    )
    cell = (1 << 16) // n_files
    return f"""
WITH keyed AS (
  SELECT ({h} % 256)::bigint AS a,
         least(255, n_chars // 64)::bigint AS b
  FROM documents),
zed AS (SELECT a, b, ({terms})::bigint AS z FROM keyed),
f AS (SELECT a, b, z, (z // {cell})::bigint AS file_id FROM zed)
SELECT file_id, count(*)::bigint AS n_docs,
       min(a) AS a_min, max(a) AS a_max,
       min(b) AS b_min, max(b) AS b_max,
       min(z) AS z_min, max(z) AS z_max
FROM f GROUP BY file_id ORDER BY file_id
"""


def _salted_skew_join_sql() -> str:
    """Oracle for demo_queries.salted_skew_join: the PLAIN unsalted
    join — salting must be result-invariant, which is the assertion."""
    h = _H56.format(expr="event_type")
    return f"""
WITH dim AS (
  SELECT event_type, ({h} % 1000)::bigint AS weight_ppk
  FROM (SELECT DISTINCT event_type FROM events)),
fact AS (
  SELECT event_type, floor(value * 1000)::bigint AS v_milli FROM events)
SELECT f.event_type, count(*)::bigint AS n_events,
       sum(f.v_milli)::bigint AS sum_v_milli,
       (sum(f.v_milli) * min(d.weight_ppk))::bigint AS weighted_milli_ppk
FROM fact f JOIN dim d ON d.event_type = f.event_type
GROUP BY f.event_type ORDER BY f.event_type
"""


def oracle_sql() -> dict[str, str]:
    g = _H56
    out = {
        "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "broadcast_join_revenue": """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "topk_customers": """
SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
FROM orders GROUP BY o_custkey
ORDER BY spend DESC, o_custkey LIMIT 10
""",
        "window_lead_gaps": """
WITH g AS (
  SELECT user_id,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS gap_us
  FROM events)
SELECT user_id, count(*) AS n_events,
       sum(gap_us)::bigint AS total_gap_us, max(gap_us)::bigint AS max_gap_us
FROM g GROUP BY user_id
""",
        "fill_forward_last_purchase": """
WITH c AS (
  SELECT user_id,
         last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lpv
  FROM events)
SELECT user_id,
       count(CASE WHEN lpv > 50.0 THEN 1 END) AS n_after_big_purchase
FROM c GROUP BY user_id
""",
        "sessionize": """
WITH f AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
              ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, sum(new_session)::bigint AS n_sessions, count(*) AS n_events
FROM f GROUP BY user_id
""",
        "even_split_allocation": """
WITH s AS (
  SELECT l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_orderkey) AS n_lines,
         (floor(min(l_extendedprice) OVER (PARTITION BY l_orderkey) / 100))::int
           AS budget
  FROM lineitem WHERE l_orderkey % 50 = 0)
SELECT l_orderkey, l_linenumber,
       (floor(budget / n_lines)
        + CASE WHEN rn <= budget % n_lines THEN 1 ELSE 0 END)::bigint AS alloc
FROM s
""",
        "capped_round_robin": """
WITH s AS (
  SELECT l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_orderkey) AS n_ep,
         sum(l_quantity::int) OVER (PARTITION BY l_orderkey) AS total
  FROM lineitem WHERE l_orderkey % 50 = 0)
SELECT l_orderkey, l_linenumber,
       (CASE WHEN total <= n_ep * 7
             THEN least(floor(total / n_ep)
                        + CASE WHEN rn <= total % n_ep THEN 1 ELSE 0 END, 7)
             ELSE 7 + floor(greatest(total - n_ep * 7, 0) / n_ep)
                    + CASE WHEN rn <= greatest(total - n_ep * 7, 0) % n_ep
                           THEN 1 ELSE 0 END
        END)::bigint AS alloc
FROM s
""",
        "gap_fill_rank": """
WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 20 = 0),
used AS (
  SELECT l_orderkey, array_agg(l_linenumber) AS used_nums,
         max(l_linenumber) AS max_used
  FROM li WHERE l_returnflag <> 'R' GROUP BY l_orderkey),
nm AS (SELECT l_orderkey, count(*) AS n_missing FROM li
       WHERE l_returnflag = 'R' GROUP BY l_orderkey),
miss AS (
  SELECT l_orderkey, l_partkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_partkey, l_linenumber) AS miss_rank
  FROM li WHERE l_returnflag = 'R'),
slots AS (
  SELECT nm.l_orderkey, t.num,
         row_number() OVER (PARTITION BY nm.l_orderkey ORDER BY t.num) AS slot_rank
  FROM nm LEFT JOIN used ON nm.l_orderkey = used.l_orderkey,
       unnest(generate_series(1, coalesce(used.max_used, 0) + nm.n_missing)) AS t(num)
  WHERE NOT list_contains(coalesce(used.used_nums, []), t.num))
SELECT m.l_orderkey, m.l_partkey, m.l_linenumber,
       s.num::bigint AS assigned_label
FROM miss m JOIN slots s
  ON m.l_orderkey = s.l_orderkey AND m.miss_rank = s.slot_rank
""",
        "asof_nearest_view": """
WITH ev AS (SELECT * FROM events WHERE user_id < 15),
clicks AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
           FROM ev WHERE event_type = 'click'),
views AS (SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
          FROM ev WHERE event_type = 'view'),
p AS (
  SELECT c.user_id, c.click_id, v.view_id,
         abs(c.click_us - v.view_us) AS dist,
         row_number() OVER (PARTITION BY c.click_id
                            ORDER BY abs(c.click_us - v.view_us), v.view_id) AS rn
  FROM clicks c JOIN views v USING (user_id))
SELECT user_id, click_id, view_id, dist::bigint AS dist FROM p WHERE rn = 1
""",
        "proportional_allocation": """
WITH spend AS (
  SELECT c_nationkey, c_custkey, sum(o_totalprice) AS spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, c_custkey)
SELECT c_nationkey, c_custkey,
       (floor(spend * 1000000 / nation_total))::bigint AS share_ppm
FROM (SELECT *, sum(spend) OVER (PARTITION BY c_nationkey) AS nation_total
      FROM spend)
WHERE c_custkey % 25 = 0
""",
        "first_seen_type_ids": """
WITH f AS (SELECT event_type, min(ts) AS first_ts, min(event_id) AS first_id
           FROM events GROUP BY event_type)
SELECT event_type,
       row_number() OVER (ORDER BY first_ts, first_id) AS type_id
FROM f
""",
        # oracle = the PLAIN group-by: salting must be result-invariant
        "salted_hot_key_agg": """
SELECT event_type, count(*) AS n_events,
       sum(regexp_extract(props, '"k":\\s*(\\d+)', 1)::int)::bigint AS sum_k,
       round(sum(regexp_extract(props, '"k":\\s*(\\d+)', 1)::int)
             / count(*), 4) AS avg_k,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM events GROUP BY event_type
""",
        "regex_kv_extract": """
SELECT event_type, count(*) AS n_events,
       sum(regexp_extract(props, '"k":\\s*(\\d+)', 1)::int)::bigint AS sum_k,
       round(avg(regexp_extract(props, '"k":\\s*(\\d+)', 1)::int), 4) AS avg_k
FROM events GROUP BY event_type
""",
        "sequence_unnest": """
SELECT l_orderkey, sum(i)::bigint AS sum_idx, count(*) AS n_rows
FROM (SELECT l_orderkey, unnest(generate_series(1, l_linenumber)) AS i
      FROM lineitem WHERE l_orderkey % 100 = 0)
GROUP BY l_orderkey
""",
        "two_level_unnest": """
SELECT p_partkey, count(*) AS n_combos, sum(i * j)::bigint AS weighted
FROM (SELECT p_partkey, unnest(generate_series(1, p_size % 3 + 1)) AS i
      FROM part WHERE p_partkey % 500 = 0),
     unnest(generate_series(1, 2)) AS tj(j)
GROUP BY p_partkey
""",
        "dedup_exact": """
SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_unique,
       (count(*) - count(DISTINCT text))::bigint AS n_dupes
FROM documents GROUP BY source
""",
        "dedup_ngram_jaccard": f"""
WITH {_shingle_cte(5)},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, n_common,
       round(n_common / (za.n + zb.n - n_common), 4) AS jaccard
FROM pairs JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
WHERE round(n_common / (za.n + zb.n - n_common), 4) >= 0.02
""",
        "dedup_containment": f"""
WITH {_shingle_cte(5)},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
c AS (
  SELECT doc_a, doc_b, n_common,
         round(n_common / za.n, 4) AS cont_a_in_b,
         round(n_common / zb.n, 4) AS cont_b_in_a
  FROM pairs JOIN sizes za ON za.doc_id = doc_a
  JOIN sizes zb ON zb.doc_id = doc_b)
SELECT doc_a, doc_b, n_common, cont_a_in_b, cont_b_in_a,
       CASE WHEN cont_a_in_b >= 0.1 AND cont_b_in_a >= 0.1 THEN 'mutual'
            WHEN cont_a_in_b >= 0.1 THEN 'a_in_b'
            ELSE 'b_in_a' END AS relation
FROM c WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.1
""",
        "dedup_ngram_capped": f"""
WITH {_shingle_cte(5)}{_CAP_CTES.format(max_df=10)},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shc a JOIN shc b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, n_common,
       round(n_common / (za.n + zb.n - n_common), 4) AS jaccard
FROM pairs JOIN sizesc za ON za.doc_id = doc_a
JOIN sizesc zb ON zb.doc_id = doc_b
WHERE round(n_common / (za.n + zb.n - n_common), 4) >= 0.02
""",
        # Levenshtein verify over the same shingle-blocked candidates:
        # identical blocking CTEs, DuckDB's identical levenshtein(), the
        # same pushed |Δlen| lower bound
        "dedup_edit_similarity": f"""
WITH {_shingle_cte(5)},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
j AS (
  SELECT doc_a, doc_b,
         round(n_common / (za.n + zb.n - n_common), 4) AS jaccard
  FROM pairs JOIN sizes za ON za.doc_id = doc_a
  JOIN sizes zb ON zb.doc_id = doc_b
  WHERE round(n_common / (za.n + zb.n - n_common), 4) >= 0.02),
t AS (SELECT doc_id, text, length(text) AS len FROM documents),
s AS (
  SELECT doc_a, doc_b, jaccard, ta.text AS text_a, tb.text AS text_b,
         greatest(ta.len, tb.len) AS mx, abs(ta.len - tb.len) AS dl
  FROM j JOIN t ta ON ta.doc_id = doc_a JOIN t tb ON tb.doc_id = doc_b),
v AS (
  SELECT doc_a, doc_b, jaccard,
         levenshtein(text_a, text_b)::BIGINT AS lev, mx
  FROM s WHERE 1.0 - dl / mx >= 0.25)
SELECT doc_a, doc_b, jaccard, lev,
       round(1.0 - lev / mx, 4) AS edit_sim
FROM v WHERE round(1.0 - lev / mx, 4) >= 0.25
""",
        "c4_badwords_filter": """
WITH f AS (
  SELECT source, doc_id,
         (len(list_intersect(
            string_split_regex(lower(text), '[^a-z0-9]+'),
            ['dup', 'lorem', 'xxx'])) > 0)::INT AS flagged
  FROM documents)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(flagged)::BIGINT AS n_flagged,
       (count(*) - sum(flagged))::BIGINT AS n_kept,
       round(sum(flagged) / count(*), 4) AS drop_rate,
       md5(coalesce(string_agg(CASE WHEN flagged = 1 THEN doc_id END, ','
                               ORDER BY doc_id), '')) AS flagged_digest
FROM f GROUP BY source
""",
        "text_distinct_ngrams": """
WITH base AS (
  SELECT source, list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
  FROM documents),
uni AS (SELECT source, 1 AS n, u.gram FROM base, unnest(t) AS u(gram)),
bi AS (
  SELECT source, 2 AS n, t[i] || ' ' || t[i+1] AS gram
  FROM base, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)),
per AS (
  SELECT source, n, gram, count(*) AS c FROM (
    SELECT * FROM uni UNION ALL SELECT * FROM bi) GROUP BY 1, 2, 3),
agg AS (
  SELECT source, n, sum(c)::BIGINT AS total, count(*)::BIGINT AS distinct_grams
  FROM per GROUP BY 1, 2)
SELECT source, n::INT AS n, total, distinct_grams,
       ((1000000 * distinct_grams) // total)::BIGINT AS distinct_ppm
FROM agg
""",
        # the recursive-CTE farthest-point traversal: anchor is the
        # min-vec_id seed (radius 0.0::DOUBLE — an unadorned 0.0 would
        # type the column DECIMAL(2,1) and truncate every later radius),
        # each step appends the argmax of the rounded min-distance to
        # the selected set, ties to the smaller vec_id
        "kcenter_coreset": """
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sel(step, vid, ids, radius) AS (
  SELECT 1, (SELECT min(vec_id) FROM e),
         [(SELECT min(vec_id) FROM e)], 0.0::DOUBLE
  UNION ALL
  SELECT sel.step + 1, nxt.vec_id, list_append(sel.ids, nxt.vec_id), nxt.d
  FROM sel, LATERAL (
    SELECT x.vec_id,
           (SELECT min(round(1.0 - list_dot_product(x.v, c.v) /
                    sqrt(list_dot_product(x.v, x.v) *
                         list_dot_product(c.v, c.v)), 4))
            FROM e c WHERE list_contains(sel.ids, c.vec_id)) AS d
    FROM e x WHERE NOT list_contains(sel.ids, x.vec_id)
    ORDER BY d DESC, x.vec_id LIMIT 1) nxt
  WHERE sel.step < 8)
SELECT step::INT AS step, vid::BIGINT AS vec_id, radius::DOUBLE AS radius
FROM sel
""",
        # transitive duplicate groups over the ngram pairs: recursive CTE
        # computes each node's component-min label (the Spark side runs
        # min-label propagation to the same fixpoint)
        "dedup_clusters": f"""
WITH RECURSIVE {_shingle_cte(5)},
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b
  FROM p JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
  WHERE round(n_common / (za.n + zb.n - n_common), 4) >= 0.02),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(src, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.src)
SELECT src AS doc_id, min(label) AS cluster_rep FROM reach GROUP BY src
""",
        "dedup_keepers": f"""
WITH RECURSIVE {_shingle_cte(5)},
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b
  FROM p JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
  WHERE round(n_common / (za.n + zb.n - n_common), 4) >= 0.02),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(src, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.src),
clusters AS (SELECT src AS doc_id, min(label) AS cluster_rep
             FROM reach GROUP BY src),
sized AS (
  SELECT c.doc_id, c.cluster_rep, length(d.text) AS n_chars,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY length(d.text) DESC, c.doc_id) AS pick
  FROM clusters c JOIN documents d USING (doc_id))
SELECT doc_id, cluster_rep, n_chars,
       (pick = 1)::int AS keep
FROM sized
""",
        "text_repetition": """
WITH docs AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks
  FROM documents WHERE doc_id % 10 = 0),
g AS (
  SELECT doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
           || toks[i+3] || ' ' || toks[i+4] AS gram
  FROM docs, unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS t(i)),
per AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
SELECT doc_id, sum(cnt)::bigint AS n_grams,
       sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::bigint AS n_repeated,
       round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) / sum(cnt), 4)
         AS repetition_ratio
FROM per GROUP BY doc_id
""",
        "dedup_minhash_lsh": _minhash_sql(),
        "dedup_minhash_capped": _minhash_sql(max_df=10),
        "dedup_minhash_wide": _minhash_sql(n_perms=64, n_bands=32),
        "ann_multiband_topk": _multiband_topk_sql(),
        "ann_hard_negatives": _hard_negatives_sql(),
        "source_mixture": _source_mixture_sql(),
        "decontam_fuzzy": _fuzzy_decontam_sql(),
        "shard_assignment": """
WITH base AS (SELECT doc_id, length(text)::bigint AS n_bytes FROM documents),
r AS (SELECT doc_id, n_bytes,
             row_number() OVER (ORDER BY n_bytes DESC, doc_id) - 1 AS r0
      FROM base),
a AS (SELECT doc_id, n_bytes,
             (CASE WHEN (r0 // 16) % 2 = 0 THEN r0 % 16
                   ELSE 15 - (r0 % 16) END)::int AS shard
      FROM r),
p AS (SELECT shard, count(*) AS n_docs, sum(n_bytes)::bigint AS total_bytes
      FROM a GROUP BY shard),
b AS (SELECT round(max(total_bytes) / avg(total_bytes), 4) AS balance FROM p)
SELECT shard, n_docs, total_bytes, balance FROM p CROSS JOIN b
""",
        "curriculum_order": _curriculum_sql(),
        "quality_threshold_by_lang": _quality_threshold_sql(),
        "quality_drift_psi": _quality_psi_sql(),
        "ann_ivf_cells": f"""
WITH {_ivf_rank_cte()}
SELECT cell, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM r WHERE rk = 1 GROUP BY cell
""",
        "ann_ivf_topk": _ivf_topk_sql(),
        "ann_ivf_recall": _ivf_recall_sql(),
        "ann_ivf_trained_recall": _ivf_trained_recall_ab_sql(),
        "semdedup_keepers": _semdedup_sql(),
        "cluster_silhouette": _silhouette_sql(),
        "hill_tail_index": _hill_sql(),
        "stopword_drift": _stopword_drift_sql(),
        "quality_threshold_budget": _quality_threshold_budget_sql(),
        "detector_agreement": _detector_agreement_sql(),
        "repeat_decay_value": _repeat_decay_sql(),
        "minhash_band_recall": _minhash_band_recall_sql(),
        "source_js_divergence": _source_js_sql(),
        "ann_recall": _ann_recall_sql(),
        "dedup_embedding_cosine": f"""
WITH bb AS ({_multiband_bucket_sql()}),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bb x JOIN bb y USING (band_idx, bucket)
  WHERE x.vec_id < y.vec_id)
SELECT id_a, id_b,
       {_cos_sql("ea.embedding", "eb.embedding")} AS cos_sim
FROM cand
JOIN embeddings ea ON ea.vec_id = id_a
JOIN embeddings eb ON eb.vec_id = id_b
WHERE {_cos_sql("ea.embedding", "eb.embedding")} >= 0.35
""",
        # embedding pairs -> recursive-CTE components -> min-id keeper
        "dedup_embedding_keepers": f"""
WITH RECURSIVE bb AS ({_multiband_bucket_sql()}),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bb x JOIN bb y USING (band_idx, bucket)
  WHERE x.vec_id < y.vec_id),
prs AS (
  SELECT id_a, id_b
  FROM cand
  JOIN embeddings ea ON ea.vec_id = id_a
  JOIN embeddings eb ON eb.vec_id = id_b
  WHERE {_cos_sql("ea.embedding", "eb.embedding")} >= 0.35),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM prs
  UNION SELECT id_b, id_a FROM prs),
reach(src, label) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.src)
SELECT src AS vec_id, min(label) AS cluster_rep,
       (src = min(label))::int AS keep
FROM reach GROUP BY src
""",
        "dedup_simhash": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE doc_id % 10 = 0),
h AS (SELECT doc_id, {g.format(expr="tok")} AS hv FROM toks WHERE tok <> ''),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
  FROM h, unnest(generate_series(0, 15)) AS t(b)
  GROUP BY doc_id, b)
SELECT doc_id,
       sum(CASE WHEN votes > 0 THEN (1::bigint << b) ELSE 0 END)::bigint AS simhash
FROM bits GROUP BY doc_id
""",
        "ann_cosine_topk": f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS cand_id, embedding FROM embeddings),
s AS (SELECT query_id, cand_id, {_cos_sql("q_emb", "embedding")} AS cos_sim
      FROM q CROSS JOIN c WHERE query_id <> cand_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, cand_id) AS rank
      FROM s)
SELECT query_id, cand_id, cos_sim, rank::int AS rank FROM r WHERE rank <= 5
""",
        "ann_lsh_buckets": f"""
WITH b AS ({_bucket_sql()})
SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
FROM b GROUP BY bucket
""",
        "ann_lsh_topk": f"""
WITH b AS ({_bucket_sql()}),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket
      FROM b WHERE vec_id < 5),
c AS (SELECT vec_id AS cand_id, embedding, bucket FROM b),
s AS (SELECT query_id, cand_id, {_cos_sql("q_emb", "embedding")} AS cos_sim
      FROM q JOIN c USING (bucket) WHERE query_id <> cand_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, cand_id) AS rank
      FROM s)
SELECT query_id, cand_id, cos_sim, rank::int AS rank FROM r WHERE rank <= 3
""",
        "text_token_count": f"""
SELECT source, count(*) AS n_docs,
       sum(len(string_split(text, ' ')))::bigint AS total_tokens,
       round(avg(len(string_split(text, ' '))), 3) AS avg_tokens,
       sum(ceil(length(text) / 4)::bigint)::bigint AS total_bpe_est,
       sum(len(regexp_extract_all(text,
         '{X.PRETOKEN_PAT}')))::bigint AS total_pretok
FROM documents GROUP BY source
""",
        "text_lang_id": """
WITH s AS (
  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents),
h AS (
  SELECT doc_id, lang, n_tokens,
         (((length(t) - length(replace(t, ' the ', ''))) / 5)::bigint
          + ((length(t) - length(replace(t, ' and ', ''))) / 5)::bigint
          + ((length(t) - length(replace(t, ' a ', ''))) / 3)::bigint) AS en_hits
  FROM s)
SELECT lang, count(*) AS n_docs,
       sum(CASE WHEN en_hits * 20 >= n_tokens THEN 1 ELSE 0 END)::bigint
         AS n_guessed_en,
       round(avg(en_hits / n_tokens), 4) AS avg_marker_ratio
FROM h GROUP BY lang
""",
        "text_quality_score": """
WITH s AS (
  SELECT doc_id, length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         ' ' || lower(text) || ' ' AS t
  FROM documents WHERE doc_id % 20 = 0),
h AS (
  SELECT doc_id, n_chars, n_tokens,
         (((length(t) - length(replace(t, ' the ', ''))) / 5)::bigint
          + ((length(t) - length(replace(t, ' and ', ''))) / 5)::bigint
          + ((length(t) - length(replace(t, ' a ', ''))) / 3)::bigint) AS stop_hits
  FROM s)
SELECT doc_id, n_chars AS n_chars_actual, n_tokens,
       round(0.4 * least(1.0, n_chars / 500.0)
             + 0.3 * least(1.0, stop_hits * 10.0 / n_tokens)
             + 0.3 * least(1.0, (n_chars / n_tokens) / 8.0), 4) AS quality_score
FROM h
""",
        "text_lang_id_multi": _lang_multi_sql(),
        "text_quality_v2": _quality_v2_sql(),
        "stratified_sample": f"""
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN ({_H56.format(expr="doc_id::varchar")} % 100) < 20
                THEN 1 ELSE 0 END)::bigint AS n_sampled,
       round(sum(CASE WHEN ({_H56.format(expr="doc_id::varchar")} % 100) < 20
                      THEN 1 ELSE 0 END) / count(*), 4) AS sample_rate
FROM documents GROUP BY source
""",
        "train_val_split": f"""
SELECT CASE WHEN ({_H56.format(expr="doc_id::varchar")} % 100) < 10
            THEN 'val' ELSE 'train' END AS split,
       count(*) AS n_docs,
       sum(length(text))::bigint AS n_chars_total
FROM documents GROUP BY 1
""",
        "leakage_safe_split": f"""
WITH r AS (SELECT doc_id, length(text) AS n_chars,
                  {_SYNTH_RAW_URL} AS raw_url
           FROM documents),
h AS (SELECT doc_id, n_chars, {_SYNTH_HOST} AS host FROM r)
SELECT host,
       CASE WHEN ({_H56.format(expr="host")} % 100) < 30
            THEN 'val' ELSE 'train' END AS split,
       count(*) AS n_docs,
       sum(n_chars)::bigint AS n_chars_total
FROM h GROUP BY 1, 2
""",
        "context_windows": """
WITH d AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
nz AS (SELECT doc_id, toks, len(toks)::bigint AS n FROM d WHERE len(toks) > 0),
w AS (SELECT doc_id, toks, n, i AS widx
      FROM nz, unnest(generate_series(0,
            CASE WHEN n <= 64 THEN 0 ELSE (n - 64 + 47) // 48 END)) AS t(i))
SELECT doc_id, widx::bigint AS widx, (widx * 48)::bigint AS start,
       least(64, n - widx * 48)::bigint AS win_tokens,
       md5(array_to_string(
         toks[widx * 48 + 1 : widx * 48 + least(64, n - widx * 48)], ' '))
         AS win_md5
FROM w
""",
        "dedup_simhash_pairs": _simhash_pairs_sql(),
        "cleaning_funnel": _cleaning_funnel_sql(),
        "minhash_calibration": _minhash_calibration_sql(),
        "simhash_calibration": _simhash_calibration_sql(),
        # SoftDeDup (dedup.soft_dedup_weights): same distinct-3-gram
        # shingle universe as the other dedup oracles, shingles hashed
        # to the portable 56-bit md5 BEFORE the df agg (mirrors the
        # Spark side's 8-byte exchange key), per-shingle NLL rounded
        # ONCE to integer micro-nats, exact integer means; only the
        # final capped exp runs in doubles (identical operands)
        "dedup_soft_weights": f"""
WITH {_shingle_cte(1)},
shh AS (SELECT doc_id, {_H56.format(expr="shingle")} AS shingle FROM sh),
dfq AS (SELECT shingle, count(*)::bigint AS df FROM shh GROUP BY 1),
tot AS (SELECT sum(df)::bigint AS total FROM dfq),
lp AS (SELECT shingle, round(-ln(df / total) * 1000000)::bigint AS nll
       FROM dfq CROSS JOIN tot),
pd AS (SELECT doc_id, count(*)::bigint AS n_shingles,
              (sum(nll) // count(*))::bigint AS doc_nll
       FROM shh JOIN lp USING (shingle) GROUP BY 1),
m AS (SELECT (sum(doc_nll) // count(*))::bigint AS mean_nll FROM pd)
SELECT d.doc_id, d.source,
       coalesce(pd.n_shingles, 0)::bigint AS n_shingles,
       coalesce(pd.doc_nll, 0)::bigint AS doc_nll_unats,
       coalesce(
         round(least(exp((pd.doc_nll - m.mean_nll) / 1000000.0), 4.0), 9),
         1.0) AS weight
FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id CROSS JOIN m
""",
        # DoReMi (sampling.doremi_weights): per-(source, token) KL
        # contributions rounded ONCE to integer micro-nats and
        # bigint-summed; clamp BEFORE the integer division (Spark DIV
        # truncates, DuckDB // floors — nonneg operands agree); final
        # exp/normalize in doubles from identical integers
        "doremi_weights": """
WITH tk AS (
  SELECT source,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
           AS token
  FROM documents),
st AS (SELECT source, token, count(*)::bigint AS cnt FROM tk GROUP BY 1, 2),
tm AS (SELECT token, sum(cnt)::bigint AS cnt_t FROM st GROUP BY 1),
stot AS (SELECT source, sum(cnt)::bigint AS t_s FROM st GROUP BY 1),
g AS (SELECT sum(t_s)::bigint AS t_all FROM stot),
co AS (
  SELECT st.source, stot.t_s,
         round(st.cnt * (ln(st.cnt / stot.t_s) - ln(tm.cnt_t / g.t_all))
               * 1000000)::bigint AS kp
  FROM st JOIN tm USING (token) JOIN stot USING (source) CROSS JOIN g),
ps AS (SELECT source, t_s AS n_tokens,
              (greatest(sum(kp), 0) // t_s)::bigint AS kl_unats
       FROM co GROUP BY source, t_s),
t2 AS (SELECT sum(n_tokens)::bigint AS t_all, count(*)::bigint AS k FROM ps),
raw AS (SELECT source, n_tokens, kl_unats, t_all, k,
               (n_tokens / t_all) * exp(1.0 * kl_unats / 1000000.0) AS a_raw
        FROM ps CROSS JOIN t2),
z AS (SELECT sum(a_raw) AS z FROM raw)
SELECT source, n_tokens, kl_unats,
       round(n_tokens / t_all, 9) AS alpha0,
       round(a_raw / z, 9) AS alpha_eg,
       round(0.99 * a_raw / z + 0.01 / k, 9) AS alpha_smoothed
FROM raw CROSS JOIN z
""",
        # length-bucketed batching (sampling.length_bucket_batch_stats):
        # fixed seqlen ladder, closed-form batch count, bigint padding
        # arithmetic end-to-end
        "length_bucket_batches": """
WITH t AS (
  SELECT len(list_filter(string_split(lower(text), ' '), x -> x <> ''))::bigint
           AS nt
  FROM documents),
b AS (
  SELECT CASE WHEN nt <= 16 THEN 16 WHEN nt <= 32 THEN 32
              WHEN nt <= 64 THEN 64 WHEN nt <= 128 THEN 128
              WHEN nt <= 256 THEN 256 WHEN nt <= 512 THEN 512
              WHEN nt <= 1024 THEN 1024 WHEN nt <= 2048 THEN 2048
              ELSE 4096 END::bigint AS bucket_cap,
         least(nt, 4096)::bigint AS used
  FROM t)
SELECT bucket_cap, count(*)::bigint AS n_docs,
       ((count(*) + 7) // 8)::bigint AS n_batches,
       sum(used)::bigint AS sum_tokens,
       (bucket_cap * count(*) - sum(used))::bigint AS pad_tokens,
       ((bucket_cap * count(*) - sum(used)) * 1000000
        // (bucket_cap * count(*)))::bigint AS pad_ppm
FROM b GROUP BY bucket_cap
""",
        "link_hits": _hits_sql(),
        "quality_reliability": _quality_reliability_sql(),
        "text_kneser_ney": _kneser_ney_sql(),
        "hashed_embedding": _hashed_embedding_sql(),
        # normalized-key exact dedup (dedup.normalized_exact_dedup):
        # same casefold/strip/collapse normalization ('g' flag — DuckDB
        # replaces first match only by default), same md5 key, same
        # lowest-doc_id keeper
        "dedup_normalized": """
WITH k AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_key
  FROM documents)
SELECT doc_id, norm_key,
       count(*) OVER (PARTITION BY norm_key)::bigint AS group_size,
       (row_number() OVER (PARTITION BY norm_key ORDER BY doc_id) = 1)::int
         AS keep
FROM k
""",
        # corpus-law diagnostics (textstats.zipf_heaps_report): same
        # deterministic (count desc, token) top-k, same closed-form
        # normal equation, round-4 absorbs double association order
        "zipf_heaps": """
WITH tk AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS tok
  FROM documents),
c AS (SELECT tok, count(*)::bigint AS c FROM tk GROUP BY tok),
t AS (SELECT sum(c)::bigint AS n_tokens, count(*)::bigint AS n_types FROM c),
top AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
        FROM c ORDER BY c DESC, tok LIMIT 256),
rk AS (SELECT ln(r::double) AS x, ln(c::double) AS y FROM top),
reg AS (SELECT count(*)::double AS k, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM rk)
SELECT n_tokens, n_types, k::bigint AS top_k,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) AS zipf_slope,
       round(ln(n_types::double) / ln(n_tokens::double), 4) AS heaps_exponent
FROM reg, t
""",
        # T5 span corruption (sampling.span_corruption_stats): same
        # md5-derived span starts, same merge-adjacent mask, all 0/1
        # integer arithmetic after the hash decision
        "span_corruption": """
WITH tk AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents),
st AS (
  SELECT doc_id, len(toks)::bigint AS n,
         list_transform(generate_series(1, len(toks)),
           i -> CASE WHEN (('0x' || substr(md5(doc_id::varchar || ':'
                                           || i::varchar), 1, 14))::bigint)
                          % 7 = 0
                     THEN 1 ELSE 0 END) AS starts
  FROM tk),
mk AS (
  SELECT doc_id, n,
         list_transform(generate_series(1, n::int),
           i -> CASE WHEN len(list_filter(generate_series(greatest(1, i - 2),
                                                          i),
                                          j -> starts[j] = 1)) > 0
                     THEN 1 ELSE 0 END) AS masked
  FROM st)
SELECT doc_id, n AS n_tokens,
       len(list_filter(generate_series(1, n::int),
                       i -> masked[i] = 1
                            AND (i = 1 OR masked[i - 1] = 0)))::bigint
         AS n_spans,
       coalesce(list_sum(masked), 0)::bigint AS masked_tokens,
       (CASE WHEN n = 0 THEN 0
             ELSE coalesce(list_sum(masked), 0) * 1000000 // n END)::bigint
         AS masked_ppm
FROM mk
""",
        "corpus_datasheet": f"""
WITH {_gate_flags_ctes(carry="doc_id, source, lang, text, n_tokens")},
d AS (
  SELECT source, lang, n_tokens, pass_lang, pass_quality,
         (row_number() OVER (PARTITION BY text ORDER BY doc_id) > 1)::int
           AS is_dup
  FROM gf)
SELECT source, lang, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(pass_lang)::BIGINT AS pass_lang_docs,
       sum(pass_quality)::BIGINT AS pass_quality_docs,
       sum(is_dup)::BIGINT AS n_exact_dupes,
       (sum(is_dup) * 1000000 // count(*))::BIGINT AS dup_ppm
FROM d GROUP BY source, lang
""",
        "dsir_importance": _dsir_importance_sql(),
        "c4_line_filters": _c4_line_filters_sql(),
        "funnel_attribution": _funnel_attribution_sql(),
        "corpus_build": _corpus_build_sql(),
        "mojibake_repair": _mojibake_repair_sql(),
        "domain_cap": _domain_cap_sql(),
        "frontier_slots": _frontier_slots_sql(),
        "tfidf_top_terms": _tfidf_top_terms_sql(),
        "inverted_postings": _inverted_postings_sql(),
        "boilerplate_paragraphs": _boilerplate_paragraphs_sql(),
        "snapshot_latest": _snapshot_latest_sql(),
        "link_pagerank": _pagerank_sql(),
        "bloom_incremental_dedup": _bloom_dedup_sql(),
        "decontam_benchmark": _decontam_sql(n=4),
        "dedup_paragraphs": _dedup_paragraphs_sql(),
        "dedup_sentence_spans": _dedup_sentence_spans_sql(),
        "intradoc_line_dedup": _intradoc_line_dedup_sql(),
        "layout_reconstruct": _layout_reconstruct_sql(),
        "layout_columns": _layout_columns_sql(),
        "layout_grid": _layout_grid_sql(),
        "dedup_exact_substring": _dedup_exact_substring_sql(),
        "sequence_pack": _sequence_pack_sql(),
        "vocab_coverage": _vocab_coverage_sql(),
        "anchor_text": _anchor_text_sql(),
        "text_bigram_logprob": _bigram_logprob_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "text_char_entropy": _char_entropy_sql(),
        "text_ttr": _ttr_sql(),
        "snapshot_delta": _snapshot_delta_sql(),
        "winnowing_fingerprints": _winnowing_sql(),
        "hll_distinct": _hll_distinct_sql(),
        "cms_heavy_hitters": _cms_heavy_hitters_sql(),
        "dedup_cluster_sizes": _cluster_sizes_sql(),
        "token_length_histogram": _token_length_histogram_sql(),
        "robots_filter": _robots_filter_sql(),
        "pq_codebook": _pq_codebook_sql(),
        "pq_adc_topk": _pq_adc_topk_sql(),
        "ivf_pq_topk": _ivf_pq_topk_sql(),
        "bm25_topk": _bm25_topk_sql(),
        "bpe_encode": _bpe_encode_sql(),
        "bpe_fertility": _bpe_fertility_sql(),
        "sequence_pack_chunks": _sequence_pack_chunks_sql(),
        "pii_scrub": _pii_scrub_sql(),
        "domain_stats": _domain_stats_sql(),
        "training_order": _training_order_sql(),
        "quality_model_score": _quality_model_sql(),
        "warc_roundtrip": _warc_roundtrip_sql(),
        "text_length_percentiles": """
SELECT source, count(*) AS n_docs,
       round(quantile_cont(len(string_split(text, ' ')), 0.5), 2)
         AS p50_tokens,
       round(quantile_cont(len(string_split(text, ' ')), 0.9), 2)
         AS p90_tokens,
       round(quantile_cont(len(string_split(text, ' ')), 0.99), 2)
         AS p99_tokens,
       max(len(string_split(text, ' '))) AS max_tokens
FROM documents GROUP BY source
""",
        "text_unigram_logprob": """
WITH t2 AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE doc_id % 2 = 0),
tk AS (SELECT doc_id, tok FROM t2 WHERE tok <> ''),
freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
tot AS (SELECT sum(c) AS total FROM freq),
nl AS (SELECT tk.doc_id, -ln(freq.c / tot.total) AS nll
       FROM tk JOIN freq USING (tok) CROSS JOIN tot)
SELECT doc_id, count(*) AS n_tokens, round(avg(nll), 4) AS avg_nll
FROM nl GROUP BY doc_id
""",
        # same unigram-NLL CTE with lang riding along, then per-lang
        # terciles — ntile(3) over (avg_nll, doc_id) is deterministic
        # and standard-SQL-identical between Spark and DuckDB
        "ccnet_buckets": """
WITH t2 AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE doc_id % 2 = 0),
tk AS (SELECT doc_id, lang, tok FROM t2 WHERE tok <> ''),
freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
tot AS (SELECT sum(c) AS total FROM freq),
nl AS (SELECT tk.doc_id, tk.lang, -ln(freq.c / tot.total) AS nll
       FROM tk JOIN freq USING (tok) CROSS JOIN tot),
sc AS (SELECT doc_id, lang, round(avg(nll), 4) AS avg_nll
       FROM nl GROUP BY doc_id, lang),
nt AS (SELECT lang, avg_nll,
              ntile(3) OVER (PARTITION BY lang
                             ORDER BY avg_nll, doc_id) AS tercile
       FROM sc)
SELECT lang,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       min(avg_nll) AS min_nll, max(avg_nll) AS max_nll
FROM nt GROUP BY lang, tercile
""",
        "text_script_detect": _script_mix_sql(),
        "url_canonicalize": r"""
WITH r AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0
      THEN printf('HTTPS://WWW.Mirror%d.Example.COM:443/Docs/%d/?utm_source=feed&id=%d&utm_campaign=x#frag',
                  doc_id % 7, doc_id, doc_id)
      ELSE printf('http://mirror%d.example.com:80/Docs/%d?fbclid=abc%d&page=2',
                  doc_id % 7, doc_id, doc_id)
    END AS raw_url
  FROM documents),
p AS (
  SELECT doc_id, raw_url,
    lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(lower(regexp_extract(raw_url,
        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':(80|443)$', '') AS host,
    regexp_extract(raw_url,
        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS raw_path,
    regexp_replace(regexp_replace(regexp_replace(
        regexp_extract(raw_url, '\?([^#]*)', 1),
        '&(utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
        '^(utm_[a-z]+|fbclid|gclid)=[^&]*&?', ''),
        '[&]+$', '') AS query
  FROM r),
q AS (
  SELECT doc_id, raw_url, scheme, host, query,
    CASE WHEN raw_path = '' THEN '/' ELSE raw_path END AS path0 FROM p),
s AS (
  SELECT doc_id, raw_url, scheme, host, query,
    CASE WHEN length(path0) > 1 AND path0 LIKE '%/'
         THEN substring(path0, 1, length(path0) - 1) ELSE path0 END AS path
  FROM q)
SELECT doc_id, raw_url,
  scheme || '://' || host || path
    || CASE WHEN query = '' THEN '' ELSE '?' || query END AS canonical_url
FROM s
""",
        # bitext mining: same page_key candidates, same exact
        # milli-cosine margin arithmetic (bitext.bitext_mine)
        "bitext_mine": f"""
WITH src AS (SELECT doc_id AS src_id, doc_id // 10 AS page_key
             FROM documents WHERE lang = 'en'),
tgt AS (SELECT doc_id AS tgt_id, lang AS tgt_lang, doc_id // 10 AS page_key
        FROM documents WHERE lang <> 'en'),
cand AS (
  SELECT src_id, tgt_lang, tgt_id,
         round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
               sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]) *
                    list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))
               * 1000, 0)::BIGINT AS cos_milli
  FROM src JOIN tgt USING (page_key)
  JOIN embeddings ea ON ea.vec_id = src_id
  JOIN embeddings eb ON eb.vec_id = tgt_id),
g AS (
  SELECT src_id, tgt_lang, tgt_id, cos_milli,
         (count(*) OVER w * cos_milli - sum(cos_milli) OVER w)::BIGINT
           AS margin_mnx,
         count(*) OVER w AS n_candidates,
         row_number() OVER (PARTITION BY src_id, tgt_lang
                            ORDER BY cos_milli DESC, tgt_id) AS rk
  FROM cand
  WINDOW w AS (PARTITION BY src_id, tgt_lang))
SELECT src_id, tgt_lang, tgt_id, cos_milli, margin_mnx, n_candidates
FROM g WHERE rk = 1 AND cos_milli >= 250
""",
        # empirical-Bayes host-quality shrinkage: exact integer
        # micro-units end-to-end (webclean.domain_quality_prior)
        "domain_quality_prior": f"""
WITH r AS (SELECT doc_id, text, {_SYNTH_RAW_URL} AS raw_url FROM documents),
s AS (
  SELECT doc_id, {_SYNTH_HOST} AS host,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         ' ' || lower(text) || ' ' AS t
  FROM r),
h AS (
  SELECT doc_id, host, n_chars, n_tokens,
         (((length(t) - length(replace(t, ' the ', ''))) / 5)::bigint
          + ((length(t) - length(replace(t, ' and ', ''))) / 5)::bigint
          + ((length(t) - length(replace(t, ' a ', ''))) / 3)::bigint) AS stop_hits
  FROM s),
q AS (
  SELECT host,
         round(round(0.4 * least(1.0, n_chars / 500.0)
               + 0.3 * least(1.0, stop_hits * 10.0 / n_tokens)
               + 0.3 * least(1.0, (n_chars / n_tokens) / 8.0), 4)
               * 10000, 0)::BIGINT AS q_micro
  FROM h),
by_host AS (SELECT host, count(*) AS n_docs, sum(q_micro) AS sum_q
            FROM q GROUP BY host),
totals AS (SELECT count(*) AS n_total, sum(q_micro) AS sum_total FROM q)
SELECT host, n_docs,
       round(sum_q::DOUBLE / n_docs / 10000.0, 4) AS host_mean_q,
       round((sum_q * n_total + 5 * sum_total)::DOUBLE
             / ((n_docs + 5) * n_total)::DOUBLE / 10000.0, 4) AS shrunk_q
FROM by_host CROSS JOIN totals
""",
        # UNIMAX waterfill: same ascending-cap prefix rule, same exact
        # integer share split (sampling.unimax_budgets)
        "unimax_budgets": """
WITH by_lang AS (
  SELECT lang, sum(len(string_split(text, ' ')))::BIGINT AS available_tokens
  FROM documents GROUP BY lang),
caps AS (SELECT lang, available_tokens,
                available_tokens * 1 AS cap_tokens FROM by_lang),
ann AS (
  SELECT *,
         row_number() OVER (ORDER BY cap_tokens, lang) AS j,
         coalesce(sum(cap_tokens) OVER (ORDER BY cap_tokens, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_prev,
         count(*) OVER () AS n_langs,
         (sum(available_tokens) OVER () * 4) // 5 AS budget_total
  FROM caps),
f AS (SELECT *,
             (cap_tokens * (n_langs - j + 1) > budget_total - cum_prev)
               AS fails
      FROM ann),
g AS (SELECT *, min(CASE WHEN fails THEN j END) OVER () AS first_fail FROM f),
h AS (SELECT *,
             max(CASE WHEN j = first_fail THEN cum_prev END) OVER ()
               AS cum_at_ff
      FROM g),
b AS (
  SELECT lang, available_tokens, cap_tokens,
         (CASE WHEN first_fail IS NULL OR j < first_fail THEN cap_tokens
               ELSE (budget_total - cum_at_ff)
                      // (n_langs - first_fail + 1)
                    + CASE WHEN (j - first_fail + 1) <=
                           (budget_total - cum_at_ff)
                             % (n_langs - first_fail + 1)
                           THEN 1 ELSE 0 END
          END)::BIGINT AS budget_tokens
  FROM h)
SELECT lang, available_tokens, cap_tokens, budget_tokens,
       (budget_tokens * 1000000 // available_tokens)::BIGINT AS epochs_ppm
FROM b
""",
        # inter-source overlap: distinct per-source shingle sets, same
        # integer ppm arithmetic (dedup.source_overlap)
        "source_overlap": """
WITH docs0 AS (
  SELECT source, string_split(lower(text), ' ') AS toks
  FROM documents WHERE doc_id % 2 = 0),
ssh AS (
  SELECT DISTINCT source,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM docs0, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)),
sizes AS (SELECT source, count(*) AS n_sh FROM ssh GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM ssh a JOIN ssh b USING (shingle)
  WHERE a.source < b.source GROUP BY 1, 2)
SELECT source_a, source_b, n_shared, za.n_sh AS size_a, zb.n_sh AS size_b,
       (n_shared * 1000000 // (za.n_sh + zb.n_sh - n_shared))::BIGINT
         AS jaccard_ppm
FROM pairs
JOIN sizes za ON za.source = source_a
JOIN sizes zb ON zb.source = source_b
""",
        "token_budget_sample": f"""
WITH b AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens,
         {_H56.format(expr="doc_id::varchar")} AS hk
  FROM documents),
c AS (
  SELECT source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM b)
SELECT source, count(*) AS n_docs,
       sum((cum <= 2000)::int)::bigint AS n_selected,
       sum(CASE WHEN cum <= 2000 THEN n_tokens ELSE 0 END)::bigint
         AS tokens_selected
FROM c GROUP BY source
""",
        "doc_fingerprint": (
            "SELECT doc_id, "
            + g.format(expr=r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')")
            + " AS fingerprint FROM documents WHERE doc_id % 25 = 0"
        ),
        "multimodal_metadata": """
SELECT doc_id,
       octet_length(encode(text))::bigint AS byte_len,
       (octet_length(encode(text)) % 640 + 1)::int AS width,
       (octet_length(encode(text)) % 480 + 1)::int AS height,
       (octet_length(encode(text)) % 7 + 1)::int AS n_frames,
       'stub/' || (octet_length(encode(text)) % 3)::varchar AS codec
FROM documents
""",
        "multimodal_frame_sample": """
WITH m AS (
  SELECT doc_id, octet_length(encode(text))::bigint AS byte_len,
         (octet_length(encode(text)) % 7 + 1) AS n_frames
  FROM documents),
f AS (
  SELECT DISTINCT doc_id, byte_len, (i * n_frames // 4)::int AS frame_idx
  FROM m, unnest(generate_series(0, 3)) AS t(i))
SELECT doc_id, frame_idx,
       (('0x' || substr(md5(doc_id::varchar || '_' || frame_idx::varchar
                        || '_' || byte_len::varchar), 1, 14))::bigint)
         AS frame_fingerprint
FROM f
""",
        # the Spark side parses REAL header bytes; the oracle replays the
        # deterministic generator arithmetic (multimodal.make_image_bytes)
        "multimodal_image_headers": """
SELECT doc_id,
       (CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 17 ELSE 13 END)::bigint
         AS byte_len,
       (doc_id % 640 + 1)::int AS width,
       (doc_id % 480 + 1)::int AS height,
       1::int AS n_frames,
       CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
            ELSE 'image/gif' END AS codec
FROM documents
""",
        # differential oracle: the reference parser's own output for the
        # same fixture docs (fixtures/smoke_goldens.parquet, committed);
        # byte-identity ⇒ identical json_len / extracted fields
        "pvsyst_field_spans": f"""
SELECT url, span_kind, name, midx, start, "end", value
FROM '{_SPAN_GOLDENS}'
""",
        "pvsyst_extract_smoke": f"""
SELECT url, kind, n_pages,
       length(golden_json)::int AS json_len,
       json_extract_string(golden_json, '$.metadata.total_inverters')::int
         AS total_inverters
FROM '{_SMOKE_GOLDENS}'
""",
        "ann_jl_recall": _ann_jl_recall_sql(),
        "text_trigram_backoff": _trigram_backoff_sql(),
        "weighted_sample_topk": _weighted_sample_sql(),
        "zorder_layout": _zorder_layout_sql(),
        "salted_skew_join": _salted_skew_join_sql(),
    }
    # identical fixpoint, different distributed algorithm on the Spark
    # side (min-label propagation vs Kiveris star contraction)
    out["dedup_clusters_stars"] = out["dedup_clusters"]
    # identical labels, different PAIR-STAGE plan on the Spark side:
    # stored existing edges ∪ new×all increment join (the daily-crawl
    # plan that never recomputes existing×existing)
    out["dedup_clusters_incremental"] = out["dedup_clusters"]
    return out
