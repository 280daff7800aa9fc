"""Property tests for the training-data operators: structural
invariants that must hold on ANY input, checked on the sf0.001 tables
(complementing the value-exact DuckDB oracles at sf0.01)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_jaccard_pairs_bounds_and_orientation(spark, docs):
    from pvsyst_pdf_parser_spark.training.dedup import ngram_jaccard_pairs

    rows = ngram_jaccard_pairs(docs, threshold=0.0).collect()
    assert rows, "fixture corpus contains near-dup pairs"
    for r in rows:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]  # canonical orientation, no dupes
        assert r["n_common"] >= 1


def test_capped_jaccard_is_subset_semantics(spark, docs):
    """Capping can only REMOVE shingles: capped n_common never exceeds
    the uncapped n_common for the same pair."""
    from pvsyst_pdf_parser_spark.training.dedup import ngram_jaccard_pairs

    full = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_df=5).collect()
    for r in capped:
        key = (r["doc_a"], r["doc_b"])
        assert key in full
        assert r["n_common"] <= full[key]


def test_connected_components_invariants(spark, docs):
    from pvsyst_pdf_parser_spark.training.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, threshold=0.0)
    labels = {r["doc_id"]: r["cluster_rep"]
              for r in connected_components(pairs).collect()}
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    # every endpoint labeled; both endpoints of an edge share a rep
    for a, b in edges:
        assert labels[a] == labels[b]
    # the rep is a member of its own cluster and is the cluster min
    for doc, rep in labels.items():
        assert rep in labels and labels[rep] == rep
        assert rep <= doc


def test_ann_recall_bounds_and_ivf_cells_partition(spark, emb):
    from pvsyst_pdf_parser_spark.training.simsearch import (
        ann_recall_report,
        ivf_assign,
        ivf_cell_stats,
    )

    rec = ann_recall_report(emb, n_queries=10, k=3).collect()[0]
    assert 0.0 <= rec["recall"] <= 1.0
    assert rec["n_hits"] <= rec["n_truth"]

    # home-cell assignment partitions the corpus exactly
    total = emb.count()
    stats = ivf_cell_stats(emb).collect()
    assert sum(r["n_vectors"] for r in stats) == total
    # n_probe=2 yields exactly 2 distinct cells per vector
    two = ivf_assign(emb, n_probe=2)
    assert two.count() == 2 * total
    assert (
        two.groupBy("vec_id").agg(F.countDistinct("cell").alias("c"))
        .filter(F.col("c") != 2).count() == 0
    )


def test_quality_v2_flags_binary_and_score_consistent(spark, docs):
    from pvsyst_pdf_parser_spark.training.textstats import quality_scores_v2

    rows = quality_scores_v2(docs, sample_mod=1).collect()
    flags = ["flag_word_len", "flag_stopwords", "flag_symbols",
             "flag_ttr", "flag_length"]
    for r in rows:
        for f in flags:
            assert r[f] in (0, 1)
        assert abs(r["quality2_score"] - round(sum(r[f] for f in flags) / 5, 4)) < 1e-9
        assert 0.0 < r["type_token_ratio"] <= 1.0


def test_repetition_ratio_bounds(spark, docs):
    from pvsyst_pdf_parser_spark.training.textstats import repetition_stats

    for r in repetition_stats(docs, sample_mod=1).collect():
        assert 0.0 <= r["repetition_ratio"] <= 1.0
        assert r["n_repeated"] <= r["n_grams"]


def test_repetition_short_docs_yield_no_grams(spark):
    """Docs shorter than n tokens must emit NO grams — the unguarded
    sequence(1, 0) descends to [1, 0] in Spark and element_at(_, 0)
    throws INVALID_INDEX_OF_ZERO, while DuckDB's generate_series(1, 0)
    is empty (engines diverge AND the job aborts).  Regression gate for
    the guard in repetition_stats."""
    from pvsyst_pdf_parser_spark.training.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (0, "one two three", "en", "s"),          # 3 tokens < n=5
            (1, "exactly four tokens here", "en", "s"),  # 4 tokens < n=5
            (2, " ".join(["tok"] * 12), "en", "s"),   # long: 8 grams
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r["doc_id"]: r for r in
            repetition_stats(df, n=5, sample_mod=1).collect()}
    assert 0 not in rows and 1 not in rows  # short docs: no output row
    assert rows[2]["n_grams"] == 8          # 12 - (5-1)
    assert rows[2]["repetition_ratio"] == 1.0  # all grams identical


def test_connected_components_raises_on_nonconvergence(spark):
    """A component with diameter > max_iter must raise, not silently
    return split clusters (dedup_keepers would keep several copies of
    one transitive duplicate group)."""
    from pvsyst_pdf_parser_spark.training.dedup import connected_components

    pairs = spark.range(11).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )  # a 12-node path: min label travels one hop per round
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=3).collect()


def test_stars_cc_long_path_and_parity_with_propagation(spark, docs):
    """Large-star/small-star contraction (Kiveris et al.) converges on a
    10k-node path — diameter far beyond any sane propagation max_iter —
    in O(log² n) rounds, labels everything with the component min, and
    agrees exactly with min-label propagation on the real near-dup
    graph."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        connected_components,
        connected_components_stars,
        ngram_jaccard_pairs,
    )

    n = 10_000
    path = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    labels = connected_components_stars(path, max_iter=40)
    assert labels.count() == n
    assert labels.filter(F.col("cluster_rep") != 0).count() == 0

    pairs = ngram_jaccard_pairs(docs, threshold=0.0)
    by_prop = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components(pairs).collect()
    )
    by_stars = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components_stars(pairs).collect()
    )
    assert by_prop == by_stars


def test_edge_signature_overflow_free_on_sign_uniform_hashes(spark):
    """The fixpoint probe must survive edge sets whose xxhash64 values
    are SIGN-UNIFORM (all positive), where a sum-based checksum
    overflows LongType with certainty — the exact ANSI
    ARITHMETIC_OVERFLOW that killed dedup_clusters_stars and
    dedup_embedding_keepers in the round-4 driver run (the old graphs
    passed only because their hash signs happened to cancel).  bit_xor
    is closed over 64 bits, so the probe must return the exact XOR of
    the per-edge hashes."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        _edge_signature,
        connected_components_stars,
    )

    base = spark.range(4000).select(
        F.col("id").alias("u"), (F.col("id") + 100_000).alias("v")
    )
    rows = (
        base.withColumn("h", F.xxhash64("u", "v"))
        .filter(F.col("h") > 0)
        .collect()
    )
    # Sign-uniform by construction: the old F.sum(xxhash64) probe would
    # blow past 2^63 on these (ANSI -> hard error, non-ANSI -> silent
    # wraparound).
    assert sum(r["h"] for r in rows) > 2**63
    edges = spark.createDataFrame(
        [(r["u"], r["v"]) for r in rows], "u bigint, v bigint"
    )
    n, h = _edge_signature(edges)
    assert n == len(rows)
    expected = 0
    for r in rows:
        expected ^= r["h"] & 0xFFFFFFFFFFFFFFFF
    if expected >= 2**63:  # back to two's-complement signed
        expected -= 2**64
    assert h == expected

    # And the full contraction completes on the same sign-uniform set
    # (disjoint 2-node components: everything labels to its min).
    labels = connected_components_stars(
        edges.select(F.col("u").alias("doc_a"), F.col("v").alias("doc_b"))
    )
    assert labels.filter(F.col("cluster_rep") != F.col("doc_id") % 100_000).count() == 0


def test_cc_auto_dispatch_parity_and_long_chain_fallback(spark, docs):
    """connected_components_auto must (a) agree exactly with both
    underlying algorithms on a real near-dup graph, and (b) recover via
    star contraction when the small-graph propagation path hits a long
    chain whose diameter exceeds its round budget — instead of raising."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        connected_components_auto,
        connected_components_stars,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, threshold=0.0)
    by_auto = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components_auto(pairs).collect()
    )
    by_stars = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components_stars(pairs).collect()
    )
    assert by_auto == by_stars

    n = 64  # small edge count, diameter 63 > propagation's 20 rounds
    chain = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    labels = connected_components_auto(chain)
    assert labels.count() == n
    assert labels.filter(F.col("cluster_rep") != 0).count() == 0


def test_release_persisted_drains_tracked_cache(spark, docs):
    """Operators persist fan-out intermediates (shingle frames, bucket
    projections) through the tracked scope; release_persisted() must
    unpersist them all so long-lived sessions don't leak cache entries
    across inputs."""
    from pvsyst_pdf_parser_spark.training import cache
    from pvsyst_pdf_parser_spark.training.dedup import minhash_lsh_verified

    cache.release_persisted()  # clean slate
    df = minhash_lsh_verified(docs, max_df=10)
    df.collect()
    tracked = list(cache._TRACKED)
    assert len(tracked) == 2  # sh_raw + capped frame
    assert all(t.storageLevel.useMemory or t.storageLevel.useDisk
               for t in tracked)
    released = cache.release_persisted()
    assert released == 2
    assert not cache._TRACKED
    for t in tracked:
        assert not (t.storageLevel.useMemory or t.storageLevel.useDisk)


def test_split_is_deterministic_partition_and_stable(spark, docs):
    """The train/val split is a partition (every doc in exactly one
    side), reproducible across runs, and per-key stable: restricting
    the input to a subset never changes a surviving doc's side."""
    from pvsyst_pdf_parser_spark.training.sampling import hash_bucket

    b = hash_bucket(F.col("doc_id"))
    split = F.when(b < 10, F.lit("val")).otherwise(F.lit("train"))
    full = {r["doc_id"]: r["s"]
            for r in docs.select("doc_id", split.alias("s")).collect()}
    assert set(full.values()) == {"train", "val"}
    sub = {r["doc_id"]: r["s"]
           for r in docs.filter(F.col("doc_id") % 3 == 0)
           .select("doc_id", split.alias("s")).collect()}
    for doc, s in sub.items():
        assert full[doc] == s


def test_trained_ivf_centroids_improve_recall(spark, emb):
    """Lloyd-trained coarse-quantizer cells (deterministic: seeded from
    the hash anchors, no RNG) must not lose recall vs the untrained
    hash anchors at the same (n_cells, n_probe), and measured gains are
    real: 0.42 -> 0.49 at sf0.001, 0.47 -> 0.53 at sf0.01 (recall@5,
    20 queries).  Training twice yields identical centroids."""
    from pvsyst_pdf_parser_spark.training.simsearch import (
        ivf_recall_report,
        train_ivf_centroids,
    )

    hash_rec = ivf_recall_report(emb, n_queries=20, k=5).collect()[0]["recall"]
    cents = train_ivf_centroids(emb, n_iter=3)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    assert cents == train_ivf_centroids(emb, n_iter=3)  # deterministic
    trained_rec = ivf_recall_report(
        emb, n_queries=20, k=5, centroids=cents
    ).collect()[0]["recall"]
    assert trained_rec >= hash_rec


def test_trained_ivf_fixture_ab_report(spark):
    """The COMMITTED centroid fixture (fixtures/ivf_trained_centroids
    .json, frozen by scripts/train_ivf.py) must (a) repr-roundtrip so
    the DuckDB oracle embeds bit-identical literals, and (b) win the
    A/B on the corpus it was trained for (the fixture records its
    sf_dir; a coarse quantizer is retrained per corpus — at sf0.001 the
    sf0.01-trained cells lose to the anchors, 0.37 vs 0.42): trained
    recall >= anchor recall in ivf_trained_recall_ab's two-row report,
    with both arms sharing one persisted truth."""
    import json
    import os

    from pvsyst_pdf_parser_spark.training.simsearch import (
        ivf_trained_recall_ab,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fx = json.load(open(os.path.join(repo, "fixtures",
                                     "ivf_trained_centroids.json")))
    cents = fx["centroids"]
    assert len(cents) == fx["n_cells"] and all(
        len(c) == fx["dim"] for c in cents
    )
    for c in cents:
        for v in c:
            assert float(repr(v)) == v  # exact literal embedding
    emb_trained = spark.read.parquet(f"{fx['sf_dir']}/embeddings.parquet")
    rows = {r["variant"]: r for r in
            ivf_trained_recall_ab(emb_trained, cents).collect()}
    assert set(rows) == {"anchors", "trained"}
    assert rows["trained"]["n_truth"] == rows["anchors"]["n_truth"]
    assert rows["trained"]["recall"] >= rows["anchors"]["recall"]


def test_simhash_pairs_pigeonhole_complete_and_bounded(spark, docs):
    """Pigeonhole blocking must be COMPLETE for its guarantee: every
    sampled doc pair with true Hamming distance <= max_hamming appears
    in the output (chunk agreement is a theorem, not a heuristic), and
    every emitted pair is correctly bounded and oriented."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        simhash,
        simhash_neardup_pairs,
    )

    max_h = 3
    out = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_neardup_pairs(docs, max_hamming=max_h,
                                          sample_mod=1).collect()}
    for (a, b), h in out.items():
        assert a < b and 0 <= h <= max_h

    fps = {r["doc_id"]: r["simhash"]
           for r in simhash(docs, sample_mod=1).collect()}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            true_h = bin(fps[a] ^ fps[b]).count("1")
            if true_h <= max_h:
                assert (a, b) in out and out[(a, b)] == true_h
            else:
                assert (a, b) not in out


def test_cleaning_funnel_gate_arithmetic(spark, docs):
    """Funnel invariants: retained <= each individual gate count <=
    n_docs; retention_rate consistent; totals cover the corpus."""
    from pvsyst_pdf_parser_spark.training.textstats import cleaning_funnel_stats

    rows = cleaning_funnel_stats(docs).collect()
    assert rows
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        for gate in ("n_pass_lang", "n_pass_quality", "n_first_copy"):
            assert 0 <= r["n_retained"] <= r[gate] <= r["n_docs"]
        assert abs(r["retention_rate"] - round(r["n_retained"] / r["n_docs"], 4)) < 1e-9


def test_token_budget_sample_budget_and_determinism(spark, docs):
    """The per-source token budget is never exceeded, selection is a
    deterministic prefix (re-runs identical), and every source with at
    least one doc under budget selects something."""
    from pvsyst_pdf_parser_spark.training.sampling import (
        token_budget_sample_stats,
    )

    budget = 500
    a = sorted(tuple(r) for r in
               token_budget_sample_stats(docs, budget).collect())
    b = sorted(tuple(r) for r in
               token_budget_sample_stats(docs, budget).collect())
    assert a == b  # deterministic
    for (_, n_docs, n_sel, toks) in a:
        assert 0 <= n_sel <= n_docs
        assert toks <= budget


def test_quality_model_trains_a_discriminator(spark, docs):
    """Class-balanced GD on the rule-gate weak labels must beat the
    constant base-rate predictor AND separate the class score means —
    the two failure signatures of unbalanced training on an
    imbalanced web corpus (which converges to 'always positive')."""
    from pvsyst_pdf_parser_spark.training.qualitymodel import (
        quality_model_report,
        train_quality_model,
        weak_quality_label,
    )

    w, b = train_quality_model(docs, iters=24)
    w2, b2 = train_quality_model(docs, iters=24)
    assert (w, b) == (w2, b2)  # fully deterministic: no RNG anywhere

    rep = quality_model_report(docs, w, b).collect()
    n = sum(r["n_docs"] for r in rep)
    above = sum(r["n_above_tau"] for r in rep)
    assert 0 < above < n, "degenerate constant predictor"
    # balanced training optimizes BALANCED accuracy: per-class recall
    # must both beat coin-flip (a constant predictor scores 0.5 here
    # exactly, whatever the class imbalance)
    from pvsyst_pdf_parser_spark.training.qualitymodel import (
        hashed_bow_score,
    )

    per_class = (
        weak_quality_label(docs)
        .select(
            "label",
            (hashed_bow_score(F.col("text"), w, b) >= 0.5)
            .cast("int")
            .alias("pred"),
        )
        .groupBy("label")
        .agg(F.avg((F.col("pred") == F.col("label")).cast("int")).alias("r"))
        .collect()
    )
    recall = {r["label"]: r["r"] for r in per_class}
    balanced = (recall[0] + recall[1]) / 2
    assert balanced > 0.55, f"balanced accuracy {balanced:.3f} ≤ chance"
    pos = [r["mean_score_pos"] for r in rep if r["mean_score_pos"] is not None]
    neg = [r["mean_score_neg"] for r in rep if r["mean_score_neg"] is not None]
    assert sum(pos) / len(pos) > sum(neg) / len(neg)


def test_quality_model_fixture_matches_trainer_contract(spark):
    """The committed fixture is loadable, has the advertised shape, and
    scoring with it is bounded to (0, 1)."""
    import json

    from pvsyst_pdf_parser_spark.training.qualitymodel import (
        N_BUCKETS,
        hashed_bow_score,
    )

    with open("fixtures/quality_model.json") as f:
        m = json.load(f)
    assert m["n_buckets"] == N_BUCKETS
    assert len(m["weights"]) == N_BUCKETS
    df = spark.createDataFrame(
        [("the quick brown fox jumps",), ("zzz qqq xxx",)], "text string"
    ).select(hashed_bow_score(F.col("text"), m["weights"], m["bias"]).alias("s"))
    for r in df.collect():
        assert 0.0 < r["s"] < 1.0


def test_unionfind_parity_and_auto_dispatch(spark, docs):
    """The broadcast-class union-find fast path must agree exactly with
    BOTH distributed algorithms on the real near-dup graph and on
    adversarial shapes (long chain, star, disjoint blobs, string ids),
    and connected_components_auto must route a small graph through it
    while still producing component-min labels."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        _unionfind_labels,
        connected_components,
        connected_components_auto,
        connected_components_stars,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, threshold=0.0)
    by_uf = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in _unionfind_labels(pairs).collect()
    )
    by_prop = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components(pairs).collect()
    )
    assert by_uf == by_prop

    # chain 0-1-2-...-9 plus star 100-(101..105) plus isolated pair
    edges = (
        [(i, i + 1) for i in range(9)]
        + [(100, x) for x in range(101, 106)]
        + [(500, 501)]
    )
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    by_uf = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in _unionfind_labels(df).collect()
    )
    by_stars = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components_stars(df).collect()
    )
    assert by_uf == by_stars
    by_auto = sorted(
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components_auto(df).collect()
    )
    assert by_auto == by_stars

    # string ids round-trip with the input column type
    sdf = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], "doc_a string, doc_b string"
    )
    out = _unionfind_labels(sdf)
    assert dict(out.dtypes) == {"doc_id": "string", "cluster_rep": "string"}
    got = sorted((r["doc_id"], r["cluster_rep"]) for r in out.collect())
    assert got == [
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
    ]


def test_hard_negatives_threshold_rank_and_candidate_subset(spark, emb):
    """Hard negatives: every returned pair is below the near-dup
    threshold, ranks are dense per query, the result agrees with a
    Python re-rank of the exact multiband candidate set (the operator
    is a filtered re-rank, nothing more), and no near-dup leaks in."""
    import math

    from pvsyst_pdf_parser_spark.training.simsearch import (
        hard_negatives,
        multiband_bucket_ids,
    )

    thr, k, nq = 0.4, 5, 5
    out = hard_negatives(emb, n_queries=nq, k=k, dup_threshold=thr).collect()
    assert out
    by_q: dict = {}
    for r in out:
        assert r["cos_sim"] < thr
        assert r["query_id"] != r["neg_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"], r["neg_id"]))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= k
        sims = [r[1] for r in rows]
        assert sims == sorted(sims, reverse=True)

    # python re-rank over the EXACT candidate set the buckets produce
    buckets = multiband_bucket_ids(emb).collect()
    by_bucket: dict = {}
    for r in buckets:
        by_bucket.setdefault((r["band_idx"], r["bucket"]), []).append(r["vec_id"])
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for q in range(nq):
        cands = set()
        for key, ids in by_bucket.items():
            if q in ids:
                cands.update(i for i in ids if i != q)
        scored = []
        for c in cands:
            a, b = vecs[q], vecs[c]
            cos = round(
                sum(x * y for x, y in zip(a, b))
                / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b)),
                3,
            )
            if cos < thr:
                scored.append((-cos, c))
        scored.sort()
        want = [c for _, c in scored[:k]]
        got = [r[2] for r in sorted(by_q.get(q, []))]
        assert got == want, f"query {q}: {got} != {want}"


def test_source_mixture_weights_sum_and_alpha_semantics(spark, docs):
    """Mixture weights sum to 1, epochs = expected/n_tokens, and α=1
    recovers token-proportional weights while α<1 upweights the
    smallest source relative to proportional."""
    from pvsyst_pdf_parser_spark.training.sampling import source_mixture_stats

    budget = 100_000
    rows = source_mixture_stats(docs, alpha=0.7, budget_tokens=budget).collect()
    assert len(rows) >= 2
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert abs(r["epochs"] - budget * r["weight"] / r["n_tokens"]) < 1e-3
        assert r["expected_tokens"] <= budget

    prop = {
        r["source"]: r["weight"]
        for r in source_mixture_stats(docs, alpha=1.0).collect()
    }
    tok = {r["source"]: r["n_tokens"] for r in rows}
    total = sum(tok.values())
    for srcname, w in prop.items():
        assert abs(w - tok[srcname] / total) < 1e-6
    smallest = min(tok, key=tok.get)
    alpha_w = {r["source"]: r["weight"] for r in rows}
    assert alpha_w[smallest] > prop[smallest]  # α<1 upweights small sources


def test_fuzzy_decontam_flags_planted_neardup_and_agrees_with_exact_jaccard(
    spark, docs
):
    """The fuzzy decontam path must flag at least one corpus doc that
    is a true near-dup of a benchmark row, every reported pair must
    have true shingle Jaccard >= threshold, and no pair may be a
    (corpus, corpus) or (bench, bench) pairing."""
    from pvsyst_pdf_parser_spark.training.decontam import (
        fuzzy_benchmark_overlap,
    )
    from pvsyst_pdf_parser_spark.training.dedup import doc_shingles
    import pyspark.sql.functions as F

    bench_mod, thr = 10, 0.05
    benchmark = docs.filter(F.col("doc_id") % bench_mod == 0)
    scan = docs.filter(F.col("doc_id") % bench_mod != 0)
    hits = fuzzy_benchmark_overlap(scan, benchmark, threshold=thr).collect()
    assert hits, "fixture corpus plants near-dups across the bench split"

    scan_ids = {r["doc_id"] for r in scan.select("doc_id").collect()}
    bench_ids = {r["doc_id"] for r in benchmark.select("doc_id").collect()}
    sh = {}
    for r in doc_shingles(docs).collect():
        sh.setdefault(r["doc_id"], set()).add(r["shingle"])
    for r in hits:
        assert r["doc_id"] in scan_ids and r["bench_id"] in bench_ids
        a, b = sh[r["doc_id"]], sh[r["bench_id"]]
        true_j = round(len(a & b) / len(a | b), 4)
        assert true_j == r["jaccard"]
        assert true_j >= thr


def test_shard_assignment_balance_and_serpentine_determinism(spark, docs):
    """Shard byte totals must be near-balanced on the long-tail corpus
    (serpentine LPT: max/mean well under plain round-robin's bias), the
    shard ids must cover 0..n-1, doc counts must differ by at most one,
    and a re-run must produce identical rows."""
    from pvsyst_pdf_parser_spark.training.sampling import shard_assignment_stats

    n_shards = 8
    rows = sorted(
        (r["shard"], r["n_docs"], r["total_bytes"], r["balance"])
        for r in shard_assignment_stats(docs, n_shards=n_shards).collect()
    )
    assert [r[0] for r in rows] == list(range(n_shards))
    counts = [r[1] for r in rows]
    assert max(counts) - min(counts) <= 1  # deal is exact on counts
    balance = rows[0][3]
    totals = [r[2] for r in rows]
    assert abs(balance - max(totals) / (sum(totals) / n_shards)) < 1e-3
    assert balance < 1.5  # bytes near-balanced despite long-tail sizes
    rerun = sorted(
        (r["shard"], r["n_docs"], r["total_bytes"], r["balance"])
        for r in shard_assignment_stats(docs, n_shards=n_shards).collect()
    )
    assert rerun == rows


def test_curriculum_order_phases_and_determinism(spark, docs):
    """Curriculum phases must be a pure function of the flag count
    (phase = ((5-k)*n)//6), cover every document exactly once, rank
    densely within each phase, and put strictly cleaner docs in earlier
    phases; re-runs are identical."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        curriculum_order,
        quality_scores_v2,
    )

    n_phases = 3
    rows = curriculum_order(docs, n_phases=n_phases).collect()
    assert len(rows) == docs.count()
    flags = {
        r["doc_id"]: r["flag_word_len"] + r["flag_stopwords"]
        + r["flag_symbols"] + r["flag_ttr"] + r["flag_length"]
        for r in quality_scores_v2(docs, sample_mod=1).collect()
    }
    by_phase: dict = {}
    for r in rows:
        assert r["n_flags"] == flags[r["doc_id"]]
        assert r["phase"] == ((5 - r["n_flags"]) * n_phases) // 6
        by_phase.setdefault(r["phase"], []).append(r["rank"])
    assert min(by_phase) >= 0 and max(by_phase) < n_phases
    for ranks in by_phase.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # phases are quality-monotone: every doc in an earlier phase has
    # at least as many passing flags as any doc in a later phase
    worst_per_phase = {
        p: min(flags[r["doc_id"]] for r in rows if r["phase"] == p)
        for p in by_phase
    }
    best_per_phase = {
        p: max(flags[r["doc_id"]] for r in rows if r["phase"] == p)
        for p in by_phase
    }
    for p in sorted(by_phase)[:-1]:
        assert worst_per_phase[p] >= best_per_phase[p + 1]
    rerun = curriculum_order(docs, n_phases=n_phases).collect()
    assert sorted(map(tuple, rerun)) == sorted(map(tuple, rows))


def test_quality_threshold_by_lang_order_statistic(spark, docs):
    """Per-language cutoffs: the cutoff is the score at ascending rank
    ceil(q*n) within that language, kept docs are exactly those at or
    above it, and different languages calibrate independently."""
    import math

    from pvsyst_pdf_parser_spark.training.calibrate import (
        quality_score_q4,
        quality_threshold_by_lang,
    )

    q = 0.3
    rows = {r["lang"]: r for r in quality_threshold_by_lang(docs, q=q).collect()}
    scored = docs.select("doc_id", "lang", quality_score_q4().alias("q4")).collect()
    by_lang: dict = {}
    for r in scored:
        by_lang.setdefault(r["lang"], []).append((r["q4"], r["doc_id"]))
    assert set(rows) == set(by_lang)
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        cutoff = vals[math.ceil(q * n) - 1][0]
        kept = sum(1 for v, _ in vals if v >= cutoff)
        row = rows[lang]
        assert row["n_docs"] == n
        assert row["cutoff"] == pytest.approx(cutoff, abs=1e-12)
        assert row["n_kept"] == kept
        assert row["kept_frac"] == pytest.approx(round(kept / n, 4), abs=1e-12)
        # the whole point: roughly the bottom q-fraction is dropped
        assert kept <= n - math.ceil(q * n) + len([v for v, _ in vals if v == cutoff])


def test_quality_drift_psi_identical_halves_and_planted_shift(spark, docs):
    """PSI is ~0 when both halves share a distribution (even/odd split
    of one corpus) and strictly larger under a planted score shift;
    per-bin terms are non-negative up to smoothing rounding and sum to
    psi_total."""
    from pvsyst_pdf_parser_spark.training.calibrate import quality_drift_psi

    rows = quality_drift_psi(docs).collect()
    assert rows
    total = rows[0]["psi_total"]
    assert all(r["psi_total"] == total for r in rows)
    assert abs(sum(r["psi_term"] for r in rows) - total) < 1e-6
    # PSI terms are individually >= 0 by construction ((a-b)ln(a/b) >= 0)
    assert all(r["psi_term"] >= -1e-12 for r in rows)
    # even/odd halves of one fixture corpus: no material drift
    assert total < 0.25
    # plant a shift: blank out odd docs' text so the 'current' half
    # collapses into the lowest score bin -> PSI must rise sharply
    shifted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 1, F.lit("x x")).otherwise(F.col("text")),
    )
    shifted_total = quality_drift_psi(shifted).collect()[0]["psi_total"]
    assert shifted_total > total
    assert shifted_total > 1.0


def test_bpe_fertility_anchors_and_bounds(spark, docs):
    """Fertility invariants: with an EMPTY merge table every char is
    its own token, so chars_per_token == 1.0 exactly and fertility ==
    mean word length; with a trained table token counts can only
    SHRINK (n_tokens ≤ the empty-table n_tokens, n_words/n_chars are
    merge-invariant), fertility ≥ 1 stays impossible to undershoot
    (every word is ≥ 1 token), and chars_per_token ≥ 1."""
    from pvsyst_pdf_parser_spark.training.bpe import (
        bpe_fertility_stats,
        bpe_train_merges,
    )

    base = {r["lang"]: r for r in bpe_fertility_stats(docs, []).collect()}
    assert base
    for r in base.values():
        assert r["n_tokens"] == r["n_chars"]
        assert r["chars_per_token"] == 1.0
        assert r["fertility"] == round(r["n_chars"] / r["n_words"], 4)
    merges = [(m["a"], m["b"]) for m in bpe_train_merges(docs, 4).collect()]
    assert len(merges) == 4
    trained = {
        r["lang"]: r for r in bpe_fertility_stats(docs, merges).collect()
    }
    assert set(trained) == set(base)
    for lang, r in trained.items():
        assert r["n_words"] == base[lang]["n_words"]
        assert r["n_chars"] == base[lang]["n_chars"]
        assert r["n_words"] <= r["n_tokens"] <= base[lang]["n_tokens"]
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] >= 1.0
    # the trained table actually merged something somewhere
    assert any(
        trained[lang]["n_tokens"] < base[lang]["n_tokens"] for lang in base
    )


def test_ccnet_buckets_partition_and_monotone(spark, docs):
    """CCNet terciles: per language the three buckets PARTITION the
    sampled docs with ntile's ±1 size balance (head ≥ middle ≥ tail),
    and NLL ranges are monotone non-decreasing head → middle → tail
    (head is the most fluent tier)."""
    from pvsyst_pdf_parser_spark.training.calibrate import (
        ccnet_perplexity_buckets,
    )
    from pvsyst_pdf_parser_spark.training.textstats import (
        unigram_logprob_scores,
    )

    rows = ccnet_perplexity_buckets(docs).collect()
    assert rows
    per_lang: dict = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    sampled = unigram_logprob_scores(docs, carry=("lang",)).collect()
    n_by_lang: dict = {}
    for s in sampled:
        n_by_lang[s["lang"]] = n_by_lang.get(s["lang"], 0) + 1
    assert set(per_lang) == set(n_by_lang)
    for lang, buckets in per_lang.items():
        # partition: bucket sizes sum to the sampled count
        assert sum(b["n_docs"] for b in buckets.values()) == n_by_lang[lang]
        if n_by_lang[lang] >= 3:
            assert set(buckets) == {"head", "middle", "tail"}
            sizes = [buckets[k]["n_docs"] for k in ("head", "middle", "tail")]
            # ntile balance: earlier buckets absorb the remainder
            assert max(sizes) - min(sizes) <= 1
            assert sizes[0] >= sizes[1] >= sizes[2]
            # fluency-monotone ranges (ties across the cut allowed)
            assert buckets["head"]["max_nll"] <= buckets["middle"]["min_nll"]
            assert buckets["middle"]["max_nll"] <= buckets["tail"]["min_nll"]
        for b in buckets.values():
            assert b["min_nll"] <= b["max_nll"]


def test_trigram_backoff_chain_and_bounds(spark, docs):
    """Stupid Backoff invariants: every scored doc has ≥3 tokens, hit
    counters partition the trigram positions (tri_hits + bi_hits ≤
    n_trigrams), scores are finite and strictly negative (every S < 1
    on a corpus with >1 distinct trigram), and a doc whose trigrams
    all live in the pruned table (a corpus-dominant repeated phrase)
    scores no worse than the corpus mean."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        trigram_backoff_scores,
    )

    out = trigram_backoff_scores(docs).collect()
    assert out
    n_docs_3tok = docs.filter(
        F.size(F.filter(F.split(F.lower("text"), " ", -1),
                        lambda x: x != "")) >= 3
    ).count()
    assert len(out) == n_docs_3tok
    import math

    for r in out:
        assert r["n_trigrams"] >= 1
        assert 0 <= r["n_tri_hits"] <= r["n_trigrams"]
        assert 0 <= r["n_bi_hits"] <= r["n_trigrams"] - r["n_tri_hits"]
        assert math.isfinite(r["avg_lp"])
        assert r["avg_lp"] < 0.0


def test_trigram_backoff_prefers_in_model_text(spark):
    """A document repeating one phrase (its trigrams dominate the
    pruned model) must outscore a same-length all-distinct-token doc
    whose every trigram falls through to the unigram floor."""
    from pvsyst_pdf_parser_spark.training.textstats import (
        trigram_backoff_scores,
    )

    phrase = " ".join(["the quick brown fox"] * 10)
    salad = " ".join(f"tok{i:03d}" for i in range(40))
    df = spark.createDataFrame(
        [(0, phrase), (1, salad)], "doc_id bigint, text string"
    )
    # top_m = the phrase's exact distinct n-gram count, so only the
    # dominant phrase's n-grams stay in the model — the pruning regime
    # every real corpus is in (on an
    # UNPRUNED tiny corpus each unique trigram is its own perfect
    # context and scores ln(1) = 0, so there is nothing to prefer)
    got = {
        r["doc_id"]: r
        for r in trigram_backoff_scores(df, top_m3=4, top_m2=4).collect()
    }
    assert got[0]["n_tri_hits"] > 0
    assert got[1]["n_tri_hits"] == 0  # salad fell out of the model
    assert got[0]["avg_lp"] > got[1]["avg_lp"]


def test_weighted_sample_is_exact_aes(spark, docs):
    """The distributed top-k must equal a local numpy replay of
    Efraimidis–Spirakis over the exact same md5-uniforms — selection,
    order, ranks, bit-for-bit keys."""
    import hashlib
    import math

    from pvsyst_pdf_parser_spark.training.sampling import (
        weighted_sample_topk,
    )

    k = 15
    got = weighted_sample_topk(docs, k=k).collect()
    assert [r["sel_rank"] for r in got] == list(range(1, k + 1))

    local = []
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in (r["text"] or "").lower().split(" ") if t]
        w = max(1, len(toks))
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:14], 16)
        key = math.log((h + 1) / float(1 << 56)) / w
        local.append((-key, r["doc_id"], w))
    local.sort()
    expect = local[:k]
    assert [r["doc_id"] for r in got] == [d for _, d, _ in expect]
    assert [r["weight"] for r in got] == [w for _, _, w in expect]
    for r, (negkey, _, _) in zip(got, expect):
        assert abs(r["es_key_r"] - round(-negkey, 6)) < 1e-12


def test_zorder_boxes_partition_the_morton_range(spark, docs):
    """File ranges must tile the Morton key space without overlap, and
    each file's z bounds must sit inside its fixed-width cell — the
    property min/max pruning relies on."""
    from pvsyst_pdf_parser_spark.training.zorder import zorder_file_stats

    rows = zorder_file_stats(docs, n_files=16).collect()
    assert rows
    cell = (1 << 16) // 16
    for r in rows:
        assert r["file_id"] * cell <= r["z_min"] <= r["z_max"]
        assert r["z_max"] < (r["file_id"] + 1) * cell
        assert 0 <= r["a_min"] <= r["a_max"] <= 255
        assert 0 <= r["b_min"] <= r["b_max"] <= 255
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_morton_interleave_matches_python(spark):
    """Bit-exact check of the interleave expression against a python
    reference over the full 8-bit corner set."""
    from pvsyst_pdf_parser_spark.training.zorder import morton_interleave

    vals = [0, 1, 2, 127, 128, 170, 255]
    df = spark.createDataFrame(
        [(a, b) for a in vals for b in vals], "a bigint, b bigint"
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_interleave(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for a in vals:
        for b in vals:
            assert got[(a, b)] == ref(a, b)


def test_salted_join_is_result_invariant(spark):
    """Salting must not change the join result: compare against the
    plain unsalted join computed inline (the DuckDB oracle asserts the
    same thing cross-engine at sf0.01)."""
    from pvsyst_pdf_parser_spark import demo_queries as Q
    from pvsyst_pdf_parser_spark.training.hashing import md5_56

    salted = {
        r["event_type"]: (r["n_events"], r["sum_v_milli"],
                          r["weighted_milli_ppk"])
        for r in Q.salted_skew_join(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    dim = ev.select("event_type").distinct().select(
        "event_type", (md5_56(F.col("event_type")) % 1000).alias("wp")
    )
    plain = {
        r["event_type"]: (r["n"], r["s"], r["wm"])
        for r in ev.select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
            (F.sum("v") * F.first("wp")).cast("bigint").alias("wm"),
        )
        .collect()
    }
    assert salted == plain


def test_bitext_mine_structure(spark, docs, emb):
    """One best match per (src, tgt_lang); pairs share a page_key and
    cross the language boundary; the margin is the exact integer
    n·cos − Σcos over the pre-threshold candidate neighborhood."""
    from pvsyst_pdf_parser_spark.training.bitext import bitext_mine

    rows = bitext_mine(docs, emb).collect()
    assert rows  # threshold keeps the top tail (probe: ~23 pairs)
    lang = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    seen = set()
    for r in rows:
        assert (r["src_id"], r["tgt_lang"]) not in seen  # best match only
        seen.add((r["src_id"], r["tgt_lang"]))
        assert lang[r["src_id"]] == "en"
        assert lang[r["tgt_id"]] == r["tgt_lang"] != "en"
        assert r["src_id"] // 10 == r["tgt_id"] // 10  # URL-pattern candidate
        assert r["cos_milli"] >= 250
        assert r["n_candidates"] >= 1
        # the kept pair is the group max, so its summed difference
        # margin is non-negative
        assert r["margin_mnx"] >= 0


def test_bitext_margin_exact_neighborhood_sum(spark, docs, emb):
    """Replay the margin for one surviving pair from the raw candidate
    set computed inline (threshold must NOT shrink the neighborhood)."""
    from pvsyst_pdf_parser_spark.training.bitext import bitext_mine
    from pvsyst_pdf_parser_spark.training.simsearch import cosine

    best = bitext_mine(docs, emb).orderBy("src_id", "tgt_lang").first()
    e = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    grp = [
        t for t in langs
        if langs[t] == best["tgt_lang"] and t // 10 == best["src_id"] // 10
    ]
    pairs = spark.createDataFrame(
        [(best["src_id"], t, e[best["src_id"]], e[t]) for t in grp],
        "src_id bigint, tgt_id bigint, a array<float>, b array<float>",
    ).select(
        "tgt_id",
        F.round(cosine(F.col("a"), F.col("b")) * 1000, 0)
        .cast("bigint")
        .alias("cm"),
    )
    cms = {r["tgt_id"]: r["cm"] for r in pairs.collect()}
    assert len(cms) == best["n_candidates"]
    assert cms[best["tgt_id"]] == best["cos_milli"] == max(cms.values())
    assert best["margin_mnx"] == len(cms) * best["cos_milli"] - sum(cms.values())


def test_domain_quality_prior_shrinks_toward_global(spark, docs):
    """Every host's shrunk score lies strictly between its raw mean and
    the corpus mean (unless they coincide), and hosts with more docs
    move less."""
    from pvsyst_pdf_parser_spark.training.webclean import domain_quality_prior

    rows = domain_quality_prior(docs).collect()
    assert rows
    total_n = sum(r["n_docs"] for r in rows)
    global_mean = sum(r["host_mean_q"] * r["n_docs"] for r in rows) / total_n
    for r in rows:
        lo, hi = sorted((r["host_mean_q"], global_mean))
        assert lo - 5e-4 <= r["shrunk_q"] <= hi + 5e-4
        # shrinkage magnitude matches the posterior-mean weights
        expected = (r["n_docs"] * r["host_mean_q"] + 5 * global_mean) / (
            r["n_docs"] + 5
        )
        assert abs(r["shrunk_q"] - expected) < 5e-3


def test_unimax_budgets_waterfill_invariants(spark, docs):
    """Budgets sum EXACTLY to min(B, sum caps); the capped set is a
    prefix in ascending-cap order; no budget exceeds its cap; the
    share region is even to within the 1-token remainder deal."""
    from pvsyst_pdf_parser_spark.training.sampling import unimax_budgets

    rows = sorted(
        unimax_budgets(docs).collect(),
        key=lambda r: (r["cap_tokens"], r["lang"]),
    )
    total_avail = sum(r["available_tokens"] for r in rows)
    b = total_avail * 4 // 5
    total_caps = sum(r["cap_tokens"] for r in rows)
    assert sum(r["budget_tokens"] for r in rows) == min(b, total_caps)
    for r in rows:
        assert 0 <= r["budget_tokens"] <= r["cap_tokens"]
    capped = [r["budget_tokens"] == r["cap_tokens"] for r in rows]
    # prefix property: once a language enters the share region, every
    # later (larger-cap) language is in it too
    first_share = capped.index(False) if False in capped else len(rows)
    assert all(capped[:first_share]) and not any(capped[first_share:])
    share = [r["budget_tokens"] for r in rows[first_share:]]
    if share:
        assert max(share) - min(share) <= 1  # even split + remainder


def test_source_overlap_pairs_replay(spark, docs):
    """Every pair's n_shared/jaccard_ppm replays exactly from Python
    shingle sets built the same way."""
    from pvsyst_pdf_parser_spark.training.dedup import source_overlap

    rows = source_overlap(docs).collect()
    assert rows
    sets: dict[str, set] = {}
    for r in docs.select("doc_id", "source", "text").collect():
        if r["doc_id"] % 2:
            continue
        toks = r["text"].lower().split(" ")
        sets.setdefault(r["source"], set()).update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    for r in rows:
        a, b = sets[r["source_a"]], sets[r["source_b"]]
        inter = len(a & b)
        assert r["source_a"] < r["source_b"]
        assert (r["n_shared"], r["size_a"], r["size_b"]) == (
            inter, len(a), len(b),
        )
        assert r["jaccard_ppm"] == inter * 1000000 // (len(a | b))


def test_corpus_datasheet_partitions_and_totals(spark, docs):
    """The datasheet partitions the corpus exactly: (source, lang) cell
    counts sum to the corpus size, token totals to the corpus token
    count, dupe totals to the corpus duplicate count, and every gate
    count is bounded by its cell size."""
    from pvsyst_pdf_parser_spark.training.textstats import corpus_datasheet

    rows = corpus_datasheet(docs).collect()
    n = docs.count()
    assert sum(r["n_docs"] for r in rows) == n
    tok = docs.selectExpr(
        "sum(size(split(text, ' '))) AS t"
    ).first()["t"]
    assert sum(r["total_tokens"] for r in rows) == tok
    n_dupes = n - docs.select("text").distinct().count()
    assert sum(r["n_exact_dupes"] for r in rows) == n_dupes
    for r in rows:
        assert 0 <= r["pass_lang_docs"] <= r["n_docs"]
        assert 0 <= r["pass_quality_docs"] <= r["n_docs"]
        assert r["dup_ppm"] == r["n_exact_dupes"] * 1000000 // r["n_docs"]


def test_minhash_calibration_full_python_replay(spark, docs):
    """Every calibration row replays exactly from Python: exact Jaccard
    from shingle sets, n_matches from a hashlib/perm_params signature
    replay, ppm via integer //; and the estimator behaves (mean error
    across pairs well inside the k=64 sampling noise envelope)."""
    import hashlib

    from pvsyst_pdf_parser_spark.training.dedup import (
        minhash_estimate_calibration,
    )
    from pvsyst_pdf_parser_spark.training.hashing import (
        MERSENNE_P,
        perm_params,
    )

    rows = minhash_estimate_calibration(docs).collect()
    assert rows
    shingle_sets: dict[int, set] = {}
    for r in docs.select("doc_id", "text").collect():
        if r["doc_id"] % 5:
            continue
        toks = r["text"].lower().split(" ")
        shingle_sets[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    def signature(shingles):
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:14], 16) % MERSENNE_P
            for s in shingles
        ]
        return [min((a * h + b) % MERSENNE_P for h in hs)
                for a, b in perm_params(64)]

    errs = []
    for r in rows:
        a, b = shingle_sets[r["doc_a"]], shingle_sets[r["doc_b"]]
        exact = len(a & b) * 1000000 // len(a | b)
        assert r["exact_ppm"] == exact >= 10_000
        sa, sb = signature(a), signature(b)
        n_match = sum(x == y for x, y in zip(sa, sb))
        assert r["n_matches"] == n_match
        assert r["est_ppm"] == n_match * 1000000 // 64
        assert r["err_ppm"] == abs(r["est_ppm"] - r["exact_ppm"])
        errs.append(r["err_ppm"])
    # k=64 MinHash has per-pair std <= 1e6/(2*sqrt(64)) = 62500 ppm;
    # the mean abs error across pairs must sit inside a loose 2x of it
    assert sum(errs) / len(errs) <= 125_000


def test_incremental_pairs_partition_batch_edge_set(spark, docs):
    """The daily-increment pair plan must produce EXACTLY the batch
    edge set, partitioned by pair_source: a pair is 'stored' iff both
    endpoints are existing docs, 'increment' iff at least one is new —
    with identical n_common/jaccard either way."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        incremental_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    batch = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    inc_rows = incremental_near_dup_pairs(docs, threshold=0.0).collect()
    inc = {(r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
           for r in inc_rows}
    assert inc == batch, "pair values diverge from the batch plan"
    assert {r["pair_source"] for r in inc_rows} == {"stored", "increment"}
    for r in inc_rows:
        # split rule: (doc_id DIV sample_mod) % split_mod == 0 → existing
        a_new = (r["doc_a"] // 5) % 2 != 0
        b_new = (r["doc_b"] // 5) % 2 != 0
        want = "increment" if (a_new or b_new) else "stored"
        assert r["pair_source"] == want, (r["doc_a"], r["doc_b"])


def test_incremental_cluster_labels_match_batch(spark, docs):
    """Label identity: CC over stored ∪ increment edges == CC over the
    from-scratch batch pairs (the claim that makes the incremental
    plan safe — new edges may bridge two old clusters, and the CC,
    not label patching, resolves it)."""
    from pvsyst_pdf_parser_spark.training.dedup import (
        dedup_cluster_reps,
        incremental_cluster_labels,
    )

    batch = {(r["doc_id"], r["cluster_rep"])
             for r in dedup_cluster_reps(docs, threshold=0.02).collect()}
    inc = {(r["doc_id"], r["cluster_rep"])
           for r in incremental_cluster_labels(docs, threshold=0.02).collect()}
    assert inc == batch


def test_cosine_static_bitwise_matches_cosine(spark, emb):
    """The precomputed-norm cosine (r6 optimization) must be
    BIT-identical to the inline-norm form on real embeddings — the same
    IEEE expression over the same operands, so not approximately equal:
    exactly equal, doubles compared raw — including when the norms come
    in as already-computed columns (the pair-join call shape)."""
    from pvsyst_pdf_parser_spark.training.simsearch import (
        _dot,
        _py_norm2,
        cosine,
        cosine_static,
    )

    pairs = emb.alias("a").crossJoin(
        emb.limit(5).select(F.col("embedding").alias("e2"))
    ).withColumn("n2a", _dot(F.col("embedding"), F.col("embedding"))) \
     .withColumn("n2b", _dot(F.col("e2"), F.col("e2")))
    cmp = pairs.select(
        cosine(F.col("embedding"), F.col("e2")).alias("oldc"),
        cosine_static(F.col("embedding"), F.col("e2"), 64).alias("newc"),
        cosine_static(F.col("embedding"), F.col("e2"), 64,
                      F.col("n2a"), F.col("n2b")).alias("newc_cols"),
    )
    assert cmp.filter(
        (F.col("oldc") != F.col("newc"))
        | (F.col("oldc") != F.col("newc_cols"))
    ).count() == 0
    # driver-side norm literal matches the distributed fold bitwise
    row = emb.select(
        "embedding", _dot(F.col("embedding"), F.col("embedding")).alias("n2")
    ).first()
    assert _py_norm2(list(row["embedding"])) == row["n2"]
