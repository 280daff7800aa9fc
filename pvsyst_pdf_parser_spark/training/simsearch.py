"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: broadcast the (small) query set against all
  candidates — the correctness baseline; JVM-side zip_with/aggregate,
  no Python in the loop
- single-band LSH bucket variant: deterministic random-hyperplane signs
  → bucket key → search within bucket (kept as the simple demo)
- multi-band LSH (the 10^12-scale path): ``n_bands`` independent bands
  of ``planes_per_band`` hyperplanes each; candidates are the UNION of
  same-bucket pairs across bands (OR-amplification — a true neighbor is
  missed only if it disagrees with the query in EVERY band), then exact
  cosine re-scoring of the deduplicated candidate set.  Recall is
  measured against the brute-force baseline by
  :func:`ann_recall_report`; raise ``planes_per_band`` with
  log2(corpus / target_bucket_size) to keep per-bucket work bounded as
  the corpus grows, and ``n_bands`` to buy recall back.

Ranking keys are (round(cos, 3) DESC, cand_id) so float noise between
engines cannot reorder the oracle comparison.

Execution note: exact cosine re-scoring stays JVM-side (zip_with /
aggregate on the bounded candidate set); the many-plane bucket
projection is one Arrow-batched numpy matmul (see
:func:`multiband_bucket_ids` for why the expression-tree forms lose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
# default multi-band operating point: r=5 planes × b=12 bands measured
# recall@5 = 0.61 at 38% candidate fraction on the sf0.1 embeddings —
# which are near-RANDOM unit vectors (max off-diag cos 0.60, no planted
# near-duplicates), i.e. the worst case for sign-LSH.  On clustered
# corpora with near-dup cos ≈ 0.9 (the real training-data dedup case),
# per-plane agreement is ~0.91 and r=8, b=4 already gives recall ≈ 0.97
# at a tiny candidate fraction; tune (r, b) per corpus with
# ann_recall_report.  Full measured curve in COVERAGE.md.
N_BANDS_ANN = 12
PLANES_PER_BAND = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a, b):
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def cosine_static(a, b, dim: int = 64, n2a=None, n2b=None):
    """``cosine`` with PRE-COMPUTED squared norms: the norm of a vector
    does not change per candidate pair, so scored operators compute it
    once per row before the pair join instead of twice per pair
    (3 folds/pair → 1 fold/pair; measured 35.6 s → 7.8 s on the sf1.0
    semdedup pair stage).  Same expression tree as ``cosine`` —
    dot / sqrt(n2a * n2b) — over bit-identical inputs, hence
    bit-identical output.

    The cross dot stays the ``aggregate`` HOF fold DELIBERATELY: an
    unrolled 64-term chain was tried in r6 and is execution-fast in a
    plain projection, but Catalyst clones pair-filter expressions into
    join conditions and collapses projections through them — three
    inlined 64-term chains per condition ballooned the optimizer's tree
    walk to ~100 s of pure DRIVER planning time on the semdedup pair
    plan (no task ran at all).  A ~10-node fold keeps every clone cheap
    to plan and costs one interpreted pass per pair at execution.
    ``dim`` is kept for call-site documentation only."""
    if n2a is None:
        n2a = _dot(a, a)
    if n2b is None:
        n2b = _dot(b, b)
    return _dot(a, b) / F.sqrt(n2a * n2b)


def _py_norm2(vec) -> float:
    """Driver-side ‖v‖² by the SAME left-associated IEEE chain as
    ``_dot(v, v)`` (Python floats are IEEE doubles; same order → same
    bits), for center/centroid literals collected to the driver."""
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return acc


def brute_force_topk(emb: DataFrame, n_queries: int = 5, k: int = 5,
                     dim: int = 64) -> DataFrame:
    """Top-k cosine neighbors for vec_id < n_queries (broadcast join).

    Norms are computed ONCE per side before the cross join (a pair only
    needs its cross dot — see :func:`cosine_static`).  The candidate
    side gets scan parallelism up front: a small SF's parquet is one
    row group, and the broadcast cross join adds no exchange, so the
    whole n_queries×corpus score would otherwise run on ONE core."""
    from .dedup import ensure_scan_parallelism

    emb = ensure_scan_parallelism(emb, key="vec_id")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("q_n2"),
    )
    cands = emb.select(
        F.col("vec_id").alias("cand_id"), "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("c_n2"),
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_static(F.col("q_emb"), F.col("embedding"), dim,
                              F.col("q_n2"), F.col("c_n2")), 3),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def plane_values(dim: int, j: int) -> list:
    """Hyperplane j's components computed DRIVER-SIDE with the exact
    integer-only formula the DuckDB oracle uses (Python ints are
    arbitrary-precision, so the mod-2^31 arithmetic is bit-identical;
    `x / 1000.0 - 1.0` is the same IEEE double sequence Spark's
    `cast(double)/1000.0 - 1.0` produces).

    Two rounds of multiply-mod-2^31 mixing break the linear structure a
    naive (i·j·K mod m) lattice has — with the naive formula all planes
    were near-parallel sawtooths and measured recall collapsed to
    0.01-0.05; this hash restores the theoretical sign-LSH curve."""
    out = []
    for i in range(1, dim + 1):
        h1 = (i * 2654435761 + (j + 1) * 1013904223) % 2147483648
        h2 = (h1 * 2654435761) % 2147483648
        out.append(((h2 >> 7) % 2000) / 1000.0 - 1.0)
    return out


def plane_expr(dim: int, j: int):
    """Hyperplane j as a LITERAL array<double> column.

    Round 2 evaluated `transform(sequence(1, dim), ...)` per row —
    higher-order-function exprs over `sequence` aren't constant-folded,
    so every row rebuilt every plane (O(rows × bands × planes × dim)
    array construction; `ann_multiband_topk` was the most expensive
    bench query purely from this).  An array of foldable literals IS
    constant-folded by Catalyst, so each plane is built once at plan
    time and the per-row work is only the zip_with dot product."""
    # F.lit(list) — one Py4J call; a per-component F.lit is dim round
    # trips per plane, seconds of driver build time across the bands
    return F.lit(plane_values(dim, j))


def lsh_bucket_ids(emb: DataFrame, dim: int = 64) -> DataFrame:
    """(vec_id, bucket) — sign-bit bucket over N_PLANES hyperplanes."""
    out = emb
    bits = []
    for j in range(N_PLANES):
        dot = _dot(F.col("embedding"), plane_expr(dim, j))
        bits.append(F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << j))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return out.select("vec_id", bucket.cast("int").alias("bucket"))


def lsh_bucket_stats(emb: DataFrame, dim: int = 64) -> DataFrame:
    return (
        lsh_bucket_ids(emb, dim)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


def multiband_bucket_ids(
    emb: DataFrame,
    dim: int = 64,
    n_bands: int = N_BANDS_ANN,
    planes_per_band: int = PLANES_PER_BAND,
) -> DataFrame:
    """(vec_id, band_idx, bucket) — one sign-bucket per band; band b
    uses global hyperplanes b*planes_per_band .. +planes_per_band-1
    (same deterministic formula as the DuckDB oracle).

    Implemented as ONE Arrow-batched ``mapInPandas`` doing a single
    (batch × dim) @ (dim × total_planes) float64 matmul — the 60-plane
    sign projection is exactly a BLAS job, and the expression-tree
    alternatives measured worse: per-plane zip_with/aggregate HOFs
    evaluate interpreted (no whole-stage codegen for higher-order
    functions), and a fully unrolled element-wise sum blows the janino
    64 KB method limit (codegen disabled, 3.6 MiB task binaries).
    2× faster than the HOF form on the sf0.1 embeddings; bit-identical
    buckets verified against it AND the DuckDB oracle (signs are O(1)
    magnitudes — float64 summation-order noise of ~1e-16 cannot flip
    them on real embeddings).

    NOTE mapInPandas is opaque to predicate pushdown: filter ``emb``
    BEFORE calling this (as multiband_topk does for its query side),
    never the returned frame, when only a subset is needed."""
    import numpy as np

    planes = np.array(
        [plane_values(dim, j) for j in range(n_bands * planes_per_band)]
    ).T  # dim × total_planes
    bit_weights = np.array([1 << j for j in range(planes_per_band)], dtype="int32")
    nb, ppb = n_bands, planes_per_band

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            E = np.stack(pdf["embedding"].values).astype("float64")
            bits = (E @ planes > 0).astype("int32")
            buckets = (bits.reshape(n, nb, ppb) * bit_weights).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].values, nb),
                    "band_idx": np.tile(np.arange(nb, dtype="int32"), n),
                    "bucket": buckets.reshape(-1).astype("int32"),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        compute, "vec_id long, band_idx int, bucket int"
    )


def _exact_rescored(cands: DataFrame, emb: DataFrame, n_queries: int,
                    dim: int) -> DataFrame:
    """The shared exact-cosine re-score stage of the bucketed ANN
    queries: ``cands(query_id, cand_id)`` joined to the broadcast query
    embeddings and the candidate embeddings, scored with the unrolled
    dot over norms precomputed ONCE per row (not per pair) — the same
    join order and bit-identical ``cos_sim`` as the old per-pair
    ``cosine()`` fold."""
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("q_n2"),
    )
    cside = emb.select(
        F.col("vec_id").alias("cand_id"), "embedding",
        _dot(F.col("embedding"), F.col("embedding")).alias("c_n2"),
    )
    return (
        cands.join(F.broadcast(queries), "query_id")
        .join(cside, "cand_id")
        .withColumn(
            "cos_sim",
            F.round(
                cosine_static(F.col("q_emb"), F.col("embedding"), dim,
                              F.col("q_n2"), F.col("c_n2")), 3),
        )
    )


def multiband_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 3,
    dim: int = 64,
    n_bands: int = N_BANDS_ANN,
    planes_per_band: int = PLANES_PER_BAND,
) -> DataFrame:
    """ANN top-k with multi-band OR-amplified candidates.

    Plan shape: one projection computes all band buckets (no re-scan per
    band), candidate pairs come from a (band_idx, bucket) equi-join —
    per-bucket self-join bounded by bucket occupancy — deduplicated
    BEFORE the exact-cosine re-score so each surviving pair is scored
    once.  The query side filters emb BEFORE the bucket mapInPandas
    (opaque to pushdown), so only n_queries rows pay the projection
    twice."""
    bb = multiband_bucket_ids(emb, dim, n_bands, planes_per_band)
    qb = multiband_bucket_ids(
        emb.filter(F.col("vec_id") < n_queries), dim, n_bands, planes_per_band
    ).select(F.col("vec_id").alias("query_id"), "band_idx", "bucket")
    cands = (
        qb.join(bb.withColumnRenamed("vec_id", "cand_id"), ["band_idx", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    scored = _exact_rescored(cands, emb, n_queries, dim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def hard_negatives(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    dup_threshold: float = 0.4,
    dim: int = 64,
    n_bands: int = N_BANDS_ANN,
    planes_per_band: int = PLANES_PER_BAND,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k MOST similar candidates whose cosine stays BELOW the near-dup
    threshold — similar enough to be hard, not so similar they are
    positives in disguise (a near-dup labeled "negative" poisons the
    contrastive loss; see the false-negative filtering practice in
    dense-retrieval training, e.g. Qu et al. 2021 RocketQA §3.2).

    Plan shape is :func:`multiband_topk`'s — band-bucket equi-join
    candidates (hard negatives are by definition similar, so they share
    buckets with the query; the multiband index is the RIGHT recall
    tool here, unlike for uniform-random negatives where any hash
    sample works), dedup before the exact-cosine re-score, ONE window.
    The dup filter runs after scoring, before ranking — so rank is
    dense over the kept negatives."""
    bb = multiband_bucket_ids(emb, dim, n_bands, planes_per_band)
    qb = multiband_bucket_ids(
        emb.filter(F.col("vec_id") < n_queries), dim, n_bands, planes_per_band
    ).select(F.col("vec_id").alias("query_id"), "band_idx", "bucket")
    cands = (
        qb.join(bb.withColumnRenamed("vec_id", "cand_id"), ["band_idx", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    scored = _exact_rescored(cands, emb, n_queries, dim).filter(
        F.col("cos_sim") < dup_threshold
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("neg_id"), "cos_sim", "rank")
    )


def ann_recall_report(
    emb: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
    n_bands: int = N_BANDS_ANN,
    planes_per_band: int = PLANES_PER_BAND,
) -> DataFrame:
    """recall@k of multiband ANN vs the brute-force baseline: one row
    (n_queries, k, n_hits, n_truth, recall)."""
    truth = brute_force_topk(emb, n_queries=n_queries, k=k).select(
        "query_id", "cand_id"
    )
    approx = multiband_topk(
        emb, n_queries=n_queries, k=k, dim=dim,
        n_bands=n_bands, planes_per_band=planes_per_band,
    ).select("query_id", "cand_id")
    hits = truth.join(approx, ["query_id", "cand_id"], "left_semi")
    return truth.agg(F.count("*").alias("n_truth")).crossJoin(
        hits.agg(F.count("*").alias("n_hits"))
    ).select(
        F.lit(n_queries).alias("n_queries"),
        F.lit(k).alias("k"),
        "n_hits",
        "n_truth",
        F.round(F.col("n_hits") / F.col("n_truth"), 4).alias("recall"),
    )


def candidate_fraction(
    emb: DataFrame,
    n_queries: int = 20,
    dim: int = 64,
    n_bands: int = N_BANDS_ANN,
    planes_per_band: int = PLANES_PER_BAND,
) -> float:
    """Fraction of all (query, candidate) pairs the multi-band index
    surfaces — the cost axis of the recall/cost trade-off (1.0 would be
    brute force)."""
    bb = multiband_bucket_ids(emb, dim, n_bands, planes_per_band)
    qb = multiband_bucket_ids(
        emb.filter(F.col("vec_id") < n_queries), dim, n_bands, planes_per_band
    ).select(F.col("vec_id").alias("query_id"), "band_idx", "bucket")
    n_cands = (
        qb.join(bb.withColumnRenamed("vec_id", "cand_id"), ["band_idx", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
        .count()
    )
    total = n_queries * (emb.count() - 1)
    return n_cands / total if total else 0.0


# default tuning grid: roughly constant total planes (r*b), trading
# per-band selectivity (higher r → smaller buckets → cheaper) against
# OR-amplified recall (higher b → more chances to collide)
TUNE_GRID = [(8, 4), (6, 8), (5, 12), (4, 16)]


def tune_bands(
    emb: DataFrame,
    target_recall: float = 0.5,
    grid: list | None = None,
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
) -> dict:
    """Walk (planes_per_band, n_bands) operating points, measuring
    recall@k (vs the brute-force baseline) and candidate fraction for
    each; return the CHEAPEST point meeting ``target_recall`` — or the
    max-recall point when none does — plus the full measured curve.

    This automates the hand-built COVERAGE.md recall table: run once on
    a sample of the target corpus (the curve is a property of the
    embedding distribution, not corpus size) and use the chosen (r, b)
    for the full-scale multiband_topk / embedding_neardup_pairs run.
    Driver-side loop over a handful of grid points, each one bounded
    Spark job — not a per-row operation.

    Plan shape: the brute-force truth is grid-independent, so it is
    computed ONCE and persisted across the walk; each grid point builds
    its corpus/query bucket frames exactly once and derives BOTH the
    recall and the candidate fraction from one persisted candidate set
    (the recompute-amplified form rebuilt every projection twice per
    point)."""
    from pyspark import StorageLevel

    truth = (
        brute_force_topk(emb, n_queries=n_queries, k=k)
        .select("query_id", "cand_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_truth = truth.count()
    total_pairs = n_queries * (emb.count() - 1)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    results = []
    for r, b in grid or TUNE_GRID:
        bb = multiband_bucket_ids(emb, dim, b, r)
        qb = multiband_bucket_ids(
            emb.filter(F.col("vec_id") < n_queries), dim, b, r
        ).select(F.col("vec_id").alias("query_id"), "band_idx", "bucket")
        cands = (
            qb.join(
                bb.withColumnRenamed("vec_id", "cand_id"),
                ["band_idx", "bucket"],
            )
            .filter(F.col("query_id") != F.col("cand_id"))
            .select("query_id", "cand_id")
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_cands = cands.count()
        scored = _exact_rescored(cands, emb, n_queries, dim)
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("cand_id")
        )
        approx = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id")
        )
        n_hits = truth.join(
            approx, ["query_id", "cand_id"], "left_semi"
        ).count()
        cands.unpersist()
        results.append(
            {
                "planes_per_band": r,
                "n_bands": b,
                "recall": float(round(n_hits / n_truth, 4)) if n_truth else 0.0,
                "cand_fraction": round(
                    n_cands / total_pairs if total_pairs else 0.0, 4
                ),
            }
        )
    truth.unpersist()
    feasible = [x for x in results if x["recall"] >= target_recall]
    if feasible:
        chosen = min(feasible, key=lambda x: (x["cand_fraction"], -x["recall"]))
    else:
        chosen = max(results, key=lambda x: (x["recall"], -x["cand_fraction"]))
    return {"chosen": chosen, "curve": results}


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    dim: int = 64,
    n_bands: int = N_BANDS_ANN,
    planes_per_band: int = PLANES_PER_BAND,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-flavored use of
    the multi-band index): all (a, b) with a < b and cos ≥ threshold,
    candidates restricted to same-bucket-in-some-band — never the
    all-pairs cross join.  At 10^12 docs the candidate volume is
    bounded by per-bucket occupancy × bands; raise ``planes_per_band``
    with corpus size to keep buckets small (see module docstring)."""
    from .cache import persist_tracked
    from .dedup import ensure_scan_parallelism

    emb = ensure_scan_parallelism(emb, key="vec_id")
    # the bucket frame self-joins: persist so the matmul projection runs
    # once, not once per join side (mapInPandas output is not reused by
    # the optimizer otherwise); tracked for cache.release_persisted()
    bb = persist_tracked(multiband_bucket_ids(emb, dim, n_bands, planes_per_band))
    cands = (
        bb.alias("x")
        .join(bb.alias("y"), ["band_idx", "bucket"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )
        .distinct()
    )
    n2 = _dot(F.col("embedding"), F.col("embedding"))
    ea = emb.select(F.col("vec_id").alias("id_a"),
                    F.col("embedding").alias("emb_a"), n2.alias("n2_a"))
    eb = emb.select(F.col("vec_id").alias("id_b"),
                    F.col("embedding").alias("emb_b"), n2.alias("n2_b"))
    return (
        cands.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn(
            "cos_sim",
            F.round(cosine_static(F.col("emb_a"), F.col("emb_b"), dim,
                                  F.col("n2_a"), F.col("n2_b")), 3),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_dedup_keepers(
    emb: DataFrame,
    threshold: float = 0.35,
    dim: int = 64,
    n_bands: int = N_BANDS_ANN,
    planes_per_band: int = PLANES_PER_BAND,
) -> DataFrame:
    """The end-to-end EMBEDDING dedup decision: multi-band cosine
    near-dup pairs → transitive clusters (giant-component-safe star
    contraction) → one keeper per cluster (the minimum vec_id, which is
    by construction the cluster representative) with explicit keep
    flags — the embedding-space twin of the text-space
    :func:`~pvsyst_pdf_parser_spark.training.dedup.dedup_keepers`.
    Every stage is the bounded-bucketed form: banded candidates (never
    all-pairs), O(log² n) contraction, one projection for the verdict."""
    from .dedup import connected_components_auto

    pairs = embedding_neardup_pairs(
        emb, threshold=threshold, dim=dim,
        n_bands=n_bands, planes_per_band=planes_per_band,
    )
    clusters = connected_components_auto(pairs, a="id_a", b="id_b")
    return clusters.select(
        F.col("doc_id").alias("vec_id"),
        "cluster_rep",
        (F.col("doc_id") == F.col("cluster_rep")).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer → probe nearest cells
# ---------------------------------------------------------------------------

N_CELLS = 8
N_PROBE = 2


def centroid_values(dim: int, c: int) -> list:
    """Deterministic anchor centroid c — same two-round integer hash
    family as the hyperplanes (offset constant so cells ≠ planes), so
    the DuckDB oracle reproduces it exactly.  Random anchors make this
    a random-projection coarse quantizer: the IVF *topology* (assign →
    probe nprobe cells → exact re-score) is identical to a trained
    k-means IVF, and at scale the anchor list is simply replaced by
    trained centroids (they enter the plan the same way — as literals
    broadcast with the closure)."""
    out = []
    for i in range(1, dim + 1):
        h1 = (i * 2654435761 + (c + 101) * 40503) % 2147483648
        h2 = (h1 * 2654435761) % 2147483648
        out.append(((h2 >> 7) % 2000) / 1000.0 - 1.0)
    return out


def centroid_half_norm(dim: int, c: int) -> float:
    """‖centroid c‖²/2 via SEQUENTIAL Python summation — embedded as the
    same literal in the numpy scorer and the DuckDB oracle so both
    engines subtract a bit-identical constant (numpy's pairwise ‖·‖²
    would differ in the last ulp)."""
    acc = 0.0
    for v in centroid_values(dim, c):
        acc += v * v
    return acc / 2.0


def _seq_half_norm(vec) -> float:
    """‖v‖²/2 by sequential Python summation (same determinism contract
    as :func:`centroid_half_norm`, for trained centroids)."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return acc / 2.0


def ivf_assign(
    emb: DataFrame, dim: int = 64, n_cells: int = N_CELLS, n_probe: int = 1,
    centroids: list | None = None,
) -> DataFrame:
    """(vec_id, cell_rank, cell): the n_probe nearest cells per vector
    by L2 distance (= max of dot − ‖c‖²/2 for unit-free anchors),
    cell_rank 1-based by proximity; ties break to the lower cell id.
    One numpy matmul per Arrow batch, same pattern as the multi-band
    bucket projection; at 10^12 docs this is a pure map stage and the
    posting lists are the (cell)-partitioned output.

    ``centroids`` (list of dim-length lists) swaps the deterministic
    hash anchors for TRAINED cells (see :func:`train_ivf_centroids`) —
    they enter the plan the same way, as literals broadcast with the
    closure; the hash anchors remain the oracle default."""
    import numpy as np

    if centroids is None:
        C = np.array([centroid_values(dim, c) for c in range(n_cells)])
        half_norms = np.array([centroid_half_norm(dim, c) for c in range(n_cells)])
    else:
        C = np.array(centroids, dtype="float64")  # cells × dim
        n_cells = len(centroids)
        half_norms = np.array([_seq_half_norm(v) for v in centroids])
    CT = C.T

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            E = np.stack(pdf["embedding"].values).astype("float64")
            score = E @ CT - half_norms  # argmax ⇔ argmin L2 distance
            # stable argsort on -score: ties keep the LOWER cell id
            # (matches the oracle's first-wins CASE chain)
            order = np.argsort(-score, axis=1, kind="stable")[:, :n_probe]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].values, n_probe),
                    "cell_rank": np.tile(
                        np.arange(1, n_probe + 1, dtype="int32"), n
                    ),
                    "cell": order.reshape(-1).astype("int32"),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cell_rank int, cell int"
    )


def ivf_cell_stats(emb: DataFrame, dim: int = 64, n_cells: int = N_CELLS) -> DataFrame:
    """Posting-list size per cell (the balance check an IVF needs)."""
    return (
        ivf_assign(emb, dim, n_cells, n_probe=1)
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 3,
    dim: int = 64,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    centroids: list | None = None,
) -> DataFrame:
    """IVF ANN top-k: candidates = vectors whose HOME cell (rank 1) is
    among the query's n_probe nearest cells; exact cosine re-score.
    Candidate volume is bounded by the probed posting-list sizes —
    never all-pairs — and grows with n_probe, the recall/cost knob."""
    home = ivf_assign(emb, dim, n_cells, n_probe=1, centroids=centroids).select(
        F.col("vec_id").alias("cand_id"), "cell"
    )
    probes = ivf_assign(
        emb.filter(F.col("vec_id") < n_queries), dim, n_cells,
        n_probe=n_probe, centroids=centroids,
    ).select(F.col("vec_id").alias("query_id"), "cell")
    cands = (
        probes.join(home, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    scored = _exact_rescored(cands, emb, n_queries, dim)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def ivf_recall_report(
    emb: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    centroids: list | None = None,
    truth: DataFrame | None = None,
) -> DataFrame:
    """recall@k of IVF ANN vs the brute-force baseline (mirror of
    :func:`ann_recall_report` for the cell-probing index — the two
    reports share one schema so an operator can A/B the index family
    per corpus).  Expected n_probe/n_cells of the corpus is scanned, so
    recall ≈ fraction of true neighbors in the probed cells; raise
    n_probe to buy recall.  ``centroids`` A/Bs trained cells against
    the hash anchors; ``truth`` injects a precomputed (and persisted)
    brute-force top-k so A/B callers pay for the exact baseline once."""
    if truth is None:
        truth = brute_force_topk(emb, n_queries=n_queries, k=k).select(
            "query_id", "cand_id"
        )
    approx = ivf_topk(
        emb, n_queries=n_queries, k=k, dim=dim,
        n_cells=n_cells, n_probe=n_probe, centroids=centroids,
    ).select("query_id", "cand_id")
    hits = truth.join(approx, ["query_id", "cand_id"], "left_semi")
    return truth.agg(F.count("*").alias("n_truth")).crossJoin(
        hits.agg(F.count("*").alias("n_hits"))
    ).select(
        F.lit(n_queries).alias("n_queries"),
        F.lit(k).alias("k"),
        "n_hits",
        "n_truth",
        F.round(F.col("n_hits") / F.col("n_truth"), 4).alias("recall"),
    )


def tune_nprobe(
    emb: DataFrame,
    target_recall: float = 0.5,
    probes: list | None = None,
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
    n_cells: int = N_CELLS,
    centroids: list | None = None,
) -> dict:
    """Walk n_probe operating points for the IVF index, measuring
    recall@k (vs brute force) and the scanned posting-list fraction
    for each; return the CHEAPEST point meeting ``target_recall`` — or
    the max-recall point when none does — plus the measured curve.
    The IVF twin of :func:`tune_bands` (same contract, same chosen/
    curve shape, so an operator can A/B tuners across index families).

    Plan shape mirrors the tuner lessons: brute-force truth and the
    corpus home-cell assignment are probe-count-INDEPENDENT, so both
    are computed once and persisted; each grid point only re-runs the
    (tiny) query-side assignment at its n_probe and derives recall and
    scanned fraction from one candidate set."""
    from pyspark import StorageLevel

    truth = (
        brute_force_topk(emb, n_queries=n_queries, k=k)
        .select("query_id", "cand_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_truth = truth.count()
    home = (
        ivf_assign(emb, dim, n_cells, n_probe=1, centroids=centroids)
        .select(F.col("vec_id").alias("cand_id"), "cell")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    home.count()
    total_pairs = n_queries * (emb.count() - 1)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    results = []
    for n_probe in probes or [1, 2, 3, 4]:
        probe_cells = ivf_assign(
            emb.filter(F.col("vec_id") < n_queries), dim, n_cells,
            n_probe=n_probe, centroids=centroids,
        ).select(F.col("vec_id").alias("query_id"), "cell")
        cands = (
            probe_cells.join(home, "cell")
            .filter(F.col("query_id") != F.col("cand_id"))
            .select("query_id", "cand_id")
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_cands = cands.count()
        scored = _exact_rescored(cands, emb, n_queries, dim)
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("cand_id")
        )
        approx = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id")
        )
        n_hits = truth.join(
            approx, ["query_id", "cand_id"], "left_semi"
        ).count()
        cands.unpersist()
        results.append(
            {
                "n_probe": n_probe,
                "recall": float(round(n_hits / n_truth, 4)) if n_truth else 0.0,
                "cand_fraction": round(
                    n_cands / total_pairs if total_pairs else 0.0, 4
                ),
            }
        )
    truth.unpersist()
    home.unpersist()
    feasible = [x for x in results if x["recall"] >= target_recall]
    if feasible:
        chosen = min(feasible, key=lambda x: (x["cand_fraction"], -x["recall"]))
    else:
        chosen = max(results, key=lambda x: (x["recall"], -x["cand_fraction"]))
    return {"chosen": chosen, "curve": results}


def train_ivf_centroids(
    emb: DataFrame,
    dim: int = 64,
    n_cells: int = N_CELLS,
    n_iter: int = 3,
    sample_mod: int = 1,
) -> list[list[float]]:
    """K-means (Lloyd) training of the IVF coarse quantizer as bounded
    Spark jobs — the trained replacement for the deterministic hash
    anchors.

    Seeded init from the SAME hash anchors (deterministic, no RNG);
    each iteration is one assignment pass (the numpy-matmul
    ``mapInPandas`` of :func:`ivf_assign` with the current centroids as
    literals) plus one per-(cell, position) mean aggregation
    (posexplode → groupBy avg, map-side combined — n_cells × dim result
    rows, trivially collectable).  Empty cells keep their previous
    centroid.  ``sample_mod`` trains on the deterministic
    ``vec_id % sample_mod == 0`` subsample at large scale (the centroid
    estimate needs a sample, not the corpus).

    Returns plain Python lists — centroids enter downstream plans as
    driver-side literals exactly like the hash anchors, so
    ``ivf_assign/ivf_topk/ivf_recall_report(..., centroids=...)`` run
    the identical bucketed topology."""
    sample = emb
    if sample_mod > 1:
        sample = emb.filter(F.col("vec_id") % sample_mod == 0)
    centroids = [centroid_values(dim, c) for c in range(n_cells)]
    for _ in range(n_iter):
        assign = ivf_assign(
            sample, dim, n_cells, n_probe=1, centroids=centroids
        ).select("vec_id", "cell")
        means = (
            assign.join(sample.select("vec_id", "embedding"), "vec_id")
            .select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]  # empty cells keep previous
        by_cell: dict[int, list] = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), []).append(
                (int(r["pos"]), float(r["m"]))
            )
        for cell, entries in by_cell.items():
            for pos, m in entries:
                new_c[cell][pos] = m
        centroids = new_c
    return centroids


def ivf_trained_recall_ab(
    emb: DataFrame,
    centroids: list,
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """A/B recall report: the deterministic hash-anchor IVF vs the SAME
    index topology with TRAINED (Lloyd k-means) centroids — one row per
    variant, shared schema with :func:`ivf_recall_report` plus a
    leading ``variant`` column.  The expensive exact brute-force truth
    is computed once and persisted (scoped cache), then reused by both
    variants — the only cost difference between the arms is the cell
    assignment matmul, exactly as on a real corpus where the operator
    A/Bs a retrained quantizer before swapping it in.

    Trained centroids reach the plan as driver-side float literals
    (fixtures/ivf_trained_centroids.json, regenerated by
    scripts/train_ivf.py), the same way a production job broadcasts
    model parameters with the closure."""
    from .cache import persist_tracked

    truth = persist_tracked(
        brute_force_topk(emb, n_queries=n_queries, k=k).select(
            "query_id", "cand_id"
        )
    )
    kw = dict(n_queries=n_queries, k=k, dim=dim, n_cells=n_cells,
              n_probe=n_probe, truth=truth)
    anchors = ivf_recall_report(emb, **kw)
    trained = ivf_recall_report(emb, centroids=centroids, **kw)
    return anchors.select(F.lit("anchors").alias("variant"), "*").unionByName(
        trained.select(F.lit("trained").alias("variant"), "*")
    )


def semdedup_keepers(
    emb: DataFrame,
    dim: int = 64,
    n_cells: int = N_CELLS,
    threshold: float = 0.35,
    centroids: list | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): partition the
    embedding space with a coarse quantizer (k-means in the paper; the
    same cell machinery as :func:`ivf_assign` here — trained centroids
    plug in via ``centroids``), compare pairs ONLY within a cell, and
    for each semantic-duplicate group keep the member with the LOWEST
    cosine similarity to its cluster centroid (the paper's §3 keeper
    rule: the most "extreme" point preserves the most diversity).

    Distributed shape at 10^12 docs: assignment is one map stage
    (numpy matmul per Arrow batch); the pairwise stage is an equi-join
    on ``cell`` — never an all-pairs cross join — and in public
    practice n_cells grows with the corpus (SemDeDup used 50k clusters
    for LAION) so per-cell occupancy stays bounded; components run
    through the size-dispatched star contraction; the keeper pick is
    one window over clusters.  The centroid table is ``n_cells`` rows
    and enters as a broadcast join (plan-gated).

    Differs from :func:`embedding_dedup_keepers` (multi-band LSH
    candidates, min-id keeper) in both candidate topology and keeper
    rule — this is the published centroid-partitioned variant."""
    from .cache import persist_tracked
    from .dedup import connected_components_auto, ensure_scan_parallelism

    # one cheap exchange buys full parallelism for the whole chain: the
    # assign map stage, the persisted members cache, and the pair join
    # (which plans as a BROADCAST hash join here — no exchange of its
    # own — so it inherits whatever partitioning members has; on a
    # one-row-group scan that was ONE core doing every pairwise cosine)
    emb = ensure_scan_parallelism(emb, key="vec_id")
    spark = emb.sparkSession
    if centroids is None:
        cents = [centroid_values(dim, c) for c in range(n_cells)]
    else:
        cents, n_cells = centroids, len(centroids)
    cells = spark.createDataFrame(
        [(c, cents[c], _py_norm2(cents[c])) for c in range(n_cells)],
        "cell int, centroid array<double>, c_n2 double",
    )

    assign = ivf_assign(emb, dim, n_cells, n_probe=1, centroids=centroids)
    # (vec_id, cell, embedding, n2): joined once, persisted — feeds the
    # within-cell self-join AND the centroid-similarity projection; the
    # squared norm rides along so the pair stage pays ONE dot per pair
    # instead of three folds (cosine_static contract)
    members = persist_tracked(
        assign.select("vec_id", "cell").join(
            emb.select(
                "vec_id", "embedding",
                _dot(F.col("embedding"), F.col("embedding"))
                .alias("n2"),
            ),
            "vec_id",
        )
    )
    # Guide §2.5: at demo scale n_cells (8) < cores (32), so a plain
    # equi-join on `cell` funnels ALL pairwise work through n_cells
    # shuffle partitions.  Salt the x side deterministically and explode
    # the y side n_salt ways so the join key space is n_cells × n_salt;
    # at production n_cells (≥ cores) n_salt = 1 and this is exactly the
    # old single-key join — scale-adaptive, not a local-only constant.
    par = emb.sparkSession.sparkContext.defaultParallelism
    n_salt = max(1, par // max(n_cells, 1))
    x = members.withColumn(
        "salt", F.pmod("vec_id", F.lit(n_salt)).cast("int")
    )
    y = members.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    pairs = (
        x.alias("x")
        .join(y.alias("y"), ["cell", "salt"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_static(F.col("x.embedding"), F.col("y.embedding"),
                              dim, F.col("x.n2"), F.col("y.n2")), 3),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )
    )
    clusters = connected_components_auto(pairs, a="id_a", b="id_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_rep"
    )
    # cos-to-centroid via the sequential fold (matches the oracle's
    # list_dot_product order); rounded to 6 dp BEFORE ranking so
    # cross-engine ulp drift cannot flip a keeper pick
    scored = (
        members.join(F.broadcast(cells), "cell")
        .withColumn(
            "cos_centroid",
            F.round(cosine_static(F.col("embedding"), F.col("centroid"),
                                  dim, F.col("n2"), F.col("c_n2")), 6),
        )
        .join(clusters, "vec_id", "left")
        .withColumn(
            "cluster_rep", F.coalesce(F.col("cluster_rep"), F.col("vec_id"))
        )
    )
    w = Window.partitionBy("cluster_rep").orderBy("cos_centroid", "vec_id")
    return (
        scored.withColumn("pick", F.row_number().over(w))
        .select(
            "vec_id",
            "cell",
            "cluster_rep",
            "cos_centroid",
            (F.col("pick") == 1).cast("int").alias("keep"),
        )
    )


def lsh_topk(emb: DataFrame, n_queries: int = 5, k: int = 3, dim: int = 64) -> DataFrame:
    """ANN top-k restricted to same-bucket candidates (the scale path)."""
    buckets = lsh_bucket_ids(emb, dim)
    n2 = _dot(F.col("embedding"), F.col("embedding"))
    with_bucket = emb.select("vec_id", "embedding", n2.alias("n2")).join(
        buckets, "vec_id"
    )
    queries = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
        "bucket",
    )
    cands = with_bucket.select(
        F.col("vec_id").alias("cand_id"), "embedding", "n2", "bucket"
    )
    scored = (
        queries.join(cands, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos_sim",
            F.round(cosine_static(F.col("q_emb"), F.col("embedding"), dim,
                                  F.col("q_n2"), F.col("n2")), 3),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


# ------------------------------------------------------------------ PQ
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): split the vector into M subspaces, encode
# each against a per-subspace codebook of K centroids.  The compressed
# code (M small ints per vector) is what makes billion-scale ANN
# memory-feasible; here the codebooks are the same deterministic
# hash-anchor family the IVF cells use (offset so they differ), so the
# DuckDB oracle replays the exact literals — trained codebooks would
# enter the plan the same way.

PQ_M = 8           # subspaces (64-dim vectors → 8 dims each)
PQ_K = 16          # centroids per subspace
_PQ_OFFSET = 307   # hash-family offset: PQ codebooks ≠ IVF cells


def pq_centroid_values(sub: int, code: int, sub_dim: int = 8) -> list:
    """Deterministic codebook entry (sub, code) — same two-round
    integer hash family as centroid_values with a PQ-specific offset."""
    out = []
    for i in range(1, sub_dim + 1):
        h1 = (
            (sub * 8 + i) * 2654435761 + (code + _PQ_OFFSET) * 40503
        ) % 2147483648
        h2 = (h1 * 2654435761) % 2147483648
        out.append(((h2 >> 7) % 2000) / 1000.0 - 1.0)
    return out


def pq_encode(emb: DataFrame, m: int = PQ_M, k: int = PQ_K,
              dim: int = 64) -> DataFrame:
    """(vec_id, subspace, code, distortion): nearest codebook entry per
    subspace by L2 (argmax of dot − ‖c‖²/2, ties to the lower code —
    the IVF assign contract), plus the squared quantization error.

    One numpy matmul per (Arrow batch × subspace) — a pure map stage at
    any corpus size; the codebooks are M×K literals broadcast with the
    closure.  ‖x_sub‖² is accumulated in LEFT-TO-RIGHT element order
    (column-wise vectorized adds) so the distortion arithmetic is
    replayable (numpy's ``sum`` pairwise association differs in the
    last ulp from SQL's left-to-right chain; results round to 4
    decimals downstream anyway)."""
    import numpy as np

    sub_dim = dim // m
    C = np.array(
        [[pq_centroid_values(s, c, sub_dim) for c in range(k)]
         for s in range(m)]
    )  # m × k × sub_dim
    half = np.array(
        [[_seq_half_norm(C[s, c]) for c in range(k)] for s in range(m)]
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            E = np.stack(pdf["embedding"].values).astype("float64")
            out_vid, out_sub, out_code, out_dist = [], [], [], []
            for s in range(m):
                Es = E[:, s * sub_dim:(s + 1) * sub_dim]
                score = Es @ C[s].T - half[s]          # n × k
                codes = np.argmax(score, axis=1)        # first max = low code
                best = score[np.arange(n), codes]
                # sequential-order ‖x_sub‖² (determinism contract):
                # accumulate COLUMN-wise so the per-row float chain is
                # the left-associated 0+v₁²+v₂²+… a SQL replay produces,
                # while every add is a vectorized op across rows (the
                # per-row Python loop this replaces was the encode
                # stage's hot spot)
                xnorm = np.zeros(n)
                for i in range(sub_dim):
                    v = Es[:, i]
                    xnorm = xnorm + v * v
                out_vid.append(pdf["vec_id"].values)
                out_sub.append(np.full(n, s, dtype="int32"))
                out_code.append(codes.astype("int32"))
                out_dist.append(xnorm - 2.0 * best)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_vid),
                    "subspace": np.concatenate(out_sub),
                    "code": np.concatenate(out_code),
                    "distortion": np.concatenate(out_dist),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id long, subspace int, code int, distortion double"
    )


def pq_codebook_stats(emb: DataFrame, m: int = PQ_M, k: int = PQ_K,
                      dim: int = 64) -> DataFrame:
    """Codebook-balance + distortion report: per (subspace, code), how
    many vectors quantize to it and their mean squared error — the
    health check that catches dead codes / collapsed codebooks before
    a PQ index ships.  One map stage + one bounded (≤ M×K rows) agg."""
    return (
        pq_encode(emb, m, k, dim)
        .groupBy("subspace", "code")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(F.avg("distortion"), 4).alias("avg_distortion"),
        )
        .orderBy("subspace", "code")
    )


def pq_adc_lut(
    emb: DataFrame, n_queries: int = 5, m: int = PQ_M, k: int = PQ_K,
    dim: int = 64,
) -> DataFrame:
    """(query_id, subspace, code, d): the ADC lookup table — squared L2
    distance from each EXACT query subvector to every codebook entry
    (Jégou et al. 2011 §III.B, "asymmetric" because only the database
    side is quantized).

    ‖q_s − c‖² is a fixed-order per-element sum (0 + (q₁−c₁)² +
    (q₂−c₂)² + …, left-associated — ``aggregate``'s fold order), so the
    DuckDB oracle replays the float chain EXACTLY — no cross-engine ulp
    drift enters before the final rounding.  One projection over the
    n_queries rows exploding an M×K index range against ONE
    constant-folded codebook literal: the table is
    n_queries × M × K rows (≤ 640 here), broadcast-sized at any corpus
    scale — queries are a constant, never the corpus.

    The codebook enters as a single ``array<array<double>>`` literal
    and the distance as an ``aggregate`` fold (a codegen LOOP), not an
    unrolled M×K×sub_dim expression tree: the unrolled form blew past
    Janino's method-size limit (whole-stage codegen compile failure →
    interpreted fallback) and shipped a ~1.7 MiB task binary."""
    sub_dim = dim // m
    cents = F.lit([
        pq_centroid_values(s, c, sub_dim)
        for s in range(m)
        for c in range(k)
    ])  # entry s*k + c; all-literal, folded to one Literal node
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q"),
    )
    exploded = queries.select(
        "query_id",
        "q",
        F.explode(F.sequence(F.lit(0), F.lit(m * k - 1))).alias("idx"),
    ).select(
        "query_id",
        "q",
        F.expr(f"idx div {k}").cast("int").alias("subspace"),
        F.pmod("idx", F.lit(k)).cast("int").alias("code"),
        F.element_at(cents, F.col("idx") + 1).alias("cent"),
    )

    def _sq_l2_term(acc, i):
        e = F.element_at(F.col("q"), (
            F.col("subspace") * sub_dim + i
        ).cast("int")) - F.element_at(F.col("cent"), i)
        return acc + e * e

    return exploded.select(
        "query_id",
        "subspace",
        "code",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(sub_dim)), F.lit(0.0), _sq_l2_term
        ).alias("d"),
    )


def pq_adc_topk(
    emb: DataFrame, n_queries: int = 5, topk: int = 5, m: int = PQ_M,
    k: int = PQ_K, dim: int = 64,
) -> DataFrame:
    """(query_id, cand_id, adc_dist, adc_rank): top-k nearest database
    vectors per query by PQ asymmetric distance — the search stage that
    makes the :func:`pq_encode` codes USEFUL: compressed codes are all
    the scan touches; exact vectors never leave the query side.

    Plan shape at 10^12 vectors: the code frame is the one corpus-sized
    input (M rows per vector, produced by the pq_encode map stage); it
    joins the BROADCAST lut on (subspace, code) — no corpus shuffle —
    then one groupBy on (query_id, cand_id) with map-side combine sums
    the M per-subspace terms.  A production variant packs the M codes
    into one array column and folds the LUT inside the same map stage
    (per-partition top-k, then a bounded global merge — exact for
    top-k); the unpacked join form is kept here because it is pure
    relational algebra the oracle replays row for row.  adc_dist is
    rounded to 6 dp BEFORE ranking (the cross-engine rank-stability
    contract used by every scored operator in this module); ties break
    on cand_id ascending."""
    codes = pq_encode(emb, m, k, dim).select("vec_id", "subspace", "code")
    lut = pq_adc_lut(emb, n_queries, m, k, dim)
    scored = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), "d")
        .groupBy("query_id", "cand_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("adc_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("adc_rank") <= topk)
        .select("query_id", "cand_id", "adc_dist", "adc_rank")
    )


def ivf_pq_topk(
    emb: DataFrame,
    n_queries: int = 5,
    topk: int = 5,
    dim: int = 64,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    k: int = PQ_K,
) -> DataFrame:
    """(query_id, cand_id, adc_dist, adc_rank): IVFADC (Jégou et al.
    2011 §IV) — the coarse quantizer prunes (candidates come only from
    the query's ``n_probe`` probed posting lists) and PQ asymmetric
    distance re-scores, so the scan touches ONLY compressed codes of a
    bounded candidate set.  This composition of :func:`ivf_assign` and
    :func:`pq_adc_topk`'s scoring stage is the billion-scale ANN
    architecture in production use (e.g. FAISS ``IVFPQ``).

    Plan shape at 10^12 vectors: home-cell assign and pq_encode are the
    two map stages the index build already pays (in a real system both
    are written once, partitioned by cell); the probe join keys on
    cell (posting-list-bounded, never all-pairs), the candidate frame
    joins the code frame on cand_id, the lut stays BROADCAST, and ONE
    (query, cand) agg with map-side combine sums the M terms.  Exact
    candidate vectors are never read — that is the point of ADC."""
    home = ivf_assign(emb, dim, n_cells, n_probe=1).select(
        F.col("vec_id").alias("cand_id"), "cell"
    )
    probes = ivf_assign(
        emb.filter(F.col("vec_id") < n_queries), dim, n_cells,
        n_probe=n_probe,
    ).select(F.col("vec_id").alias("query_id"), "cell")
    cands = (
        probes.join(home, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    codes = pq_encode(emb, m, k, dim).select(
        F.col("vec_id").alias("cand_id"), "subspace", "code"
    )
    lut = pq_adc_lut(emb, n_queries, m, k, dim)
    scored = (
        cands.join(codes, "cand_id")
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("adc_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("adc_rank") <= topk)
        .select("query_id", "cand_id", "adc_dist", "adc_rank")
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (database-friendly ±1 variant,
# Achlioptas 2003 JCSS "Database-friendly random projections").  Projecting
# 64-dim embeddings onto out_dim ±1 hyperplanes preserves pairwise angles
# up to JL distortion while cutting every downstream ANN/dedup dot product
# by dim/out_dim — the standard pre-index compression step when the
# embedding column, not the candidate count, dominates cost.  Signs come
# from the same two-round multiply-mod-2^31 mix as plane_values (a salt
# keeps them independent of the LSH planes) and are embedded as ±1.0
# LITERAL arrays on BOTH engines, so the projection is one constant-folded
# zip_with dot per component — pure JVM, no Python, no shuffle.  The ±1
# scheme needs no 1/sqrt(out_dim) scale for cosine (scale cancels), which
# also keeps every projected component an exact sum of the input floats —
# no irrational scale factor for cross-engine drift to hide in.

_JL_SALT = 777767777


def jl_sign_values(dim: int, j: int) -> list:
    """Component signs (±1) of JL hyperplane j, driver-side integer-only
    arithmetic shared verbatim with the DuckDB oracle builder."""
    out = []
    for i in range(1, dim + 1):
        h1 = (i * 2654435761 + (j + 1) * 1013904223 + _JL_SALT) % 2147483648
        h2 = (h1 * 2654435761) % 2147483648
        out.append(float(((h2 >> 7) % 2) * 2 - 1))
    return out


def jl_sign_expr(dim: int, j: int):
    # one Py4J call per plane (see plane_expr)
    return F.lit(jl_sign_values(dim, j))


def jl_project(emb: DataFrame, dim: int = 64, out_dim: int = 16) -> DataFrame:
    """(vec_id, proj: array<double>) — out_dim ±1-hyperplane components.

    Each component is one zip_with/aggregate dot against a literal sign
    array (constant-folded by Catalyst, codegen'd, zero shuffle): a pure
    map stage whatever the corpus size, exactly like pq_encode."""
    comps = [
        _dot(F.col("embedding"), jl_sign_expr(dim, j))
        for j in range(out_dim)
    ]
    return emb.select("vec_id", F.array(*comps).alias("proj"))


def jl_recall_report(
    emb: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    dim: int = 64,
    out_dim: int = 16,
) -> DataFrame:
    """recall@k of cosine top-k computed in JL-projected space vs the
    full-dimension brute-force truth: one row
    (out_dim, n_queries, k, n_hits, n_truth, recall) — the measured
    answer to "how many projected dims does THIS corpus need".  Both
    spaces rank by (round(cos, 3) DESC, cand_id) so float noise cannot
    reorder the cross-engine comparison.  The projected-space search
    here is the brute-force demo form; at scale the projected frame
    feeds the same multiband/IVF indexes (the report quantifies the
    recall cost of the compression alone)."""
    from .dedup import ensure_scan_parallelism

    emb = ensure_scan_parallelism(emb, key="vec_id")
    truth = brute_force_topk(emb, n_queries=n_queries, k=k, dim=dim).select(
        "query_id", "cand_id"
    )
    proj = jl_project(emb, dim=dim, out_dim=out_dim)
    p_n2 = _dot(F.col("proj"), F.col("proj"))
    queries = proj.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("proj").alias("q_proj"),
        p_n2.alias("q_n2"),
    )
    cands = proj.select(
        F.col("vec_id").alias("cand_id"), "proj", p_n2.alias("c_n2")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos_sim",
            F.round(cosine_static(F.col("q_proj"), F.col("proj"), out_dim,
                                  F.col("q_n2"), F.col("c_n2")), 3),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    approx = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id")
    )
    hits = truth.join(approx, ["query_id", "cand_id"], "left_semi")
    return truth.agg(F.count("*").alias("n_truth")).crossJoin(
        hits.agg(F.count("*").alias("n_hits"))
    ).select(
        F.lit(out_dim).alias("out_dim"),
        F.lit(n_queries).alias("n_queries"),
        F.lit(k).alias("k"),
        "n_hits",
        "n_truth",
        F.round(F.col("n_hits") / F.col("n_truth"), 4).alias("recall"),
    )


# row-local signed feature-hash fold for one embedding dimension:
# Σ over a doc's token HASHES of ±1 by bit j of the 56-bit md5 — ONE
# md5 per token (hashed once into __hs), 8 sign bits read from it,
# instead of 8 md5 evaluations per token (measured 8x less hash work
# at the same statistical contract: md5 bits are independent)
_FH_DIM = """
cast(aggregate(__hs, 0L,
     (acc, h) -> acc + IF(shiftright(h, {j}) % 2 = 0, 1L, -1L))
     AS bigint)
"""


def hashed_doc_embedding(docs: DataFrame, n_dims: int = 8) -> DataFrame:
    """Deterministic FEATURE-HASHED document embedding (Weinberger et
    al. 2009, "Feature Hashing for Large Scale Multitask Learning" —
    the hashing-trick sign construction): dimension j of a document is
    Σ over token occurrences of ±1, the sign drawn from BIT j of the
    token's 56-bit md5 (one hash per token; md5 bits are independent,
    so 8 bits of one digest cost 1/8th of 8 digests and keep the
    unbiased-inner-product contract).  This is the bridge that turns
    the TEXT corpus
    into ANN-ready vectors with NO trained model and NO external
    embedding table — the unbiased-inner-product guarantee of the
    hashing trick means cosine over these columns approximates token-
    multiset similarity, so every vector operator in this module
    (banded LSH, IVF, SemDeDup-style keepers) can run directly on a
    documents table.

    Output per doc: n_tokens, d0..d{{n_dims-1}} as EXACT bigint sums
    (integer end-to-end — both engines agree bit-for-bit), plus the
    L2 norm rounded to 4 decimals (computed from those exact integers,
    so the rounding is deterministic too).

    Distributed shape at 10^12 documents: entirely ROW-LOCAL — still
    one map pass, no explode, no shuffle of any kind (plan-gated
    exchange-free).  r6 execution change only: the JVM still computes
    ONE md5 per token occurrence, but the n_dims per-dimension
    ``aggregate`` HOF folds (interpreted, boxed per element — the r5
    hot spot) are replaced by ONE Arrow-batched numpy stage that
    extracts all sign bits and sums them with ``np.add.reduceat`` per
    batch (guide §4.2).  Every d_j is the same exact integer (±1 sums
    are order-free); the l2 rounding stays in the JVM so the rounding
    engine is unchanged."""
    import numpy as np

    toks = F.expr("filter(split(lower(text), ' ', -1), t -> t <> '')")
    hashes = F.expr(
        "transform(__toks,"
        " x -> cast(conv(substring(md5(x), 1, 14), 16, 10) AS bigint))"
    )
    base = docs.select("doc_id", toks.alias("__toks")).select(
        "doc_id",
        F.size("__toks").cast("bigint").alias("n_tokens"),
        hashes.alias("__hs"),
    )

    def fold(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            lens = pdf["__hs"].map(len).to_numpy(dtype="int64")
            flat = (
                np.concatenate([np.asarray(h, dtype="int64")
                                for h in pdf["__hs"]])
                if lens.sum() else np.empty(0, dtype="int64")
            )
            starts = np.zeros(n, dtype="int64")
            np.cumsum(lens[:-1], out=starts[1:])
            # reduceat demands indices < len(flat): trailing zero-length
            # docs would point one past the end — clamp (their sums are
            # zeroed below anyway)
            if len(flat):
                np.minimum(starts, len(flat) - 1, out=starts)
            out = {"doc_id": pdf["doc_id"].values,
                   "n_tokens": pdf["n_tokens"].values}
            for j in range(n_dims):
                signs = 1 - 2 * ((flat >> j) & 1)
                sums = (
                    np.add.reduceat(signs, starts)
                    if len(flat) else np.zeros(n, dtype="int64")
                )
                # reduceat on an empty segment (len 0) returns the NEXT
                # element's value — zero it explicitly
                sums = np.where(lens > 0, sums, 0)
                out[f"d{j}"] = sums.astype("int64")
            yield pd.DataFrame(out)

    dims_schema = ", ".join(f"d{j} long" for j in range(n_dims))
    with_dims = base.mapInPandas(
        fold, f"doc_id long, n_tokens long, {dims_schema}"
    )
    norm_sq = None
    for j in range(n_dims):
        term = F.col(f"d{j}") * F.col(f"d{j}")
        norm_sq = term if norm_sq is None else norm_sq + term
    return with_dims.select(
        "doc_id",
        "n_tokens",
        *[f"d{j}" for j in range(n_dims)],
        F.round(F.sqrt(norm_sq.cast("double")), 4).alias("l2_norm"),
    )


def kcenter_coreset_trace(emb: DataFrame, k: int = 8,
                          dim: int = 64) -> DataFrame:
    """Greedy k-center coreset selection over the embedding column
    (Gonzalez 1985 farthest-point traversal) — the geometric
    diversity-based data-selection primitive: the k selected vectors
    2-approximate the minimal covering radius, so a subset built this
    way maximizes coverage of the embedding space instead of sampling
    the dense center (the "prototypes" failure mode data-pruning work
    warns about, e.g. Sorscher 2022's beyond-scaling-laws analysis).

    Deterministic: the seed is min(vec_id); each round selects the
    point with the MAX (rounded) cosine distance to the selected set,
    ties broken by min vec_id.  Distances are round(1 - cos, 4) in
    float64 so the DuckDB recursive-CTE oracle reproduces the exact
    trajectory.

    Returns the selection trace: (step, vec_id, radius) where radius
    is the selected point's distance to the prior set — step k's
    radius is the classic k-center coverage bound for the whole
    corpus.

    Distributed shape: k-1 bounded jobs, each ONE full scan + a
    1-row argmax collect (TakeOrdered); the selected centers re-enter
    as closure literals, exactly like the trained IVF centroids.  Uses
    the standard incremental form: a persisted running min-dist column
    folds in only the NEWEST center each round — O(nk) total distance
    evals instead of the naive O(nk²) all-centers recompute, the same
    trajectory bit-for-bit because each per-center distance is rounded
    BEFORE the min and min is associative."""
    from .cache import persist_tracked
    from .dedup import ensure_scan_parallelism

    # one cheap exchange → the per-round distance scans use every core
    # (the raw scan is one row group at small SFs)
    emb = ensure_scan_parallelism(emb, key="vec_id")
    # one materialized scan shared by all k rounds (the parquet decode
    # would otherwise re-run per round; the centers change, the data
    # never does); ‖e‖² rides along so every round pays one dot per
    # (row, center) instead of three folds (cosine_static contract —
    # the center's norm is a driver-side literal via the same IEEE
    # chain, _py_norm2)
    emb = persist_tracked(
        emb.select(
            "vec_id", "embedding",
            _dot(F.col("embedding"), F.col("embedding"))
            .alias("n2"),
        )
    )
    seed = emb.orderBy("vec_id").first()
    centers = [(int(seed["vec_id"]), [float(x) for x in seed["embedding"]])]
    trace = [(1, centers[0][0], 0.0)]

    def _dist_to(vec: list) -> Column:
        return F.round(
            F.lit(1.0)
            - cosine_static(
                F.col("embedding"),
                F.lit(vec),
                dim,
                F.col("n2"),
                F.lit(_py_norm2(vec)),
            ),
            4,
        )

    # running min distance to the selected set; each round folds in
    # ONLY the newest center (per-center distances are rounded before
    # the min, so the nested least() is the naive form's least(*all)
    # value-for-value) and persists the small (vec_id, embedding, n2,
    # mind) frame it hands the argmax and the next fold
    cur = persist_tracked(
        emb.select(
            "vec_id", "embedding", "n2",
            _dist_to(centers[0][1]).alias("mind"),
        )
    )
    for step in range(2, k + 1):
        chosen = (
            cur.filter(~F.col("vec_id").isin([vid for vid, _ in centers]))
            .orderBy(F.col("mind").desc(), "vec_id")
            .first()
        )
        centers.append(
            (int(chosen["vec_id"]), [float(x) for x in chosen["embedding"]])
        )
        trace.append((step, int(chosen["vec_id"]), float(chosen["mind"])))
        if step < k:
            cur = persist_tracked(
                cur.select(
                    "vec_id", "embedding", "n2",
                    F.least(
                        F.col("mind"), _dist_to(centers[-1][1])
                    ).alias("mind"),
                )
            )
    return emb.sparkSession.createDataFrame(
        trace, "step int, vec_id bigint, radius double"
    )


def cluster_silhouette_report(
    emb: DataFrame,
    dim: int = 64,
    n_cells: int = N_CELLS,
    centroids: list | None = None,
) -> DataFrame:
    """Per-cell simplified silhouette (Kaufman & Rousseeuw 1990; the
    centroid form popularized for k-means audits by Hruschka et al.
    2004): for each vector, a = squared L2 distance to its OWN cell
    centroid, b = squared L2 distance to the nearest OTHER centroid,
    s = (b - a) / max(a, b) in [-1, 1].  A cell whose mean silhouette
    drifts toward 0 is overlapping its neighbor — the audit that tells
    an IVF/SemDeDup deployment its coarse quantizer needs retraining
    before recall silently decays.

    (cell, n_vectors, mean_sil, min_sil, max_sil) — per-vector s is
    rounded to 6 dp before the aggregate so cross-engine ulp drift
    cannot flip a min/max pick; the mean is rounded to 4.

    Distributed shape at 10^12 vectors: cell assignment is the same
    one-map-stage matmul as :func:`ivf_assign` (n_probe=2 gives own +
    nearest-other in one pass); distances are a pure projection against
    the broadcast centroid table (n_cells rows); the only shuffle is
    the final n_cells-row aggregate with map-side combine.  Trained
    centroids plug in via ``centroids`` exactly as in
    :func:`semdedup_keepers`."""
    spark = emb.sparkSession
    if centroids is None:
        cents = [centroid_values(dim, c) for c in range(n_cells)]
    else:
        cents, n_cells = centroids, len(centroids)
    cells = spark.createDataFrame(
        [(c, cents[c], _py_norm2(cents[c])) for c in range(n_cells)],
        "cell int, centroid array<double>, c_n2 double",
    )

    assign = ivf_assign(emb, dim, n_cells, n_probe=2, centroids=centroids)
    own = assign.filter(F.col("cell_rank") == 1).select("vec_id", "cell")
    other = assign.filter(F.col("cell_rank") == 2).select(
        "vec_id", F.col("cell").alias("cell2")
    )

    # squared L2 via the sequential-order chain (matches DuckDB's
    # list_dot_product association order): ||e - c||^2 =
    # e.e - 2 e.c + c.c, each term bit-comparable across engines;
    # e.e is computed once per row (n2 column) and c.c once per
    # centroid (_py_norm2 literal) instead of per (row, centroid)
    def _sq_l2(c_col, cn2_col):
        e = F.col("embedding")
        return F.round(
            F.col("n2") - F.lit(2.0) * _dot(e, c_col) + cn2_col,
            6,
        )

    m = (
        emb.select(
            "vec_id", "embedding",
            _dot(F.col("embedding"), F.col("embedding"))
            .alias("n2"),
        )
        .join(own, "vec_id")
        .join(other, "vec_id")
        .join(F.broadcast(cells), "cell")
        .join(
            F.broadcast(
                cells.select(
                    F.col("cell").alias("cell2"),
                    F.col("centroid").alias("centroid2"),
                    F.col("c_n2").alias("c_n2_2"),
                )
            ),
            "cell2",
        )
        .select(
            "vec_id",
            "cell",
            _sq_l2(F.col("centroid"), F.col("c_n2")).alias("a2"),
            _sq_l2(F.col("centroid2"), F.col("c_n2_2")).alias("b2"),
        )
    )
    sil = m.select(
        "vec_id",
        "cell",
        F.when(F.greatest("a2", "b2") <= F.lit(0.0), F.lit(0.0))
        .otherwise(
            F.round(
                (F.col("b2") - F.col("a2")) / F.greatest("a2", "b2"), 6
            )
        )
        .alias("s"),
    )
    return (
        sil.groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("s"), 4).alias("mean_sil"),
            F.min("s").alias("min_sil"),
            F.max("s").alias("max_sil"),
        )
    )
