"""Model-based quality filtering — the learned gate modern pipelines
run after rule-based cleaning (public practice: fastText classifiers
over bag-of-words features select "high-quality" web text in GPT-3's
curation, CCNet's LM filter, and the DCLM/FineWeb-style classifier
era).  This is the minimal honest Spark-native version:

- the MODEL is a hashed bag-of-words logistic regression: every token
  hashes to one of ``n_buckets`` portable md5 buckets, the document
  feature is the bucket-count vector normalized by length, and the
  score is ``sigmoid(bias + mean(bucket_weight(token)))``.
- SCORING is a pure column projection: the weight vector enters the
  plan as an array literal and the per-token lookup + mean runs as a
  higher-order function — zero shuffle, whole-stage codegen, a free
  map stage over 10^12 documents (the plan gate pins this).
- TRAINING is deterministic full-batch gradient descent implemented as
  bounded Spark jobs (one score projection + one per-bucket gradient
  aggregation per iteration — the same job-shape discipline as
  simsearch.train_ivf_centroids): no RNG, no driver-side data, the
  collect per iteration is n_buckets rows.  Weak labels come from the
  rule-based gate (quality_scores_v2 ≥ 4/5), the standard bootstrap
  when no human labels exist.

Trained weights are frozen to a committed JSON fixture
(scripts/train_quality.py) and embedded as literals on BOTH engines,
exactly like the IVF centroids — retraining is a fixture refresh, not
a code change.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .hashing import md5_56

N_BUCKETS = 256


def _bucket(tok: Column, n_buckets: int) -> Column:
    return (md5_56(tok) % n_buckets).cast("int")


def hashed_bow_score(
    text: Column, weights: list[float], bias: float, n_buckets: int | None = None
) -> Column:
    """sigmoid(bias + mean over tokens of weights[bucket(token)]) as a
    pure HOF projection; ``weights`` enters as an array literal."""
    nb = n_buckets or len(weights)
    w = F.lit([float(x) for x in weights])
    toks = F.split(F.lower(text), " ", -1)
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(w, _bucket(t, nb) + 1),
    )
    z = F.lit(float(bias)) + total / F.size(toks)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def weak_quality_label(docs: DataFrame) -> DataFrame:
    """(doc_id, text, source, label): rule-gate bootstrap labels —
    1 when ≥4 of the 5 Gopher/C4 rules pass (the SAME expression the
    cleaning funnel gates on, so labels cannot drift from the rules).
    Pure projection — no window, no shuffle."""
    from .textstats import quality_gate_expr

    return docs.select(
        "doc_id", "text", "source",
        quality_gate_expr().cast("int").alias("label"),
    )


def train_quality_model(
    docs: DataFrame,
    n_buckets: int = N_BUCKETS,
    iters: int = 48,
    lr: float = 4.0,
    l2: float = 1e-4,
) -> tuple[list[float], float]:
    """Deterministic full-batch logistic GD → (weights, bias).

    Per iteration: one score projection with the current weights as
    literals, one (bucket)-keyed gradient aggregation (map-side
    combined; output = n_buckets rows), one bias aggregate.  Iteration
    count and learning rate are fixed — same inputs, same model, no
    RNG anywhere.  Web corpora are label-imbalanced (most docs pass the
    rule gate), so each example is weighted inversely to its class
    frequency — without this, GD converges to the constant
    base-rate predictor and the model discriminates nothing.  Train on
    a deterministic subsample (doc_id-mod) at real scale; full corpus
    here."""
    labeled = weak_quality_label(docs).select(
        "doc_id",
        "label",
        F.split(F.lower("text"), " ", -1).alias("toks"),
    )
    labeled = labeled.withColumn("n_toks", F.size("toks")).persist()
    counts = {
        r["label"]: r["n"]
        for r in labeled.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    n_pos, n_neg = counts.get(1, 0), counts.get(0, 0)
    n_docs = n_pos + n_neg
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"degenerate weak labels (pos={n_pos}, neg={n_neg}): "
            "cannot train a discriminator on one class"
        )
    # balanced example weights: each CLASS contributes n_docs/2 total
    cw = F.when(
        F.col("label") == 1, F.lit(n_docs / (2.0 * n_pos))
    ).otherwise(F.lit(n_docs / (2.0 * n_neg)))
    labeled = labeled.withColumn("cw", cw).persist()
    labeled.count()

    w = [0.0] * n_buckets
    b = 0.0
    for _ in range(iters):
        warr = F.lit(list(w))
        total = F.aggregate(
            F.col("toks"),
            F.lit(0.0),
            lambda acc, t: acc + F.element_at(warr, _bucket(t, n_buckets) + 1),
        )
        z = F.lit(b) + total / F.col("n_toks")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        scored = labeled.withColumn(
            "resid", (p - F.col("label")) * F.col("cw")
        )
        # d loss / d w_bucket = mean over docs of resid * (count_bucket / n_toks)
        grads = (
            scored.select(
                "resid",
                "n_toks",
                F.explode("toks").alias("tok"),
            )
            .groupBy(_bucket(F.col("tok"), n_buckets).alias("bucket"))
            .agg(
                F.sum(F.col("resid") / F.col("n_toks")).alias("g")
            )
            .collect()
        )
        g_bias = scored.agg(F.sum("resid").alias("g")).collect()[0]["g"]
        gmap = {r["bucket"]: r["g"] for r in grads}
        w = [
            wi - lr * (gmap.get(i, 0.0) / n_docs + l2 * wi)
            for i, wi in enumerate(w)
        ]
        b -= lr * g_bias / n_docs
    labeled.unpersist()
    return [round(x, 6) for x in w], round(b, 6)


def quality_model_report(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    tau: float = 0.5,
) -> DataFrame:
    """Per-source scoring report with the FROZEN model: (source,
    n_docs, n_pos, mean_score_pos, mean_score_neg, n_above_tau,
    n_agree, agree_rate) — model score vs the rule-gate weak label it
    was trained against.  The pos/neg score split makes a degenerate
    constant predictor visible (the two means collapse)."""
    from .dedup import ensure_scan_parallelism

    # per-token md5 fold over a 2-row-group scan would run on 2 cores
    docs = ensure_scan_parallelism(docs)
    labeled = weak_quality_label(docs)
    score = hashed_bow_score(F.col("text"), weights, bias)
    scored = labeled.select(
        "source",
        "label",
        F.round(score, 6).alias("score"),
    ).withColumn("pred", (F.col("score") >= tau).cast("int"))
    pos, neg = F.col("label") == 1, F.col("label") == 0
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.round(F.avg(F.when(pos, F.col("score"))), 4).alias("mean_score_pos"),
        F.round(F.avg(F.when(neg, F.col("score"))), 4).alias("mean_score_neg"),
        F.sum("pred").cast("bigint").alias("n_above_tau"),
        F.sum((F.col("pred") == F.col("label")).cast("int"))
        .cast("bigint")
        .alias("n_agree"),
        F.round(
            F.avg((F.col("pred") == F.col("label")).cast("int")), 4
        ).alias("agree_rate"),
    )


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def quality_reliability_report(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram / calibration report for the frozen
    hashed-BoW quality model (the standard ECE binning of Guo et al.
    2017, "On Calibration of Modern Neural Networks"): bucket documents
    by predicted score into ``n_bins`` equal-width bins and compare the
    bin's mean confidence against its observed positive rate under the
    weak rule-gate label — the report a data pipeline consults before
    trusting model scores as sampling weights or thresholds (an
    uncalibrated gate silently shifts the corpus mix).

    Per bin: (bin, n_docs, n_pos, conf_ppm, acc_ppm, gap_ppm,
    ece_part_ppm_docs) where conf is the bin-mean score, acc the
    empirical positive rate, gap = |conf − acc|, and ece_part = gap·n
    so ECE = Σ ece_part / Σ n falls out of the rows by exact integer
    arithmetic.  The per-document score is rounded ONCE to integer
    parts-per-million; every aggregate after that is a bigint sum or
    integer DIV, so both engines agree bit-for-bit (binning runs on
    the SAME integer ppm score — no float boundary can flip a bin).

    Distributed shape at 10^12 documents: one row-local score
    projection (token fold over frozen broadcast-literal weights — the
    same expression the model gate itself runs) and ONE aggregation
    with ``n_bins`` groups, map-side combined.  No join, no window."""
    from .dedup import ensure_scan_parallelism

    docs = ensure_scan_parallelism(docs)
    labeled = weak_quality_label(docs)
    score_ppm = F.round(
        hashed_bow_score(F.col("text"), weights, bias) * 1_000_000.0, 0
    ).cast("bigint")
    binned = labeled.select(
        "label",
        score_ppm.alias("s_ppm"),
    ).select(
        "label",
        "s_ppm",
        F.least(
            F.expr(f"s_ppm * {n_bins} DIV 1000000"), F.lit(n_bins - 1)
        ).cast("int").alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("label").cast("bigint").alias("n_pos"),
            F.sum("s_ppm").alias("sum_ppm"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.expr("sum_ppm DIV n_docs").alias("conf_ppm"),
            F.expr("n_pos * 1000000 DIV n_docs").alias("acc_ppm"),
            F.abs(
                F.expr("sum_ppm DIV n_docs") - F.expr("n_pos * 1000000 DIV n_docs")
            ).alias("gap_ppm"),
            (
                F.abs(
                    F.expr("sum_ppm DIV n_docs")
                    - F.expr("n_pos * 1000000 DIV n_docs")
                )
                * F.col("n_docs")
            ).alias("ece_part_ppm_docs"),
        )
    )
