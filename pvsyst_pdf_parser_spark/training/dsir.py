"""Data selection via importance resampling (DSIR — Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"):
score every raw document by how much more likely its hashed-bigram
features are under a TARGET distribution than under the RAW corpus
distribution, then keep the documents whose importance weight says
"more target-like than average web text".

Public practice bootstraps the target set from a rule gate or a known
high-quality corpus; here the target is the documents that pass the
Gopher/C4 quality gate already shared by the cleaning funnel
(textstats.cleaning_gate_exprs), so DSIR composes with the existing
gates instead of inventing a parallel notion of quality.

Distributed shape at 10^12 documents:

- bigram construction is ROW-LOCAL (split + sequence/transform HOFs,
  no UDF); the ONE corpus-wide shuffle is the (doc_id, bucket)
  aggregation — same profile as exact token counting.
- the feature table is BOUNDED at ``n_buckets`` rows (hashed feature
  space, Xie 2023 §3.1) whatever the corpus size, so the log-ratio
  table re-enters the per-document side as a BROADCAST join
  (plan-gated in tests/test_plans.py) and the trillion-row side never
  shuffles a second time.
- importance weights are INTEGER micro-nats: the per-bucket log ratio
  is rounded once to 1e-6 nats and cast to bigint, so the per-document
  sum is exact integer arithmetic — order-free, spill-safe, and
  bit-identical between Spark and the DuckDB oracle (no float
  summation drift).
- selection is a THRESHOLD (weight > 0 ⇔ document looks more like the
  target than like raw web text), not a global top-k rank — no
  single-task row_number over the corpus.

Reference for parity: the reference repo has no data-selection stage;
this is part of the training-data layer mandated by the build brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .hashing import md5_56

N_BUCKETS = 128

# row-local hashed-bigram bucket list over a `text` column; the
# size<2 guard matters because sequence(1, 0) DESCENDS in Spark
_BIGRAM_BUCKETS = """
CASE WHEN size(__toks) < 2 THEN array()
     ELSE transform(sequence(1, size(__toks) - 1),
                    i -> cast(conv(substring(md5(concat(__toks[i-1], ' ',
                                                        __toks[i])), 1, 14),
                                   16, 10) as bigint) % {n_buckets})
END
"""


def dsir_importance_report(
    docs: DataFrame, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Per document: (doc_id, source, n_bigrams, weight_unats,
    selected) — the DSIR importance weight in integer micro-nats and
    the keep verdict.

    weight(d) = Σ_b count_d[b] · round(1e6 · ln(p_tgt[b] / p_raw[b]))
    with add-1 smoothing on both ``n_buckets``-bucket multinomials;
    ``selected`` = weight > 0.  Documents with no bigrams score 0 and
    are not selected.
    """
    toks = F.expr("filter(split(lower(text), ' ', -1), t -> t <> '')")
    from .dedup import ensure_scan_parallelism
    from .textstats import cleaning_gate_exprs

    _, pass_quality = cleaning_gate_exprs()
    base = ensure_scan_parallelism(docs).select(
        "doc_id",
        "source",
        toks.alias("__toks"),
        pass_quality.alias("is_target"),
    ).select(
        "doc_id",
        "source",
        "is_target",
        F.expr(_BIGRAM_BUCKETS.format(n_buckets=n_buckets)).alias("buckets"),
    )

    # the one corpus-wide shuffle: per-(doc, bucket) counts
    per_doc_bucket = (
        base.select(
            "doc_id", "source", "is_target",
            F.explode_outer("buckets").alias("bucket"),
        )
        .groupBy("doc_id", "source", "is_target", "bucket")
        .agg(F.count_if(F.col("bucket").isNotNull()).alias("cnt"))
    )

    # bounded feature table (<= n_buckets rows) -> smoothed log ratio
    feat = (
        per_doc_bucket.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.sum("cnt").alias("raw_cnt"),
            F.sum(F.col("cnt") * F.col("is_target")).alias("tgt_cnt"),
        )
    )
    totals = feat.agg(
        F.sum("raw_cnt").alias("raw_total"), F.sum("tgt_cnt").alias("tgt_total")
    )
    lr = feat.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            (
                F.log((F.col("tgt_cnt") + 1) / (F.col("tgt_total") + n_buckets))
                - F.log((F.col("raw_cnt") + 1) / (F.col("raw_total") + n_buckets))
            )
            * F.lit(1_000_000.0),
            0,
        )
        .cast("bigint")
        .alias("lr_unats"),
    )

    scored = (
        per_doc_bucket.join(F.broadcast(lr), "bucket", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.coalesce(
                F.sum(F.col("cnt") * F.col("lr_unats")), F.lit(0)
            )
            .cast("bigint")
            .alias("weight_unats"),
        )
    )
    return scored.select(
        "doc_id",
        "source",
        "n_bigrams",
        "weight_unats",
        (F.col("weight_unats") > 0).cast("int").alias("selected"),
    )
