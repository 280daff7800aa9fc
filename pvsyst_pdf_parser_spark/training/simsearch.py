"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: broadcast the (small) query set against all
  candidates — the correctness baseline; JVM-side zip_with/aggregate,
  no Python in the loop
- LSH-bucketed variant: deterministic random-hyperplane signs → bucket
  key → search within bucket — the 10^12-scale path (bucket count grows
  with corpus, per-bucket work stays bounded)

Ranking keys are (round(cos, 3) DESC, cand_id) so float noise between
engines cannot reorder the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a, b):
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def brute_force_topk(emb: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Top-k cosine neighbors for vec_id < n_queries (broadcast join)."""
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cands = emb.select(F.col("vec_id").alias("cand_id"), "embedding")
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("q_emb"), F.col("embedding")), 3))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def plane_expr(dim: int, j: int):
    """Deterministic pseudo-random hyperplane j as an array<double> expr —
    identical formula in the DuckDB oracle."""
    return F.expr(
        f"transform(sequence(1, {dim}), "
        f"i -> cast(((i + 1) * ({j} + 3) * 2654435761 % 2000) as double) / 1000.0 - 1.0)"
    )


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


def lsh_topk(emb: DataFrame, n_queries: int = 5, k: int = 3, dim: int = 64) -> DataFrame:
    """ANN top-k restricted to same-bucket candidates (the scale path)."""
    buckets = lsh_bucket_ids(emb, dim)
    with_bucket = emb.join(buckets, "vec_id")
    queries = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    cands = with_bucket.select(
        F.col("vec_id").alias("cand_id"), "embedding", "bucket"
    )
    scored = (
        queries.join(cands, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("q_emb"), F.col("embedding")), 3))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )
