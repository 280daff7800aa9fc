"""Scale machinery: bucketed sink, run manifest, resumable runs.

North-rule requirements at 10^12-document scale:

- **Partitioned sink**: results land bucketed by hash(url) so downstream
  per-url lookups and re-joins are partition-prunable.  On a real
  cluster this is an Iceberg table with ``bucket(N, url)``; the sandbox
  lacks Iceberg jars, so the same layout is realized as a parquet
  directory partitioned by a ``bucket`` column (identical semantics for
  pruning/resume; swap ``.writeTo(...).append()`` in ``write_results``
  when a catalog is configured).
- **Manifest / lineage**: every run appends per-bucket rows (run_id,
  bucket, url_count, ok/error counts, wall time) plus the quarantined
  error urls — errors are observable, never silently dropped.
- **Resume**: a restarted run left-anti joins the input against urls
  already recorded in the manifest for the same output, so crashed runs
  finish without duplicating work or output rows (per-partition
  checkpointing; join side is read back from the manifest table, not
  driver state).
- **Skew**: decode-stage salting is hash(url) based (io/pages.py);
  completed-url exclusion keeps the same distribution on resume.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 64


def with_bucket(df: DataFrame, n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def write_results(
    results: DataFrame, out_dir: str, n_buckets: int = N_BUCKETS_DEFAULT
) -> None:
    """Append results partitioned by url-hash bucket."""
    with_bucket(results, n_buckets).write.mode("append").partitionBy(
        "bucket"
    ).parquet(f"{out_dir}/results")


def write_manifest(
    spark: SparkSession,
    run_id: str,
    results: DataFrame,
    errors: DataFrame,
    out_dir: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    wall_sec: float | None = None,
) -> None:
    """Per-bucket lineage rows + per-url completion + quarantined errors."""
    ok = with_bucket(results.select("url"), n_buckets).withColumn(
        "status", F.lit("ok")
    )
    err = with_bucket(errors.select("url", "status"), n_buckets)
    per_url = ok.unionByName(err).withColumn("run_id", F.lit(run_id))
    per_url.write.mode("append").parquet(f"{out_dir}/manifest_urls")

    agg = (
        per_url.groupBy("bucket")
        .agg(
            F.count("*").alias("url_count"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("n_error"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_sec", F.lit(wall_sec).cast("double"))
        .withColumn("finished_at", F.current_timestamp())
    )
    agg.write.mode("append").parquet(f"{out_dir}/manifest_buckets")


def completed_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """urls already processed by any prior run (ok or quarantined)."""
    try:
        return spark.read.parquet(f"{out_dir}/manifest_urls").select("url").distinct()
    except Exception:  # noqa: BLE001 - first run: no manifest yet
        return None


def resumable_extract(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    num_partitions: int | None = None,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> dict:
    """Run the extraction pipeline, skipping urls completed by prior
    runs, appending results + manifest.  Returns run stats."""
    from .io.pages import decode_pages_df, doc_frame
    from .pipeline import extract_decoded

    if run_id is None:
        run_id = f"run-{int(time.time())}"

    done = completed_urls(spark, out_dir)
    todo = pages
    if done is not None:
        todo = pages.join(done, "url", "left_anti")

    t0 = time.time()
    page_df = decode_pages_df(todo, num_partitions=num_partitions)
    errors = (
        page_df.filter(F.col("status") != "ok")
        .select("url", "status")
        .distinct()
    )
    results = extract_decoded(page_df)

    results = results.persist()
    n_results = results.count()
    write_results(results, out_dir, n_buckets)
    errors = errors.persist()
    n_errors = errors.count()
    write_manifest(
        spark, run_id, results, errors, out_dir, n_buckets,
        wall_sec=time.time() - t0,
    )
    results.unpersist()
    errors.unpersist()
    return {
        "run_id": run_id,
        "n_results": n_results,
        "n_errors": n_errors,
        "wall_sec": round(time.time() - t0, 3),
    }
