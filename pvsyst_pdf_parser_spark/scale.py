"""Scale machinery: bucketed sink, run manifest, resumable runs.

North-rule requirements at 10^12-document scale:

- **Partitioned sink**: results land bucketed by hash(url) so downstream
  per-url lookups and re-joins are partition-prunable.  On a real
  cluster this is an Iceberg table with ``bucket(N, url)`` partition
  transforms; :class:`ResultSink` dispatches to ``writeTo(...).append()``
  when a Spark catalog is configured for the target table and falls back
  to a parquet directory partitioned by a computed ``bucket`` column
  (identical pruning/resume semantics) in catalog-less environments
  like this sandbox.
- **Manifest / lineage**: every run appends per-bucket rows (run_id,
  bucket, url_count, ok/error counts, wall time) plus the quarantined
  error urls — errors are observable, never silently dropped.
- **Resume**: a restarted run left-anti joins the input against the
  union of urls recorded in the manifest AND urls present in the results
  sink.  The two appends (results, then manifest) are not atomic as a
  pair — a crash between them would leave results without manifest rows;
  deriving the completed set from the UNION means those urls are still
  excluded on resume, so no duplicate output rows can ever be appended.
- **Skew**: the decode stage offers size-aware packing — the largest
  documents are spread round-robin in size-rank order so no task
  carries two giants, the bulk stays uniform url-hash
  (io/pages.py ``pack_partitions_by_bytes``); completed-url exclusion
  keeps the same distribution on resume.
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


class ResultSink:
    """Results + manifest storage with Iceberg/parquet dispatch.

    ``table`` is a catalog-qualified base name (e.g.
    ``my_catalog.db.extractions``).  When the Spark session has a
    catalog implementation configured for it
    (``spark.sql.catalog.my_catalog = org.apache.iceberg.spark.SparkCatalog``
    plus warehouse/uri settings), results/manifests go to the Iceberg
    tables ``{table}_results`` / ``{table}_manifest_urls`` /
    ``{table}_manifest_buckets`` via the DataFrameWriterV2 API —
    snapshot-isolated appends, ``bucket(N, url)`` partitioning.
    Otherwise the same layout is realized under ``out_dir`` as parquet
    directories partitioned by a computed bucket column.
    """

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        table: str | None = None,
        n_buckets: int = N_BUCKETS_DEFAULT,
    ) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.table = table
        self.n_buckets = n_buckets
        self.mode = (
            "iceberg" if table and self._catalog_configured(spark, table) else "parquet"
        )

    @staticmethod
    def _catalog_configured(spark: SparkSession, table: str) -> bool:
        catalog = table.split(".", 1)[0]
        try:
            return bool(spark.conf.get(f"spark.sql.catalog.{catalog}"))
        except Exception:  # noqa: BLE001 - conf key absent
            return False

    # -- write ---------------------------------------------------------

    def _table_exists(self, name: str) -> bool:
        try:
            return bool(self.spark.catalog.tableExists(name))
        except Exception:  # noqa: BLE001 - catalog probe failure → treat as absent
            return False

    def _append(self, df: DataFrame, kind: str) -> None:
        if self.mode == "iceberg":
            name = f"{self.table}_{kind}"
            # Probe existence EXPLICITLY rather than catching append()
            # errors: a real append failure (schema drift, commit
            # conflict, auth) must surface as itself, not be masked by
            # a retried create() failing with 'table already exists'.
            if self._table_exists(name):
                df.writeTo(name).append()
            else:
                writer = df.writeTo(name).using("iceberg")
                if kind in ("results", "spans"):
                    # spans co-bucket with results: per-url review /
                    # audit joins between the two tables are
                    # storage-partitioned, no exchange on either side
                    writer = writer.partitionedBy(
                        F.bucket(self.n_buckets, F.col("url"))
                    )
                writer.create()
        else:
            with_bucket(df, self.n_buckets).write.mode("append").partitionBy(
                "bucket"
            ).parquet(f"{self.out_dir}/{kind}")

    def write_results(self, results: DataFrame) -> None:
        self._append(results, "results")

    def write_spans(self, spans: DataFrame) -> None:
        """North-rule span sink — (url, span_kind, name, midx, start,
        end, value), bucketed by hash(url) like results."""
        self._append(spans, "spans")

    def write_manifest(
        self,
        run_id: str,
        results: DataFrame,
        errors: DataFrame,
        wall_sec: float | None = None,
    ) -> None:
        """Per-bucket lineage rows + per-url completion + quarantined
        errors.  One write per table, no driver-side counts."""
        ok = results.select("url").withColumn("status", F.lit("ok"))
        per_url = ok.unionByName(errors.select("url", "status")).withColumn(
            "run_id", F.lit(run_id)
        )
        self._append(per_url.select("url", "status", "run_id"), "manifest_urls")

        agg = (
            with_bucket(per_url, self.n_buckets)
            .groupBy("bucket")
            .agg(
                F.count("*").alias("url_count"),
                F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
                F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias(
                    "n_error"
                ),
            )
            .withColumn("run_id", F.lit(run_id))
            .withColumn("wall_sec", F.lit(wall_sec).cast("double"))
            .withColumn("finished_at", F.current_timestamp())
        )
        if self.mode == "iceberg":
            self._append(agg, "manifest_buckets")
        else:
            # bucket is a data column here, not a partition key
            agg.write.mode("append").parquet(f"{self.out_dir}/manifest_buckets")

    # -- read ----------------------------------------------------------

    def _read_table(self, name: str) -> DataFrame:
        """Catalog read for the iceberg branch — kept as a one-line seam
        so tests can serve named tables from a double (the sandbox has
        no Iceberg runtime jar); the NAME construction stays in _read
        where the tests can catch a drifted ``{table}_{kind}``."""
        return self.spark.read.table(name)

    def _read(self, kind: str) -> DataFrame | None:
        try:
            if self.mode == "iceberg":
                return self._read_table(f"{self.table}_{kind}")
            return self.spark.read.parquet(f"{self.out_dir}/{kind}")
        except Exception:  # noqa: BLE001 - first run: nothing written yet
            return None

    def completed_urls(self) -> DataFrame | None:
        """urls already processed by any prior run (ok or quarantined).

        Union of manifest urls and urls present in the results sink —
        crash-safe: results written without a manifest row (crash
        between the two appends) still count as completed, so a resumed
        run cannot append duplicate output rows.
        """
        manifest = self._read("manifest_urls")
        results = self._read("results")
        parts = [df.select("url") for df in (manifest, results) if df is not None]
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    def run_stats(self, run_id: str) -> dict:
        """Aggregate stats for one run read back from the just-written
        per-bucket manifest (tiny aggregate scan — replaces the two full
        materialization passes a count()/count() pair would cost)."""
        buckets = self._read("manifest_buckets")
        if buckets is None:
            return {"n_results": 0, "n_errors": 0}
        row = (
            buckets.filter(F.col("run_id") == run_id)
            .agg(
                F.coalesce(F.sum("n_ok"), F.lit(0)).alias("n_ok"),
                F.coalesce(F.sum("n_error"), F.lit(0)).alias("n_error"),
            )
            .collect()[0]
        )
        return {"n_results": int(row["n_ok"]), "n_errors": int(row["n_error"])}


# -- legacy function façade (kept for callers/tests) -----------------------


def write_results(
    results: DataFrame, out_dir: str, n_buckets: int = N_BUCKETS_DEFAULT
) -> None:
    """Append results partitioned by url-hash bucket (parquet mode)."""
    ResultSink(results.sparkSession, out_dir, n_buckets=n_buckets).write_results(
        results
    )


def completed_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    return ResultSink(spark, out_dir).completed_urls()


def resumable_extract(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    num_partitions: int | None = None,
    n_buckets: int = N_BUCKETS_DEFAULT,
    table: str | None = None,
    pack_by_bytes: bool = False,
    with_spans: bool = False,
) -> dict:
    """Run the extraction pipeline, skipping urls completed by prior
    runs, appending results + manifest.  Returns run stats.
    ``pack_by_bytes`` enables size-aware decode packing (requires
    ``num_partitions``; see io/pages.py).

    ``with_spans`` also writes the north-rule span table: the spans are
    scanned inside the SAME extraction pass (pipeline with_spans=True
    rides the one doc_text projection) and exploded off the
    checkpointed results frame, so the second sink costs zero extra
    decode and zero extra exchange.  Write order is results → spans →
    manifest; the completed set stays manifest ∪ results, so a crash in
    the results↔spans window can only leave a SPAN GAP (urls with
    results but no spans), never duplicates — ``reconcile_spans``
    repairs the gap idempotently.  On a real Iceberg catalog the two
    appends belong in one multi-table transaction (or a WAP branch
    publish), which closes the window entirely."""
    from .io.pages import decode_pages_df
    from .pipeline import extract_decoded
    from .text.spans import explode_spans

    if run_id is None:
        run_id = f"run-{int(time.time())}"

    sink = ResultSink(spark, out_dir, table=table, n_buckets=n_buckets)
    done = sink.completed_urls()
    todo = pages
    if done is not None:
        todo = pages.join(done, "url", "left_anti")

    t0 = time.time()
    page_df = decode_pages_df(
        todo, num_partitions=num_partitions, pack_by_bytes=pack_by_bytes
    )
    errors = (
        page_df.filter(F.col("status") != "ok")
        .select("url", "status")
        .distinct()
    )
    results = extract_decoded(page_df, with_spans=with_spans)

    # Truncate lineage BEFORE writing: the plan contains an anti-join
    # that reads the results sink, so a recompute after the first append
    # would see this run's own output and produce an empty (or
    # duplicated) second action — the read-what-you-write hazard.
    # localCheckpoint materializes once and severs the lineage; on a
    # real cluster this is a reliable-storage checkpoint or an Iceberg
    # snapshot read.  (persist() alone is NOT enough: cache eviction or
    # a cache-lookup miss silently falls back to re-execution.)
    results = results.localCheckpoint()
    errors = errors.localCheckpoint()
    if with_spans:
        spans = explode_spans(results, F.col("field_spans"))
        sink.write_results(results.drop("field_spans"))
        sink.write_spans(spans)
    else:
        sink.write_results(results)
    sink.write_manifest(run_id, results, errors, wall_sec=time.time() - t0)
    stats = sink.run_stats(run_id)
    results.unpersist()
    errors.unpersist()
    return {
        "run_id": run_id,
        "n_results": stats["n_results"],
        "n_errors": stats["n_errors"],
        "wall_sec": round(time.time() - t0, 3),
    }


def reconcile_spans(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    table: str | None = None,
) -> dict:
    """Repair the span gap a crash between the results and spans
    appends can leave (urls with results but no spans).  Idempotent:
    gap urls come from an anti-join of the two sinks' url columns, the
    replacement spans are recomputed from the pages table for exactly
    those urls, so re-running after any crash converges with no
    duplicate span rows.  Both sides of the anti-join are single-column
    scans (column-pruned; on Iceberg, metadata-only url manifests)."""
    from .text.spans import extract_field_spans

    sink = ResultSink(spark, out_dir, table=table, n_buckets=n_buckets)
    results = sink._read("results")
    if results is None:
        return {"gap_urls": 0}
    gap = results.select("url").distinct()
    spans_existing = sink._read("spans")
    if spans_existing is not None:
        gap = gap.join(spans_existing.select("url").distinct(), "url", "left_anti")
    gap = gap.localCheckpoint()  # sever: the write below appends to a sink we read
    n_gap = gap.count()
    if n_gap == 0:
        return {"gap_urls": 0}
    spans = extract_field_spans(pages.join(gap, "url", "left_semi"))
    sink.write_spans(spans.localCheckpoint())
    return {"gap_urls": n_gap}


def compact_results(
    spark: SparkSession,
    out_dir: str,
    files_per_bucket: int = 1,
) -> dict:
    """Compact the parquet results sink: every resumable append adds a
    file set per bucket, so a long-lived sink accumulates small files
    until scan planning and open() overhead dominate readers.  Rewrites
    the results tree to ``files_per_bucket`` files per bucket partition
    with identical rows.

    The swap is rename-based (results → results.bak, staged → results,
    drop .bak) — crash-safe in the sense that either the old or the new
    tree is always recoverable, and resume correctness never depends on
    it (completed_urls unions the manifest).  On a real lakehouse this
    whole function is Iceberg's ``rewrite_data_files`` compaction
    action; the parquet form exists for the same catalog-less sandbox
    reason as the ResultSink fallback."""
    import glob
    import os
    import shutil

    results_dir = os.path.join(out_dir, "results")
    staged = results_dir + ".compacting"
    backup = results_dir + ".bak"
    df = spark.read.parquet(results_dir)
    n_before = len(glob.glob(os.path.join(results_dir, "*", "*.parquet")))
    (
        df.repartition(files_per_bucket, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staged)
    )
    n_rows_staged = spark.read.parquet(staged).count()
    n_rows_before = df.count()
    if n_rows_staged != n_rows_before:  # paranoia gate before the swap
        shutil.rmtree(staged)
        raise RuntimeError(
            f"compaction row mismatch: {n_rows_staged} != {n_rows_before}"
        )
    os.rename(results_dir, backup)
    os.rename(staged, results_dir)
    shutil.rmtree(backup)
    # Spark caches the file listing per path (shared InMemoryFileIndex);
    # without an explicit refresh, later reads of the sink resolve to
    # the pre-swap file names and fail with FILE_NOT_EXIST
    spark.catalog.refreshByPath(results_dir)
    n_after = len(glob.glob(os.path.join(results_dir, "*", "*.parquet")))
    return {"files_before": n_before, "files_after": n_after,
            "rows": n_rows_before}


def run_health(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-run health report off the bucket manifest — the query an
    operator runs after every crawl batch: docs completed, error count
    and rate, wall seconds, docs/sec, buckets touched.  Pure aggregate
    over the (tiny) manifest table; never touches the results data."""
    buckets = spark.read.parquet(f"{out_dir}/manifest_buckets")
    return (
        buckets.groupBy("run_id")
        .agg(
            F.sum("n_ok").alias("n_ok"),
            F.sum("n_error").alias("n_error"),
            F.countDistinct("bucket").alias("n_buckets"),
            F.max("wall_sec").alias("wall_sec"),
            F.max("finished_at").alias("finished_at"),
        )
        .withColumn(
            "error_rate",
            F.round(F.col("n_error") / (F.col("n_ok") + F.col("n_error")), 4),
        )
        .withColumn(
            "docs_per_sec",
            F.when(
                F.col("wall_sec") > 0, F.round(F.col("n_ok") / F.col("wall_sec"), 2)
            ),
        )
        .orderBy("finished_at")
    )


# ---------------------------------------------------------------------------
# bucketed co-located joins
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str = "doc_id",
    n_buckets: int = N_BUCKETS_DEFAULT,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a hash-bucketed, bucket-sorted table on
    ``key`` — the storage layout that makes every later equi-join or
    aggregation on that key EXCHANGE-FREE (Spark reads each bucket as
    a pre-partitioned, pre-sorted split; two tables with the same
    bucketing join with zero shuffle on either side).

    This is the 100 TB pattern for fact-to-fact joins that cannot
    broadcast: pay the shuffle ONCE at write time, amortize it over
    every downstream run (the same reasoning as the ResultSink's
    bucket(url) layout; tests/test_plans gates the exchange-free
    read-side join).  ``path`` makes the table external (data at the
    given location; only metadata enters the session catalog)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession, left_name: str, right_name: str, key: str = "doc_id"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With identical bucketing on both sides, the physical plan is a
    SortMergeJoin with NO Exchange on either input (and no per-task
    sort when the buckets are also sortBy'd on the key)."""
    return spark.table(left_name).join(spark.table(right_name), key)
