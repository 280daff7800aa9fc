"""SparkSession factory with scale-appropriate defaults.

Designed for a multi-executor cluster at 10^12-document scale; in this
sandbox it runs on local[N].  All settings are plain Spark SQL conf —
nothing proprietary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE on for runtime re-planning + skew-join splitting, but byte-based
    # partition coalescing OFF: extraction stages are CPU-bound Python/regex
    # work whose cost per row dwarfs its bytes — coalescing by size collapses
    # parallelism exactly where we need it (measured 3-10× slowdowns on
    # local[32]; see BENCH/BASELINE.md notes).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs / mapInPandas (the decode stage).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Large binary payloads: keep Arrow batches small enough to fit in
    # executor python-worker memory even with multi-MB PDFs per row.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    # The parquet vectorized reader reserves batch_size × row-width
    # CONTIGUOUS bytes per task; with ~20 KB binary payloads the 4096
    # default is ~80 MB/task → at 32 concurrent tasks the driver heap
    # OOMs (observed). 256 rows ≈ 5 MB/task keeps N-way parallel scans
    # of binary-heavy tables inside any sane heap.
    "spark.sql.parquet.columnarReaderBatchSize": "256",
    "spark.python.worker.faulthandler.enabled": "true",
    # Per-url dimension sides are tiny — broadcast aggressively.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Legacy cast semantics: malformed numerics → NULL (the reference
    # skips such rows via try/except — ANSI's throw-on-malformed would
    # fail whole jobs on adversarial web text). Extraction paths also use
    # try_cast so they stay safe under ANSI driver sessions.
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(
    app_name: str = "pvsyst-extract",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    under spark-submit on a real cluster leave it unset.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
