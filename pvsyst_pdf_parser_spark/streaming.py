"""Structured Streaming ingest variant.

The reference is strictly batch, and the north rule's resumability is
implemented as batch manifests (scale.py).  This module adds the
continuous-ingest deployment shape for a crawl that keeps appending
pages: a file-source stream over the pages table directory, with the
SAME extraction pipeline applied per micro-batch via ``foreachBatch`` —
so each micro-batch inherits the bucketed sink + manifest lineage, and
checkpointing makes the stream itself exactly-once per file.

Why foreachBatch rather than a fully streaming plan: the extraction DAG
aggregates per url (complete documents arrive atomically as rows), so
no cross-batch state or watermarking is required — per-batch batch
semantics are exactly right, and every operator stays identical to the
batch path (no dual implementations to drift apart).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    num_partitions: int | None = None,
):
    """Start a streaming query: pages parquet dir → extraction → bucketed
    results + manifest per micro-batch.  Returns the StreamingQuery."""
    from .scale import resumable_extract

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        resumable_extract(
            batch_df.sparkSession,
            batch_df,
            out_dir,
            run_id=f"stream-batch-{batch_id:08d}",
            num_partitions=num_partitions,
        )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
