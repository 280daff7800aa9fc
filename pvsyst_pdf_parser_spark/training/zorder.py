"""Z-order (Morton-curve) data layout keys for the Iceberg write path.

The north rule's 10^12-document table is read by queries that filter
on MORE than one dimension (host/source for crawl slices, document
length for packing and quality cuts).  A single-column sort gives
min/max file-skipping on that column only; interleaving the bits of
two bucketized dimensions into one Morton key and range-splitting on
it — the same layout `OPTIMIZE ZORDER BY` applies in public Delta /
Iceberg practice — keeps EVERY file's bounding box tight in BOTH
dimensions, so a scan planner prunes files on either predicate.

Everything here is exact integer arithmetic (bucketize → bit
interleave → fixed-width range split), a pure projection plus one
bounded aggregate: at any corpus size the only shuffle is the
per-file stats fold, and in the real write path the key simply
becomes the ``sortWithinPartitions`` / ``write.sort-order`` column —
no extra pass at all.  The DuckDB oracle replays the identical bit
arithmetic, so the per-file bounding boxes are hash-compared
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_56

BITS = 8  # 8 bits per dimension -> 16-bit Morton key, 65536 cells


def morton_interleave(a: Column, b: Column, bits: int = BITS) -> Column:
    """16-bit Morton key from two ``bits``-wide integer columns: bit i
    of ``a`` lands at position 2i+1, bit i of ``b`` at 2i.  Built as a
    sum of masked shifts — plain 64-bit integer ops portable to any
    engine; no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftright(a, i).bitwiseAND(F.lit(1)).cast(
            "bigint"
        ) * F.lit(1 << (2 * i + 1))
        z = z + F.shiftright(b, i).bitwiseAND(F.lit(1)).cast(
            "bigint"
        ) * F.lit(1 << (2 * i))
    return z


def zorder_file_stats(docs: DataFrame, n_files: int = 16) -> DataFrame:
    """Per-output-file bounding-box report for a z-ordered layout of
    the documents table over (source-hash, length-bucket):

    - dim a = md5_56(source) % 256 — the host/source axis (hashed, the
      same bucket family the url-partitioned writer uses),
    - dim b = min(255, n_chars // 64) — the document-length axis,
    - z    = morton_interleave(a, b),
    - file = z // (65536 // n_files) — fixed-width range split of the
      Morton key (the write task / file boundary).

    Returns one row per file: (file_id, n_docs, a_min, a_max, b_min,
    b_max, z_min, z_max) ordered by file_id — the min/max column
    stats a scan planner would consult, demonstrating that BOTH
    dimensions stay tight per file.  Plan: pure projection + one
    groupBy over ≤ n_files groups."""
    a = (md5_56(F.col("source").cast("string")) % 256).cast("bigint")
    b = F.least(
        F.lit(255).cast("bigint"), (F.col("n_chars") / 64).cast("bigint")
    )
    cell = (1 << (2 * BITS)) // n_files
    keyed = docs.select(
        a.alias("a"), b.alias("b"), morton_interleave(a, b).alias("z")
    ).withColumn("file_id", (F.col("z") / cell).cast("bigint"))
    return (
        keyed.groupBy("file_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
        .orderBy("file_id")
    )
