"""Scale-safe global ranking primitives.

An unpartitioned ``Window.orderBy(...)`` funnels its ENTIRE input
through one task — fine after an aggregation that bounds cardinality
(a handful of event types, P shard counters), fatal on a corpus- or
vocabulary-sized frame at 10^12 documents.  Two exact replacements
cover every global-order need the training operators have:

- :func:`topk_with_rank` — when only the top ``k`` ranked rows are
  kept.  ``orderBy().limit(k)`` plans as ``TakeOrderedAndProject``
  (per-partition top-k, then a bounded driver-side merge of
  partitions × k rows — distributed at any input size), and the rank
  window then runs over ≤ k rows.
- :func:`global_row_number` — when EVERY row needs its exact global
  rank.  Range-partition on the order keys (Spark's sampled range
  exchange — the same machinery a global sort uses), rank WITHIN each
  partition, then add per-partition offsets from a bounded
  (#partitions rows) count table joined back broadcast.  The classic
  zipWithIndex-over-a-sort pattern, expressed relationally.

Both require the order columns to define a TOTAL order (tie-broken —
every caller in this package tie-breaks on a key column); under a
total order the results are byte-identical to the single-task window
they replace, so no oracle changes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .cache import persist_tracked


def topk_with_rank(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rank_col: str,
    rank_type: str = "int",
) -> DataFrame:
    """Top-``k`` rows of ``df`` under ``order_cols`` with a 1-based
    ``rank_col`` — never a corpus-sized single-partition window.

    ``order_cols`` must be a total order; ``k`` must stay under
    ``spark.sql.execution.topKSortFallbackThreshold`` (default 10,000)
    for the ``TakeOrderedAndProject`` plan — every ranked operator
    here uses single- or double-digit k."""
    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)  # input bounded by k rows
    return top.withColumn(rank_col, F.row_number().over(w).cast(rank_type))


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus an exact 1-based global ``out_col`` rank under
    ``order_cols``, computed distributed: range exchange → local rank →
    bounded offset join.

    The range-partitioned frame is persisted (via the package's scoped
    cache — callers release with ``release_persisted()``): the count
    job and the rank job MUST observe the same sampled range
    boundaries, and offsets are only correct against the partitioning
    they were counted on."""
    parts = persist_tracked(df.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), *order_cols
    ).withColumn("_gpart", F.spark_partition_id()))
    counts = parts.groupBy("_gpart").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_gpart").rowsBetween(
        Window.unboundedPreceding, -1
    )  # bounded: one row per partition
    offsets = counts.select(
        "_gpart",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_local = Window.partitionBy("_gpart").orderBy(*order_cols)
    return (
        parts.withColumn("_lrank", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_gpart")
        .withColumn(
            out_col, (F.col("_off") + F.col("_lrank")).cast("bigint")
        )
        .drop("_gpart", "_lrank", "_off")
    )
