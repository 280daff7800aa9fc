"""Missing-MPPT gap-fill labeling (reference G1, :745-786) — native.

Per (url, inverter): combinations with mppt=NULL receive the smallest
positive MPPT numbers not already used by labeled combinations, in
(int(array_id), original_notation) order.  The reference does this with
a sequential while-loop; relationally it is a *gap-filling rank*:

  missing_k  ←  k-th smallest candidate number ∉ used

implemented as: explode a candidate sequence 1..(max_used + n_missing),
anti-filter numbers in the used set, rank both sides, equi-join on the
rank.  All windows/aggregations key on (url, inverter) ⊇ url, so the
url clustering is reused — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MPPT_NUM = r"(?i)^MPPT\s*(\d+)$"


def assign_missing_mppt_labels(combos_df: DataFrame) -> DataFrame:
    """combos (url, combo_seq, array_id, inverter, mppt, ...) →
    same schema with every NULL mppt labeled."""
    labeled = combos_df.filter(F.col("mppt").isNotNull())
    missing = combos_df.filter(F.col("mppt").isNull())

    used = (
        labeled.withColumn(
            "num",
            F.nullif(F.regexp_extract(F.trim("mppt"), _MPPT_NUM, 1), F.lit("")).cast(
                "int"
            ),
        )
        .filter(F.col("num").isNotNull())
        .groupBy("url", "inverter")
        .agg(F.collect_set("num").alias("used_nums"), F.max("num").alias("max_used"))
    )

    n_missing = missing.groupBy("url", "inverter").agg(
        F.count("*").alias("n_missing")
    )

    # candidate numbers 1..(max_used + n_missing), minus used, ranked
    slots = (
        n_missing.join(used, ["url", "inverter"], "left")
        .select(
            "url",
            "inverter",
            F.coalesce("used_nums", F.expr("cast(array() as array<int>)")).alias(
                "used_nums"
            ),
            F.explode(
                F.sequence(
                    F.lit(1), F.coalesce("max_used", F.lit(0)) + F.col("n_missing")
                )
            ).alias("num"),
        )
        .filter(~F.array_contains("used_nums", F.col("num")))
        .withColumn(
            "slot_rank",
            F.row_number().over(Window.partitionBy("url", "inverter").orderBy("num")),
        )
    )

    # reference sort: (int(array_id) else 0, original_notation), stable →
    # combo_seq tiebreak (:770-777)
    ranked_missing = missing.withColumn(
        "miss_rank",
        F.row_number().over(
            Window.partitionBy("url", "inverter").orderBy(
                F.coalesce(F.col("array_id").try_cast("int"), F.lit(0)),
                F.coalesce("original_notation", F.lit("")),
                "combo_seq",
            )
        ),
    )

    assigned = (
        ranked_missing.join(
            slots.withColumnRenamed("slot_rank", "miss_rank"),
            ["url", "inverter", "miss_rank"],
        )
        .withColumn("mppt", F.concat(F.lit("MPPT "), F.col("num").cast("string")))
        .select(*combos_df.columns)
    )

    return labeled.select(*combos_df.columns).unionByName(assigned)
