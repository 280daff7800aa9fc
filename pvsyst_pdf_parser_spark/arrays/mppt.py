"""Missing-MPPT gap-fill labeling (reference G1, :745-786) — native.

Per (url, inverter): combinations with mppt=NULL receive the smallest
positive MPPT numbers not already used by labeled combinations, in
(int(array_id), original_notation) order.  The reference does this with
a sequential while-loop; relationally it is a *gap-filling rank*:

  missing_k  ←  k-th smallest candidate number ∉ used

implemented as: explode a candidate sequence 1..(n_missing + |used|),
anti-filter numbers in the used set, rank both sides, equi-join on the
rank.  The candidate bound is n_missing + |used| — NOT max(used): within
[1..n_missing+|used|] at least n_missing numbers are free, so the k-th
free slot (k ≤ n_missing) always lands inside the bound, and a single
adversarial doc labeling "MPPT 999999999" cannot blow the explode up
(the reference assigns labels in O(n_missing), :745-786 — same output).
All windows/aggregations key on (url, inverter) ⊇ url, so the url
clustering is reused — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..text.uws import utrim

_MPPT_NUM = r"(?iU)^MPPT\s*(\d+)$"


def assign_missing_mppt_labels(combos_df: DataFrame) -> DataFrame:
    """combos (url, combo_seq, array_id, inverter, mppt, ...) →
    same schema with every NULL mppt labeled."""
    labeled = combos_df.filter(F.col("mppt").isNotNull())
    missing = combos_df.filter(F.col("mppt").isNull())

    used = (
        labeled.withColumn(
            "num",
            F.nullif(F.regexp_extract(utrim("mppt"), _MPPT_NUM, 1), F.lit("")).cast(
                "int"
            ),
        )
        .filter(F.col("num").isNotNull())
        .groupBy("url", "inverter")
        .agg(F.collect_set("num").alias("used_nums"))
    )

    n_missing = missing.groupBy("url", "inverter").agg(
        F.count("*").alias("n_missing")
    )

    # candidate numbers 1..(n_missing + |used|), minus used, ranked —
    # bound independent of max(used) so huge labeled MPPT numbers can't
    # explode the sequence (see module docstring)
    slots = (
        n_missing.join(used, ["url", "inverter"], "left")
        .select(
            "url",
            "inverter",
            "n_missing",
            F.coalesce("used_nums", F.expr("cast(array() as array<int>)")).alias(
                "used_nums"
            ),
        )
        # size() must see the coalesced array: size(NULL) is -1, which
        # would turn the bound into n_missing-1 and make sequence()
        # count DOWN through 0
        .select(
            "url",
            "inverter",
            "used_nums",
            F.explode(
                F.sequence(F.lit(1), F.col("n_missing") + F.size("used_nums"))
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
