"""Combination unnest (reference A10, :463-501) — two-level lateral
explode: inverter_ids × (mppt_ids | synthesized from mppt_count | null).

combo_seq reconstructs the reference's list order (arrays in block
order, inverters outer, MPPTs inner) for the order-dependent consumers
(first-linked-type lookup, last-wins association overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expand_combinations(fields_df: DataFrame) -> DataFrame:
    """(url, combo_seq, array_id, inverter, mppt, original_notation)."""
    eff_mppts = F.when(F.size("mppt_ids") > 0, F.col("mppt_ids")).otherwise(
        F.when(
            F.col("mppt_count").isNotNull() & (F.col("mppt_count") > 0),
            F.expr(
                "transform(sequence(1, mppt_count), i -> concat('MPPT ', cast(i as string)))"
            ),
        )
    )

    inv_level = (
        fields_df.filter(F.size("inverter_ids") > 0)  # no inverters → no combos (:474)
        .select(
            "url",
            "rank",
            "array_id",
            "original_notation",
            eff_mppts.alias("eff_mppts"),
            F.posexplode("inverter_ids").alias("inv_pos", "inverter"),
        )
    )

    combos = inv_level.select(
        "url",
        "rank",
        "array_id",
        "original_notation",
        "inv_pos",
        "inverter",
        F.posexplode_outer("eff_mppts").alias("mppt_pos", "mppt"),
    )

    # combo_seq = dense document-order index via row_number over
    # (rank, inv_pos, mppt_pos) — immune to radix overflow when an
    # array expands to >1000 inverters/MPPTs (fixed-radix arithmetic
    # would collide and scramble the order-dependent consumers:
    # last-wins association overwrite, first-linked type lookup,
    # gap-fill tiebreak).  Window partitions on url → reuses the
    # url clustering, no extra shuffle.
    w = Window.partitionBy("url").orderBy(
        "rank", "inv_pos", F.coalesce(F.col("mppt_pos"), F.lit(0))
    )
    return combos.select(
        "url",
        F.row_number().over(w).cast("long").alias("combo_seq"),
        "array_id",
        "inverter",
        "mppt",
        "original_notation",
    )
