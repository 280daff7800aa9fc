"""Combination unnest (reference A10, :463-501) — two-level lateral
explode: inverter_ids × (mppt_ids | synthesized from mppt_count | null).

combo_seq reconstructs the reference's list order (arrays in block
order, inverters outer, MPPTs inner) for the order-dependent consumers
(first-linked-type lookup, last-wins association overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    # combo_seq encodes document order (rank, inv_pos, mppt_pos) as
    # fixed-radix arithmetic with 2^21 per level: collision-free up to
    # 2,097,152 blocks / inverters-per-array / MPPTs-per-inverter —
    # far beyond any expansion the range grammar can produce from a
    # real document (a narrow 1000-radix would collide at 'INV1-1500'
    # and scramble the order-dependent consumers: last-wins association
    # overwrite, first-linked type lookup, gap-fill tiebreak).  A
    # row_number window would be exact at any width but adds a per-url
    # sort to the hot path (measured ~2× on this operator); three
    # shifts/adds are free.
    return combos.select(
        "url",
        (
            F.shiftleft(F.col("rank").cast("long"), 42)
            + F.shiftleft(F.col("inv_pos").cast("long"), 21)
            + F.coalesce(F.col("mppt_pos"), F.lit(0))
        ).alias("combo_seq"),
        "array_id",
        "inverter",
        "mppt",
        "original_notation",
    )
