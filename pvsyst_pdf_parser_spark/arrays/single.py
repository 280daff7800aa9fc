"""Single-configuration fallback (reference A12/A13, :888-1004).

For urls whose marker pages yielded zero valid Array# blocks, parse the
combined text for a single PV-array configuration and synthesize
INV01..INVnn / MPPT 1..k from the inverter-count line + an MPPT topology
heuristic on the global inverter equipment (SMA Core → 6×2, CHINT/CPS →
3×6, default → 1×strings, :787-817).

Pure column expressions; the anti-join against urls-with-arrays is the
only extra operator (broadcast-friendly: the exclusion set is tiny
relative to the page scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _x(col, pat: str, group: int = 1):
    return F.nullif(F.regexp_extract(col, pat, group), F.lit(""))


def single_config_fields(
    comb_df: DataFrame, equip_df: DataFrame, array_urls: DataFrame
) -> DataFrame:
    """Rows in the array_fields schema for single-config urls."""
    t = F.col("combined_text")

    cand = (
        comb_df.join(array_urls, "url", "left_anti")
        .join(
            equip_df.select("url", "inverter_manufacturer", "inverter_model"),
            "url",
            "left",
        )
        .withColumn("has_pvac", t.rlike(r"(?iU)PV Array Characteristics"))
        .withColumn(
            "n_modules",
            F.coalesce(
                _x(t, r"(?iU)Number of PV modules\s*(\d+)\s*units?"),
                _x(t, r"(?iU)Nb\.\s*of\s*modules\s*(\d+)\s*units?"),
            ).try_cast("int"),
        )
        .withColumn(
            "n_inverters",
            F.coalesce(
                _x(
                    t,
                    r"(?isU)Total\s+inverter\s+power.*?(?:Number of inverters|Nb\.\s*of\s*units).*?(\d+)",
                ),
                _x(t, r"(?iU)Number of inverters\s*(\d+)\s*units?"),
                _x(t, r"(?iU)Nb\.\s*of\s*units\s*(\d+)\s*units?"),
            ).try_cast("int"),
        )
        .withColumn(
            "strings",
            _x(
                t,
                r"(?iU)Modules\s*(\d+)\s*(?:string[s]?|Strings)\s*x\s*(\d+)\s*In\s*series",
                1,
            ).try_cast("int"),
        )
        .withColumn(
            "series",
            _x(
                t,
                r"(?iU)Modules\s*(\d+)\s*(?:string[s]?|Strings)\s*x\s*(\d+)\s*In\s*series",
                2,
            ).try_cast("int"),
        )
        .filter(
            F.col("has_pvac")
            & F.col("n_modules").isNotNull()
            & F.col("n_inverters").isNotNull()
            & F.col("strings").isNotNull()
        )
    )

    manu = F.lower(F.coalesce("inverter_manufacturer", F.lit("")))
    model = F.lower(F.coalesce("inverter_model", F.lit("")))
    is_sma = manu.contains("sma") & model.contains("core")
    is_chint = (
        manu.contains("chint")
        | manu.contains("cps")
        | model.contains("cps")
        | model.contains("chint")
    )

    cand = (
        cand.withColumn(
            "mppt_per_inv",
            F.when(is_sma, F.lit(6)).when(is_chint, F.lit(3)).otherwise(F.lit(1)),
        )
        .withColumn(
            "strings_per_mppt_max",
            F.when(is_sma, F.lit(2))
            .when(is_chint, F.lit(6))
            .otherwise(F.greatest(F.lit(1), F.col("strings"))),
        )
        .withColumn(
            "topology_source",
            F.when(is_sma, F.lit("SMA Core1 heuristic"))
            .when(is_chint, F.lit("CPS/CHINT heuristic"))
            .otherwise(F.lit("default")),
        )
        .withColumn(
            "spi_max",
            F.greatest(F.lit(1), F.col("mppt_per_inv") * F.col("strings_per_mppt_max")),
        )
        .withColumn(
            "inverters_required",
            F.floor(
                (F.col("strings") + F.col("spi_max") - 1) / F.col("spi_max")
            ).try_cast("int"),
        )
    )

    inverter_ids = F.expr(
        "CASE WHEN n_inverters >= 1 THEN "
        "transform(sequence(1, n_inverters), i -> format_string('INV%02d', i)) "
        "ELSE array() END"
    )
    mppt_ids = F.expr(
        "transform(sequence(1, mppt_per_inv), i -> concat('MPPT ', cast(i as string)))"
    )

    return cand.select(
        "url",
        F.lit(1).alias("rank"),
        F.lit("1").alias("array_id"),
        F.lit("PV Array Characteristics (single configuration)").alias("block_text"),
        F.lit(True).alias("is_single"),
        inverter_ids.alias("inverter_ids"),
        mppt_ids.alias("mppt_ids"),
        F.lit(None).try_cast("int").alias("mppt_total_endpoints"),
        F.lit(None).try_cast("int").alias("mppt_count"),
        F.lit(None).try_cast("double").alias("mppt_share_percent"),
        F.lit(None).try_cast("double").alias("inverter_unit_fraction"),
        F.lit(None).try_cast("int").alias("orientation_id"),
        F.col("n_modules").alias("number_of_modules"),
        F.lit(None).try_cast("double").alias("nominal_stc_kwp"),
        "strings",
        F.col("series").alias("modules_in_series"),
        _x(t, r"(?iU)Tilt/Azimuth\s*([-\d.]+)\s*/\s*([-\d.]+)\s*°", 1)
        .try_cast("double")
        .alias("tilt"),
        _x(t, r"(?iU)Tilt/Azimuth\s*([-\d.]+)\s*/\s*([-\d.]+)\s*°", 2)
        .try_cast("double")
        .alias("azimuth_pvsyst"),
        F.lit(None).try_cast("double").alias("u_mpp_v"),
        F.lit(None).try_cast("double").alias("i_mpp_a"),
        F.lit(None).try_cast("string").alias("inv_type_manufacturer"),
        F.lit(None).try_cast("string").alias("inv_type_model"),
        F.lit("Single configuration").alias("original_notation"),
        F.col("mppt_per_inv").alias("inferred_mppt_per_inverter"),
        F.col("strings_per_mppt_max").alias("inferred_strings_per_mppt_max"),
        F.col("topology_source").alias("inferred_topology_source"),
        F.col("n_inverters").alias("inferred_inverters_reported"),
        F.col("inverters_required").alias("inferred_inverters_required"),
        F.col("n_inverters").alias("inferred_inverters_used"),
    )
