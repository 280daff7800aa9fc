"""Per-block field projection (reference A5, :567-688) — one projection
node of independent regexp_extract columns + range expansion, all in
whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.uws import split_lines, utrim
from .ranges import expand_inverter_spec, expand_mppt_spec


def _x(col, pat: str, group: int = 1):
    return F.nullif(F.regexp_extract(col, pat, group), F.lit(""))


def array_fields(blocks_df: DataFrame) -> DataFrame:
    """blocks (url, rank, array_id, body, pending_*) → typed field rows."""
    body = F.col("body")
    header = F.element_at(split_lines(body), 1)  # splitlines()[0] (:574)

    df = (
        blocks_df.withColumn("header_line", header)
        # INV spec: "INV ... MPPT" preferred (:579-582), else first token
        # after INV (:585-589)
        .withColumn(
            "inv_spec1", utrim(_x(F.col("header_line"), r"(?iU)INV\s+(.+?)\s+MPPT"))
        )
        .withColumn(
            "inv_spec2", utrim(_x(F.col("header_line"), r"(?iU)INV\s*(.+?)(?:\s+|$)"))
        )
        .withColumn("ids1", expand_inverter_spec("concat('INV ', coalesce(inv_spec1, ''))"))
        .withColumn("ids2", expand_inverter_spec("concat('INV ', coalesce(inv_spec2, ''))"))
        .withColumn(
            "inverter_ids",
            F.when(F.size("ids1") > 0, F.col("ids1")).otherwise(F.col("ids2")),
        )
        # MPPT header ids (:596-602)
        .withColumn(
            "mppt_spec", _x(F.col("header_line"), r"(?iU)MPPT[#\s]*([0-9,\-\s]+)")
        )
        .withColumn("mppt_ids", expand_mppt_spec("mppt_spec"))
    )

    n_inv = F.when(F.size("inverter_ids") > 0, F.size("inverter_ids")).otherwise(1)
    total_endpoints = _x(
        body,
        r"(?iU)Number of inverters\s*(\d+)\s*\*\s*MPPT\s*([\d.]+)%\s*([\d.]+)\s*unit",
        1,
    ).try_cast("int")

    df = (
        df.withColumn("mppt_total_endpoints", total_endpoints)
        .withColumn(
            "mppt_count",
            F.when(
                F.col("mppt_total_endpoints").isNotNull(),
                F.greatest(
                    F.lit(1),
                    (F.col("mppt_total_endpoints") / F.greatest(F.lit(1), n_inv)).try_cast(
                        "int"
                    ),
                ),
            ),
        )
        .withColumn(
            "mppt_share_percent",
            _x(
                body,
                r"(?iU)Number of inverters\s*(\d+)\s*\*\s*MPPT\s*([\d.]+)%\s*([\d.]+)\s*unit",
                2,
            ).try_cast("double"),
        )
        .withColumn(
            "inverter_unit_fraction",
            _x(
                body,
                r"(?iU)Number of inverters\s*(\d+)\s*\*\s*MPPT\s*([\d.]+)%\s*([\d.]+)\s*unit",
                3,
            ).try_cast("double"),
        )
        .withColumn(
            "orientation_id",
            _x(body, r"(?iU)Orientation\s*#?\s*(\d+)").try_cast("int"),
        )
        .withColumn(
            "number_of_modules",
            _x(body, r"(?iU)Number of PV modules\s*(\d+)units?").try_cast("int"),
        )
        .withColumn(
            "nominal_stc_kwp",
            _x(body, r"(?iU)Nominal\s*\(STC\)\s*([\d.]+)kWp").try_cast("double"),
        )
        .withColumn(
            "strings",
            _x(body, r"(?iU)Modules\s*(\d+)\s*string[s]?\s*x\s*(\d+)", 1).try_cast("int"),
        )
        .withColumn(
            "modules_in_series",
            _x(body, r"(?iU)Modules\s*(\d+)\s*string[s]?\s*x\s*(\d+)", 2).try_cast("int"),
        )
        .withColumn(
            "tilt",
            _x(body, r"(?iU)Tilt/Azimuth\s*([-\d.]+)\s*/\s*([-\d.]+)\s*°", 1).try_cast(
                "double"
            ),
        )
        .withColumn(
            "azimuth_pvsyst",
            _x(body, r"(?iU)Tilt/Azimuth\s*([-\d.]+)\s*/\s*([-\d.]+)\s*°", 2).try_cast(
                "double"
            ),
        )
        .withColumn("u_mpp_v", _x(body, r"(?iU)U mpp\s*([\d.]+)V").try_cast("double"))
        .withColumn("i_mpp_a", _x(body, r"(?iU)I mpp\s*([\d.]+)A").try_cast("double"))
        # propagated pending type applies only when the block itself binds
        # inverters (:1082-1086); blocks never parse their own type — the
        # embedded-equipment branch is unreachable post-A4-cut
        .withColumn(
            "inv_type_manufacturer",
            F.when(F.size("inverter_ids") > 0, F.col("pending_manufacturer")),
        )
        .withColumn(
            "inv_type_model",
            F.when(F.size("inverter_ids") > 0, F.col("pending_model")),
        )
    )

    return df.select(
        "url",
        "rank",
        "array_id",
        F.col("body").alias("block_text"),
        F.lit(False).alias("is_single"),
        "inverter_ids",
        F.when(F.size("mppt_ids") > 0, F.col("mppt_ids")).alias("mppt_ids"),
        "mppt_total_endpoints",
        "mppt_count",
        "mppt_share_percent",
        "inverter_unit_fraction",
        "orientation_id",
        "number_of_modules",
        "nominal_stc_kwp",
        "strings",
        "modules_in_series",
        "tilt",
        "azimuth_pvsyst",
        "u_mpp_v",
        "i_mpp_a",
        "inv_type_manufacturer",
        "inv_type_model",
        F.concat(F.lit("Array #"), F.col("array_id")).alias("original_notation"),
        F.lit(None).try_cast("int").alias("inferred_mppt_per_inverter"),
        F.lit(None).try_cast("int").alias("inferred_strings_per_mppt_max"),
        F.lit(None).try_cast("string").alias("inferred_topology_source"),
        F.lit(None).try_cast("int").alias("inferred_inverters_reported"),
        F.lit(None).try_cast("int").alias("inferred_inverters_required"),
        F.lit(None).try_cast("int").alias("inferred_inverters_used"),
    )
