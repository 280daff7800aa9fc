"""Global equipment extraction (reference P1–P4) as column expressions.

Anchor ``\\bPV module\\b`` + 2200-char window, then per-label two-column
rows: module fields from the left column, inverter fields from the right
(pvsyst_parser.py:232-309).  Numeric normalization (W/kW/MW) happens in
the assembly layer with Python semantics (int(round()) banker's
rounding, :291-299); here we extract the raw strings — predicate-
pushdown-friendly, wholly inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .twocol import first_line_with, two_column_values
from .uws import utrim

_ANCHOR = r"(?isU)\bPV\s+module\b(.{0,2200})"


def with_equipment_columns(doc_df: DataFrame, text_col: str = "doc_text") -> DataFrame:
    """Add module_/inverter_ manufacturer, model, power_raw columns.

    Evaluation is STAGED through materialized intermediate columns
    (anchor block → per-label line → values): the value expressions
    reference the anchor window dozens of times across their CASE
    branches, and Catalyst's projection collapse would otherwise inline
    the full-document anchor regex into every reference — measured as
    the single largest CPU item of the whole pipeline (the (?s) window
    scan re-ran ~40× per doc).  CollapseProject keeps a non-cheap alias
    referenced more than once as its own projection step, so each stage
    here evaluates exactly once per document."""
    window = F.nullif(F.regexp_extract(F.col(text_col), _ANCHOR, 1), F.lit(""))
    block = F.when(window.isNotNull(), F.concat(F.lit("PV module\n"), window))

    staged = doc_df.withColumn("_eq_block", block)
    staged = staged.select(
        "*",
        first_line_with(F.col("_eq_block"), r"\bManufacturer\b").alias("_manu_line"),
        first_line_with(F.col("_eq_block"), r"\bModel\b").alias("_model_line"),
        first_line_with(F.col("_eq_block"), r"Unit\s+Nom\.?\s*Power").alias(
            "_power_line"
        ),
    )

    manu_line = F.col("_manu_line")
    model_line = F.col("_model_line")
    power_line = F.col("_power_line")

    m_manu, i_manu = two_column_values(manu_line, "Manufacturer")
    m_model, i_model = two_column_values(model_line, "Model")
    # label fallback: "Unit Nom. Power" then "Unit Nom Power" (:283-285)
    p_left1, p_right1 = two_column_values(power_line, "Unit Nom. Power")
    p_left2, p_right2 = two_column_values(power_line, "Unit Nom Power")
    fallback = p_left1.isNull() & p_right1.isNull()
    m_power = F.when(fallback, p_left2).otherwise(p_left1)
    i_power = F.when(fallback, p_right2).otherwise(p_right1)

    return (
        staged.withColumn("module_manufacturer", m_manu)
        .withColumn("module_model", m_model)
        .withColumn("module_power_raw", m_power)
        .withColumn("inverter_manufacturer", i_manu)
        .withColumn("inverter_model", i_model)
        .withColumn("inverter_power_raw", i_power)
        .drop("_eq_block", "_manu_line", "_model_line", "_power_line")
    )


def clean_power_kw(raw: F.Column) -> F.Column:
    """Analytics-mode power normalizer (reference P1, :38-56): numeric
    part; MW→×1000 kW; kW as-is; bare numbers unchanged (W)."""
    num = F.regexp_extract(F.lower(utrim(raw)), r"([0-9]*\.?[0-9]+)", 1).cast("double")
    low = F.lower(raw)
    return F.when(low.contains("mw"), num * 1000.0).otherwise(num)
