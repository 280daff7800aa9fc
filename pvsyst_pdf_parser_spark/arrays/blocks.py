"""Array block discovery (reference A1-A4, A7).

A1: page-level marker filter → contiguous [min,max] page span per url →
combined text (relational: filter + groupBy min/max + re-aggregate).
A2: block split via finditer (pandas UDF — Spark lacks match-position
regex) → explode.
A3: validity filter (native rlike).
first-wins dedupe per array_id (row_number window).
A4: trailing-equipment tail split (native suffix arithmetic).
A6: trailing inverter-type block parse (native two-column extraction).
A7: one-block-lag pending-type propagation (last ignorenulls window).

All windows partition on url → they reuse the url clustering, no extra
shuffle beyond the combined-text aggregation.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..text.twocol import first_line_with, second_column_value

# reference :1030-1036 — the five page markers
PAGE_MARKERS = (
    r"(?iU)PV Array Characteristics|Array\s*#?\s*\d+|Array Characteristics"
    r"|PV Modules|Module Configuration"
)

# reference :1051-1054
_BLOCK_RE = re.compile(
    r"(Array\s*#?\s*(\d+).*?)(?=Array\s*#?\s*\d+|AC wiring losses|Page \d+/\d+|$)",
    re.DOTALL | re.IGNORECASE,
)

_BLOCKS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("seq", T.IntegerType()),
            T.StructField("array_id", T.StringType()),
            T.StructField("raw_block", T.StringType()),
        ]
    )
)


@F.pandas_udf(_BLOCKS_SCHEMA)
def find_array_blocks(combined_text: pd.Series) -> pd.Series:
    out = []
    for text in combined_text:
        blocks = [
            (i, m.group(2), m.group(1))
            for i, m in enumerate(_BLOCK_RE.finditer(text or ""))
        ]
        out.append(blocks)
    return pd.Series(out)


def combined_array_text(page_df: DataFrame) -> DataFrame:
    """(url, combined_text) for urls with ≥1 marker page; text spans the
    contiguous [min,max] marker-page range (:1043-1049)."""
    ok = page_df.filter(F.col("status") == "ok")
    rng = (
        ok.filter(F.col("full_text").rlike(PAGE_MARKERS))
        .groupBy("url")
        .agg(F.min("page_no").alias("p0"), F.max("page_no").alias("p1"))
    )
    ordered = F.array_sort(F.collect_list(F.struct("page_no", "full_text")))
    return (
        ok.join(rng, "url")
        .filter((F.col("page_no") >= F.col("p0")) & (F.col("page_no") <= F.col("p1")))
        .groupBy("url")
        .agg(
            F.concat_ws("\n", F.transform(ordered, lambda s: s["full_text"])).alias(
                "combined_text"
            )
        )
    )


def _trailing_type_columns(df: DataFrame, tail_col: str) -> DataFrame:
    """A6: inverter fields from a trailing equipment block (:503-565).

    Locates the 'Inverter' line (exact stripped match preferred over
    substring) and reads Manufacturer/Model below it.  The reference's
    power extraction is a no-op — it re-escapes its own regex label
    (:558) so the two-column patterns can never match — replicated by
    simply not extracting power (see SURVEY.md §8 quirks).
    """
    tail = F.col(tail_col)
    # reference: re.fullmatch("Inverter", ln) over *stripped* lines —
    # \h = Unicode horizontal whitespace (NBSP & friends), Python-strip parity
    has_exact = tail.rlike(r"(?imU)^\h*Inverter\h*$")
    exact_rest = F.regexp_extract(
        tail, r"(?iU)(?:\A|\n)\h*Inverter\h*\r?\n([\s\S]*)", 1
    )
    exact_block = F.concat(F.lit("Inverter\n"), exact_rest)
    has_word = tail.rlike(r"(?iU)\bInverter\b")
    contain_block = F.regexp_extract(
        tail, r"(?iU)(?:\A|\n)([^\n]*\bInverter\b[\s\S]*)", 1
    )
    inv_block = F.when(has_exact, exact_block).otherwise(
        F.when(has_word, contain_block)
    )
    manu = second_column_value(
        first_line_with(inv_block, r"\bManufacturer\b"), "Manufacturer"
    )
    model = second_column_value(first_line_with(inv_block, r"\bModel\b"), "Model")
    return df.withColumn("te_manufacturer", manu).withColumn("te_model", model)


def array_blocks(comb_df: DataFrame) -> DataFrame:
    """(url, seq, rank, array_id, body, te_*, inv_type_*) — valid,
    deduped blocks with trailing-equipment split and pending-type
    propagation applied."""
    blocks = comb_df.select(
        "url", F.explode(find_array_blocks("combined_text")).alias("b")
    ).select("url", "b.seq", "b.array_id", "b.raw_block")

    valid = blocks.filter(
        F.col("raw_block").rlike(r"(?iU)Modules\s+\d+\s+(?:string|Strings)")
    )
    first_wins = Window.partitionBy("url", "array_id").orderBy("seq")
    deduped = (
        valid.withColumn("rn", F.row_number().over(first_wins))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # A4: cut the block at the first "\nPV module" (:1072-1078)
    tail = F.nullif(
        F.regexp_extract("raw_block", r"(?isU)(\nPV\s*module\b[\s\S]*)", 1), F.lit("")
    )
    with_tail = deduped.withColumn("tail", tail).withColumn(
        "body",
        F.when(
            F.col("tail").isNotNull(),
            F.regexp_replace(
                F.expr("substring(raw_block, 1, length(raw_block) - length(tail))"),
                r"(?U)\s+$",
                "",
            ),
        ).otherwise(F.col("raw_block")),
    )

    typed = _trailing_type_columns(with_tail, "tail")

    # A7: the type block trailing array k applies to arrays k+1.. until
    # replaced (:1058, :1082-1086, :1104-1107)
    te_struct = F.when(
        F.col("te_manufacturer").isNotNull() | F.col("te_model").isNotNull(),
        F.struct(
            F.col("te_manufacturer").alias("manufacturer"),
            F.col("te_model").alias("model"),
        ),
    )
    w_prev = (
        Window.partitionBy("url")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_rank = Window.partitionBy("url").orderBy("seq")
    return (
        typed.withColumn("te_struct", te_struct)
        .withColumn("pending", F.last("te_struct", ignorenulls=True).over(w_prev))
        .withColumn("rank", F.row_number().over(w_rank))
        .select(
            "url",
            "seq",
            "rank",
            "array_id",
            "body",
            F.col("pending.manufacturer").alias("pending_manufacturer"),
            F.col("pending.model").alias("pending_model"),
        )
    )
