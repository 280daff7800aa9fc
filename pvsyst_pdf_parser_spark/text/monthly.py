"""Monthly balance-table extraction (reference P7) — pure relational.

The reference scans every line: month-name prefix, ≥8 whitespace tokens,
numeric parts[1]; GlobHor = parts[1], E_Grid = parts[-2], commas
stripped (pvsyst_parser.py:1499-1551).  Here: posexplode(split(doc_text,
'\\n')) → filter → split → element_at — filter and projection stay in
whole-stage codegen; no UDF, no shuffle (line order key kept for the
dict-insertion-order replay in assembly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .uws import split_lines, split_ws, utrim

# (?U): Unicode \b so e.g. "Januaryé" is NOT a month row (Python parity);
# reference compiles the same pattern with Python-Unicode semantics.
MONTH_PREFIX = (
    r"(?U)^(January|February|March|April|May|June|July|August|September|October"
    r"|November|December)\b"
)


def monthly_rows(doc_df: DataFrame, text_col: str = "doc_text") -> DataFrame:
    """(url, line_seq, month, globhor, e_grid) — one row per accepted line."""
    lines = doc_df.select(
        "url", F.posexplode(split_lines(F.col(text_col))).alias("line_seq", "raw_line")
    ).withColumn("line", utrim("raw_line"))

    month = F.regexp_extract("line", MONTH_PREFIX, 1)
    parts = split_ws(F.col("line"))

    candidates = (
        lines.filter(month != "")
        .withColumn("month", month)
        .withColumn("parts", parts)
        .filter(F.size("parts") >= 8)
        # reference: re.match(r"[-\d.,]+$", parts[1])  (:1530)
        .filter(F.col("parts")[1].rlike(r"(?U)^[-\d.,]+$"))
        .withColumn(
            "globhor",
            F.regexp_replace(F.col("parts")[1], ",", "").try_cast("double"),
        )
        .withColumn(
            "e_grid",
            F.regexp_replace(
                F.element_at("parts", -2), ",", ""
            ).try_cast("double"),
        )
        # reference drops the row if either float() raises (:1536-1540)
        .filter(F.col("globhor").isNotNull() & F.col("e_grid").isNotNull())
        .select("url", "line_seq", "month", "globhor", "e_grid")
    )
    return candidates


def monthly_rows_inline(doc_text_col) -> "F.Column":
    """Fused P7: the month-row scan as array ops on doc_text — returns
    the per-url ordered array<struct<line_seq,month,globhor,e_grid>>
    directly (no explode/groupBy/join).  Same acceptance rules as
    ``monthly_rows`` (the relational analytics/demo form).

    Evaluation is staged so per-line work happens ONCE per line: a
    cheap anchored month-prefix filter first (fails fast on the ~99% of
    lines that aren't month rows), then one token split per surviving
    line materialized into the struct (higher-order-function lambdas
    evaluate per element — embedding ``split_ws`` in every predicate
    re-split each line ~6×, measured as a top-3 pipeline CPU item)."""
    lines = split_lines(doc_text_col)
    numbered = F.zip_with(
        lines,
        F.sequence(F.lit(0), F.greatest(F.size(lines) - 1, F.lit(0))),
        lambda l, i: F.struct(i.alias("line_seq"), utrim(l).alias("line")),
    )
    months_only = F.filter(
        numbered,
        lambda s: F.regexp_extract(s["line"], MONTH_PREFIX, 1) != "",
    )
    with_parts = F.transform(
        months_only,
        lambda s: F.struct(
            s["line_seq"].alias("line_seq"),
            F.regexp_extract(s["line"], MONTH_PREFIX, 1).alias("month"),
            split_ws(s["line"]).alias("parts"),
        ),
    )
    cand = F.filter(
        with_parts,
        lambda s: (F.size(s["parts"]) >= 8)
        & s["parts"][1].rlike(r"(?U)^[-\d.,]+$"),
    )
    rows = F.transform(
        cand,
        lambda s: F.struct(
            s["line_seq"].alias("line_seq"),
            s["month"].alias("month"),
            F.regexp_replace(s["parts"][1], ",", "")
            .try_cast("double")
            .alias("globhor"),
            F.regexp_replace(F.element_at(s["parts"], -2), ",", "")
            .try_cast("double")
            .alias("e_grid"),
        ),
    )
    return F.filter(
        rows, lambda s: s["globhor"].isNotNull() & s["e_grid"].isNotNull()
    )


def monthly_rows_agg(monthly_df: DataFrame) -> DataFrame:
    """Per-url ordered array of month rows (for the assembly join)."""
    return monthly_df.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.struct("line_seq", "month", "globhor", "e_grid"))
        ).alias("monthly_rows")
    )
