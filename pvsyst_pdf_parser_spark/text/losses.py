"""Array-losses extraction (reference L1-L7) as native DataFrame ops.

The byte-identity pipeline parses losses inside the assembly UDF
(output/losses.py) because the final JSON needs Python dict-order
semantics.  This module is the *analytics* variant: the same semantics
decomposed into Spark primitives, yielding typed per-url columns —
useful when the downstream consumer wants loss fields as columns, not
JSON.

L1 (state-machine sub-sectionizer) becomes: explode lines → classify
marker lines (5 fixed patterns, first-match-wins order) → fill-forward
``last(marker)`` window = segment id — the same lead/last windowing as
the top-level sectionizer (C2).  L2-L7 are per-segment filters +
regexp_extract projections; the DC-wiring positional zip (L6) is
``regexp_extract_all`` ×3 + ``arrays_zip`` with the reference's
length-guard (pvsyst_parser.py:1334-1341), cross-captures and all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .uws import split_lines, split_ws, sql_ustrip, utrim

_MARKERS = [
    ("soiling_losses", r"(?i)Array Soiling Losses"),
    ("thermal_losses", r"(?i)Thermal Loss factor"),
    ("module_mismatch_losses", r"(?i)Module mismatch losses"),
    ("iam_losses", r"(?i)IAM loss factor"),
    ("ac_wiring_losses", r"(?i)AC wiring losses"),
]

_MONTHS3 = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
            "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _x(col, pat, group=1):
    return F.nullif(F.regexp_extract(col, pat, group), F.lit(""))


def loss_segments(losses_df: DataFrame) -> DataFrame:
    """(url, line_no, line, segment) — L1 as classify + fill-forward."""
    lines = (
        losses_df.select(
            "url", F.posexplode(split_lines("losses_content")).alias("line_no", "raw")
        )
        .withColumn("line", utrim("raw"))
        .filter(F.col("line") != "")
    )
    marker = F.lit(None).cast("string")
    for name, pat in reversed(_MARKERS):
        marker = F.when(F.col("line").rlike(pat), F.lit(name)).otherwise(marker)
    w = (
        Window.partitionBy("url")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lines.withColumn("marker", marker)
        .withColumn("segment", F.last("marker", ignorenulls=True).over(w))
        .select("url", "line_no", "line", "segment")
    )


def loss_columns(losses_df: DataFrame) -> DataFrame:
    """One row per url with typed loss columns (L2-L7)."""
    seg = loss_segments(losses_df)
    line = F.col("line")

    def seg_last(segment: str, cond, value):
        key = F.when((F.col("segment") == segment) & cond, F.col("line_no"))
        return F.max_by(value, key)

    soiling_avg = seg_last(
        "soiling_losses",
        line.contains("Average loss Fraction"),
        _x(line, r"(?U)Average loss Fraction\s+([\d.]+)%").cast("double"),
    )
    # last %-row with ≥12 tokens wins (reference overwrite loop, :1242-1261)
    pct_row = (
        (~line.contains("Average loss Fraction"))
        & line.rlike(r"(?U)\d+\.\d+%")
        & (F.size(split_ws(line)) >= 12)
    )
    soiling_monthly = seg_last(
        "soiling_losses",
        pct_row,
        F.map_from_arrays(
            F.array(*[F.lit(m) for m in _MONTHS3]),
            F.transform(
                F.slice(split_ws(line), 1, 12),
                lambda p: F.regexp_replace(p, "%+$", "").cast("double"),
            ),
        ),
    )

    thermal_lf = seg_last(
        "thermal_losses",
        line.contains("Loss Fraction") & ~line.contains("Module temperature"),
        _x(line, r"(?U)Loss Fraction\s+(-?[\d.]+)%").cast("double"),
    )
    uc = seg_last(
        "thermal_losses",
        ~(line.contains("Loss Fraction") & ~line.contains("Module temperature"))
        & line.contains("Uc (const)"),
        _x(line, r"(?U)Uc \(const\)\s+([\d.]+)").cast("double"),
    )
    uv = seg_last(
        "thermal_losses",
        ~(line.contains("Loss Fraction") & ~line.contains("Module temperature"))
        & ~line.contains("Uc (const)")
        & line.contains("Uv (wind)"),
        _x(line, r"(?U)Uv \(wind\)\s+([\d.]+)").cast("double"),
    )

    mismatch_lf = seg_last(
        "module_mismatch_losses",
        line.contains("Loss Fraction"),
        _x(line, r"(?U)Loss Fraction\s+([\d.]+)%").cast("double"),
    )

    # IAM: only lines before the first DC-wiring/Array# line of the segment
    w_url = Window.partitionBy("url")
    dc_break = F.min(
        F.when(
            (F.col("segment") == "iam_losses")
            & (line.contains("DC wiring losses") | line.contains("Array #")),
            F.col("line_no"),
        )
    ).over(w_url)
    seg2 = seg.withColumn("iam_break", dc_break).withColumn(
        "in_iam",
        (F.col("segment") == "iam_losses")
        & (F.col("iam_break").isNull() | (F.col("line_no") < F.col("iam_break"))),
    )

    incidence = F.max_by(
        F.when(
            F.col("in_iam") & line.contains("Incidence effect (IAM):"),
            utrim(_x(line, r"(?U)Incidence effect \(IAM\):\s+(.+)")),
        ),
        F.when(F.col("in_iam") & line.contains("Incidence effect (IAM):"), F.col("line_no")),
    )
    digit_row = (
        F.col("in_iam")
        & ~line.contains("Incidence effect (IAM):")
        & line.rlike(r"(?U)\d+\.\d+")
        & ~line.rlike(r"[°%]|mΩ")
        & ~F.exists(
            split_ws(line),
            lambda p: ~F.regexp_replace(F.regexp_replace(p, r"\.", ""), "-", "").rlike(
                r"(?U)^\d+$"  # str.isdigit() parity
            ),
        )
    )
    iam_profile = F.max_by(
        F.when(
            digit_row,
            F.map_from_arrays(
                F.slice(
                    F.array(*[F.lit(a) for a in [0, 20, 30, 40, 50, 60, 70, 80, 90]]),
                    1,
                    F.least(F.size(split_ws(line)), F.lit(9)),
                ),
                F.slice(
                    F.transform(
                        split_ws(line), lambda p: p.cast("double")
                    ),
                    1,
                    F.least(F.size(split_ws(line)), F.lit(9)),
                ),
            ),
        ),
        F.when(digit_row, F.col("line_no")),
    )

    ac_lf = seg_last(
        "ac_wiring_losses", line.contains("Loss Fraction"),
        _x(line, r"(?U)Loss Fraction\s+([\d.]+)%").cast("double"),
    )
    ac_v = seg_last(
        "ac_wiring_losses",
        ~line.contains("Loss Fraction") & line.contains("Inverter voltage"),
        _x(line, r"(?U)Inverter voltage\s+([\d.]+)Vac").cast("double"),
    )
    ac_wire = seg_last(
        "ac_wiring_losses",
        ~line.contains("Loss Fraction") & ~line.contains("Inverter voltage")
        & line.contains("Wire section"),
        utrim(_x(line, r"(?U)Wire section\s+(.+)")),
    )
    ac_len = seg_last(
        "ac_wiring_losses",
        ~line.contains("Loss Fraction") & ~line.contains("Inverter voltage")
        & ~line.contains("Wire section") & line.contains("Wires length"),
        _x(line, r"(?U)Wires length\s+([\d.]+)m").cast("double"),
    )

    per_url = seg2.groupBy("url").agg(
        soiling_avg.alias("soiling_avg_loss_pct"),
        soiling_monthly.alias("soiling_monthly_pct"),
        thermal_lf.alias("thermal_loss_pct"),
        uc.alias("thermal_uc_const"),
        uv.alias("thermal_uv_wind"),
        mismatch_lf.alias("mismatch_loss_pct"),
        incidence.alias("iam_incidence_effect"),
        iam_profile.alias("iam_profile"),
        ac_lf.alias("ac_loss_pct"),
        ac_v.alias("ac_inverter_vac"),
        ac_wire.alias("ac_wire_section"),
        ac_len.alias("ac_wires_length_m"),
    )

    # L6: DC wiring — whole content joined with spaces, positional zips
    full = losses_df.select(
        "url",
        F.concat_ws(" ", split_lines("losses_content")).alias("blob"),
    )
    blob = F.col("blob")
    notation_ids = F.expr(
        r"regexp_extract_all(blob, '(?U)Array #(\\d+)\\s*-\\s*(.+?)(?=Array #|\\s*Global|$)', 1)"
    )
    notation_txt = F.expr(
        r"transform(regexp_extract_all(blob, '(?U)Array #(\\d+)\\s*-\\s*(.+?)(?=Array #|\\s*Global|$)', 2),"
        f" x -> {sql_ustrip('x')})"
    )
    res_list = F.expr(r"regexp_extract_all(blob, '(?U)Global array res\\.\\s*([\\d.]+)mΩ', 1)")
    loss_list = F.expr(r"regexp_extract_all(blob, '(?U)Loss Fraction\\s+([\\d.]+)%', 1)")

    ok = (
        (F.size(notation_ids) > 0)
        & (F.size(res_list) >= F.size(notation_ids))
        & (F.size(loss_list) >= F.size(notation_ids))
    )
    dc_arrays = F.when(
        ok,
        F.expr(
            "zip_with("
            "  zip_with(nids, ntxt, (a, b) -> struct(a as nid, b as ntx)),"
            "  zip_with(slice(rlist, 1, size(nids)), slice(llist, 1, size(nids)),"
            "           (r, l) -> struct(r as res, l as lss)),"
            "  (n, v) -> struct(cast(n.nid as int) as config_id, n.ntx as notation, "
            "cast(v.res as double) as global_array_resistance_mohm, "
            "cast(v.lss as double) as loss_fraction_percent))"
        ),
    ).otherwise(F.expr("array()").cast(
        "array<struct<config_id:int,notation:string,"
        "global_array_resistance_mohm:double,loss_fraction_percent:double>>"
    ))

    dc = (
        full.withColumn("nids", notation_ids)
        .withColumn("ntxt", notation_txt)
        .withColumn("rlist", res_list)
        .withColumn("llist", loss_list)
        .select(
            "url",
            _x(blob, r"(?U)Global wiring resistance\s+([\d.]+)mΩ\s+Loss Fraction\s+([\d.]+)%", 1)
            .cast("double")
            .alias("dc_global_resistance_mohm"),
            _x(blob, r"(?U)Global wiring resistance\s+([\d.]+)mΩ\s+Loss Fraction\s+([\d.]+)%", 2)
            .cast("double")
            .alias("dc_global_loss_pct"),
            dc_arrays.alias("dc_per_array"),
        )
    )
    return per_url.join(dc, "url", "left")
