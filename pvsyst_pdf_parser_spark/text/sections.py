"""Section content slicing (reference C2) as a lead() window.

The reference sorts all (pos, name) section starts and slices
``all_text[start : next_start]`` (pvsyst_parser.py:152-173).  Here the
scan stage provides (name, pidx, midx, pos) rows; slicing is a window
``lead(pos)`` over (pos, pidx, midx) — pidx/midx reproduce Python's
stable sort tiebreak — with substring + trim.  One url-partitioned
window, no extra shuffle after the doc-frame aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def section_contents(doc_df: DataFrame) -> DataFrame:
    """(url, section, pidx, midx, pos, slice_seq, content) rows.

    ``slice_seq`` is the document-order index of the slice; the
    reference's ``section_contents[name]`` list order is slice_seq
    order within a name.
    """
    w = Window.partitionBy("url").orderBy("pos", "pidx", "midx")
    sec = (
        doc_df.select(
            "url",
            F.length("doc_text").alias("doc_len"),
            "doc_text",
            F.explode("sec_matches").alias("m"),
        )
        .select(
            "url",
            F.col("m.name").alias("section"),
            F.col("m.pidx").alias("pidx"),
            F.col("m.midx").alias("midx"),
            F.col("m.pos").alias("pos"),
            "doc_len",
            "doc_text",
        )
        .withColumn("end", F.coalesce(F.lead("pos").over(w), F.col("doc_len")))
        .withColumn("slice_seq", F.row_number().over(w))
        .withColumn(
            "content",
            F.regexp_replace(
                F.col("doc_text").substr(F.col("pos") + 1, F.col("end") - F.col("pos")),
                r"^\s+|\s+$",
                "",
            ),
        )
        .drop("doc_text", "doc_len", "end")
    )
    return sec


def per_url_section_columns(sections_df: DataFrame) -> DataFrame:
    """Aggregate the per-slice rows to one row per url with the pieces the
    pipeline consumes: distinct-section count, first Array Losses slice,
    Total Inverter Power content (slices joined with newline)."""
    return sections_df.groupBy("url").agg(
        F.countDistinct("section").alias("n_sections"),
        F.min_by(
            F.col("content"), F.when(F.col("section") == "Array Losses", F.col("slice_seq"))
        ).alias("losses_content"),
        F.concat_ws(
            "\n",
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("section") == "Total Inverter Power",
                        F.struct("slice_seq", "content"),
                    )
                )
            ).getField("content"),
        ).alias("tip_content"),
    )
