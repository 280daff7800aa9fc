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

from .uws import utrim


def with_section_columns(docs: DataFrame) -> DataFrame:
    """Fused C2: interval slicing as array ops on the scan matches — no
    explode/window/groupBy/join (the hot-path variant; the relational
    lead()-window decomposition below is the analytics/demo form).

    Adds ``n_sections`` (distinct matched names) and ``losses_content``
    (first Array Losses slice, stripped) to the doc frame.
    """
    from .uws import PY_WHITESPACE

    doc_text = F.col("doc_text")
    sorted_matches = F.array_sort(
        F.transform(
            F.col("sec_matches"),
            lambda s: F.struct(
                s["pos"].alias("pos"),
                s["pidx"].alias("pidx"),
                s["midx"].alias("midx"),
                s["name"].alias("name"),
            ),
        )
    )
    # stage the sorted match array as a real column so the three
    # consumers below reference it instead of re-sorting per column
    # (CollapseProject keeps multiply-referenced non-cheap aliases)
    docs = docs.withColumn("_sm", sorted_matches)
    sm = F.col("_sm")

    # Slice ONLY the sections the pipeline consumes (Array Losses, Total
    # Inverter Power) instead of materializing content for every match:
    # the substr + strip of multi-KB slices is the expensive part, and
    # the pipeline needs 1-3 slices of the ~dozen matches per doc.
    # ``i`` is the 1-based index into the sorted match array; the slice
    # runs [pos, next_pos) exactly like the reference (:152-173).
    def slice_at(i):
        start = F.element_at(sm, i)["pos"]
        end = F.coalesce(F.try_element_at(sm, i + 1)["pos"], F.length(doc_text))
        return F.btrim(
            doc_text.substr(start + 1, end - start), F.lit(PY_WHITESPACE)
        )

    def indices_of(name: str):
        # try_element_at: NULL (→ filtered out) past the end rather than
        # ARRAY_INDEX_OUT_OF_BOUNDS — the sequence over-covers by 1 when
        # sm is empty, and `&` does not short-circuit, so a plain
        # element_at would throw under an ANSI session
        return F.filter(
            F.sequence(F.lit(1), F.greatest(F.size(sm), F.lit(1))),
            lambda i: F.try_element_at(sm, i)["name"] == name,
        )

    n_sections = F.size(
        F.array_distinct(F.transform(F.col("sec_matches"), lambda s: s["name"]))
    )
    losses_content = F.try_element_at(
        F.transform(indices_of("Array Losses"), slice_at), F.lit(1)
    )
    # "Total Inverter Power" slices joined in document order — feeds the
    # A14 inverter-count validation metric (reference
    # _parse_total_inverter_power, :1006-1021; section absent → NULL)
    tip_idx = indices_of("Total Inverter Power")
    tip_content = F.when(
        F.size(tip_idx) > 0,
        F.concat_ws("\n", F.transform(tip_idx, slice_at)),
    )
    return (
        docs.withColumn("n_sections", n_sections)
        .withColumn("losses_content", losses_content)
        .withColumn("tip_content", tip_content)
        .drop("_sm")
    )


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
            utrim(
                F.col("doc_text").substr(F.col("pos") + 1, F.col("end") - F.col("pos"))
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
