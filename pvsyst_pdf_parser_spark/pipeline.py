"""End-to-end extraction pipeline (reference query lifecycle, SURVEY §3.4).

    pages table ──mapInPandas decode (S1/S2)──▶ per-page rows
      ├─▶ doc frame (one groupBy on url — the only wide exchange of raw text)
      │     ├─ scan UDF: section/orientation match positions (C1)
      │     ├─ equipment projection (P1-P4)
      │     ├─ section slicing windows (C2) → losses/TIP content
      │     └─ monthly line explode→filter→project (P7)
      ├─▶ combined array text (A1) ─▶ block finditer (A2) ─▶ validity/
      │     dedupe/tail-split/pending windows (A3-A7) ─▶ field projection
      │     (A5/A6) + range expansion (A8/A9)
      │     └─ single-config fallback union (A12/A13)
      ├─▶ combination unnest (A10) ─▶ MPPT gap-fill (G1)
      └─▶ per-url joins ─▶ assembly UDF (O1-O7) ─▶ (url, extracted_json,
            report_text)

Every aggregation/window/join keys on url, so after the doc-frame
exchange Catalyst reuses the hash(url) clustering; AQE handles sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .arrays.blocks import array_blocks
from .arrays.expand import expand_combinations
from .arrays.fields import array_fields
from .arrays.mppt import assign_missing_mppt_labels
from .arrays.single import single_config_fields
from .io.pages import decode_pages_df, doc_frame
from .output.assemble import assemble_documents, assembly_frame
from .text.equipment import with_equipment_columns
from .text.monthly import monthly_rows_inline
from .text.scan import scan_positions
from .text.sections import with_section_columns

# reference :1557 — case-sensitive glued-units total
_TOTAL_MODULES_PAT = r"(?U)Nb\.\s*of\s*modules\s*(\d+)units?"


def extract_documents(
    pages_table: DataFrame,
    num_partitions: int | None = None,
    pack_by_bytes: bool = False,
    with_spans: bool = False,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → (url, kind, n_pages,
    extracted_json, report_text).  ``pack_by_bytes`` enables size-aware
    decode packing for byte-skewed corpora (io/pages.py).
    ``with_spans`` adds a ``field_spans`` array column (text/spans.py)
    scanned from the SAME doc_text pass the extractor already makes —
    the north-rule span sink costs zero extra decode/exchange."""
    page_df = decode_pages_df(
        pages_table, num_partitions=num_partitions, pack_by_bytes=pack_by_bytes
    )
    return extract_decoded(page_df, with_spans=with_spans)


def extract_decoded(page_df: DataFrame, with_spans: bool = False) -> DataFrame:
    """Decoded per-page rows → final per-url results (shared by the
    one-shot and resumable entry points).

    The DAG fans out from two frames (per-page rows, per-doc text) into
    ~6 branches (sections, monthly, equipment, blocks, single-config,
    assembly).  Without materialization Spark re-executes the decode +
    doc-text build once per branch — measured 5-10× wall-time
    amplification — so the fan-out roots are persisted MEMORY_AND_DISK
    (the reference's redundant all_text rebuild, pvsyst_parser.py:123
    etc., is the same bug in miniature).  On a cluster this is the
    standard cache-the-scan-once pattern; eviction spills to local disk.
    """
    from pyspark import StorageLevel

    docs = doc_frame(page_df)  # one groupBy: doc_text + fused A1 combined_text
    docs = docs.withColumn("scan", scan_positions("doc_text")).select(
        "*",
        F.col("scan.sections").alias("sec_matches"),
        F.col("scan.oris").alias("oris"),
        F.col("scan.tilts").alias("tilts"),
    ).drop("scan")
    docs = with_equipment_columns(docs)
    docs = docs.withColumn(
        "total_modules_line",
        F.nullif(F.regexp_extract("doc_text", _TOTAL_MODULES_PAT, 1), F.lit(""))
        .try_cast("int"),
    )
    docs = with_section_columns(docs)  # fused C2 (adds tip_content)
    # A14 metric input: inverter count from the Total Inverter Power
    # section (reference :1006-1021 — first pattern wins, else fallback)
    docs = docs.withColumn(
        "total_inverters_from_power_section",
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    "tip_content", r"(?iU)Number of inverters\s*(\d+)\s*units?", 1
                ),
                F.lit(""),
            ),
            F.nullif(
                F.regexp_extract(
                    "tip_content", r"(?iU)Nb\.\s*of\s*units\s*(\d+)\s*units?", 1
                ),
                F.lit(""),
            ),
        ).try_cast("int"),
    ).drop("tip_content")
    docs = docs.withColumn("monthly_rows", monthly_rows_inline(F.col("doc_text")))
    if with_spans:
        # span scan rides the same doc_text pass — doc_text is about to
        # be dropped, so this is the last (and only) place the anchors
        # can be located without a second decode of the raw corpus
        from .text.spans import scan_field_spans

        docs = docs.withColumn("field_spans", scan_field_spans(F.col("doc_text")))
    # every doc_text-derived column now exists — cache only the compact
    # extracted columns (doc_text would multiply cache size ~10×)
    docs = docs.drop("doc_text", "sec_matches").persist(StorageLevel.MEMORY_AND_DISK)

    comb = docs.filter(F.col("combined_text").isNotNull()).select(
        "url", "combined_text"
    )
    blocks = array_blocks(comb)
    fields = array_fields(blocks).persist(StorageLevel.MEMORY_AND_DISK)
    equip = docs.select("url", "inverter_manufacturer", "inverter_model")
    single = single_config_fields(comb, equip, fields.select("url").distinct())
    all_fields = fields.unionByName(single)

    combos = assign_missing_mppt_labels(expand_combinations(all_fields))

    doc_cols = docs.drop("combined_text")
    assembly = assembly_frame(doc_cols, all_fields, combos)

    # A14/P9 validation metrics (reference prints a WARNING at
    # :1121-1139; here the comparison is surfaced as columns OUTSIDE
    # extracted_json so the byte-identity gate is unaffected).
    # parsed_inverter_count is computed INSIDE the combos aggregation
    # the assembly already performs (assemble.py _combos_agg) — no
    # extra pass, no extra join.
    out = assemble_documents(
        assembly,
        extra_cols=[
            "total_inverters_from_power_section",
            "parsed_inverter_count",
            *(["field_spans"] if with_spans else []),
        ],
    )
    out = out.withColumn(
        "parsed_inverter_count",
        F.coalesce("parsed_inverter_count", F.lit(0)).cast("int"),
    )
    return out.withColumn(
        "inverter_count_mismatch",
        F.col("total_inverters_from_power_section").isNotNull()
        & (
            F.col("parsed_inverter_count")
            != F.col("total_inverters_from_power_section")
        ),
    )
