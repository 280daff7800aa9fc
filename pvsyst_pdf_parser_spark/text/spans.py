"""Structured field spans — the per-url (field, start, end, value)
records the north rule requires alongside the extracted text ("writes
per-url extracted text AND structured field spans back to Iceberg").

A span row pins WHERE in the reconstructed document text each
extraction anchor matched: section headers (reference C1 patterns,
pvsyst_parser.py:128-139), orientation/tilt anchors (:332, :336), and
scalar field matches (total modules, pipeline.py).  Downstream uses:
highlighting in review UIs, extraction audits (did the value come from
the section it should have?), and training-data provenance (span-level
labels over the raw text).

Shape: ONE vectorized Arrow pass per document (the same cost class as
text/scan.py — Spark has no regex-offset builtin), then a relational
explode.  The output is keyed by url, so it co-partitions with the
extracted-text results and writes through the same bucket(url) sink
(scale.ResultSink) with no extra exchange.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .scan import ORI_PATTERN, SECTION_PATTERNS, TILT_PATTERN

# scalar-field anchors: (name, pattern, value_group) — value_group 0
# keeps the whole match.  Patterns are Python-re (the scan runs inside
# the Arrow UDF): the pipeline's Java-regex (?U) flag is Python's
# default Unicode behavior, so it is omitted here.
FIELD_PATTERNS: list[tuple[str, str, int]] = [
    ("total_modules", r"Nb\.\s*of\s*modules\s*(\d+)units?", 1),
    ("pv_modules", r"(?i)Number of PV modules\s*(\d+)\s*units?", 1),
    ("total_inverters", r"(?i)Number of inverters\s*(\d+)\s*units?", 1),
    ("year_row", r"(?m)^Year\s+([\d.]+)\s", 1),
]

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("span_kind", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("midx", T.IntegerType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("value", T.StringType()),
        ]
    )
)


def _span_scanners():
    """Compiled (span_kind, name, regex, value_group) list — module-level
    so the golden generator (fixtures/refharness.py) walks the SAME
    anchor inventory single-process."""
    out = [
        ("section", name, re.compile(pat, re.IGNORECASE), 0)
        for name, pat in SECTION_PATTERNS
    ]
    out.append(("orientation", "orientation", re.compile(ORI_PATTERN, re.IGNORECASE), 1))
    out.append(("field", "tilt_azimuth", re.compile(TILT_PATTERN, re.IGNORECASE), 0))
    out.extend(
        ("field", name, re.compile(pat), grp) for name, pat, grp in FIELD_PATTERNS
    )
    return out


def spans_of_text(text: str) -> list[tuple[str, str, int, int, int, str]]:
    """Single-document span scan (plain Python) — the unit the Arrow
    UDF vectorizes, and the exact code path the fixture golden uses, so
    a Spark-vs-golden mismatch isolates the DISTRIBUTED plumbing
    (decode, doc-text assembly, explode, ordering), not regex drift."""
    rows = []
    for span_kind, name, rx, grp in _span_scanners():
        for midx, m in enumerate(rx.finditer(text or "")):
            rows.append(
                (span_kind, name, midx, m.start(), m.end(), m.group(grp))
            )
    return rows


@F.pandas_udf(SPAN_SCHEMA)
def scan_field_spans(doc_text: pd.Series) -> pd.Series:
    return doc_text.map(spans_of_text)


def explode_spans(df: DataFrame, spans_col) -> DataFrame:
    """(url, <span array col>) → one row per span.  ``spans_col`` is a
    Column (e.g. an already-computed ``field_spans`` column riding a
    checkpointed results frame — the resumable sink path — or the scan
    UDF applied to a text column)."""
    return df.select("url", F.explode(spans_col).alias("s")).select(
        "url",
        F.col("s.span_kind").alias("span_kind"),
        F.col("s.name").alias("name"),
        F.col("s.midx").alias("midx"),
        F.col("s.start").alias("start"),
        F.col("s.end").alias("end"),
        F.col("s.value").alias("value"),
    )


def field_spans(docs: DataFrame, text_col: str = "doc_text") -> DataFrame:
    """(url, span_kind, name, midx, start, end, value) rows for every
    anchor match in each document's text."""
    return explode_spans(docs, scan_field_spans(F.col(text_col)))


def extract_field_spans(pages_table: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → span rows: decode + the
    shared doc-text assembly (io/pages.doc_frame — same exchange the
    extraction pipeline reuses) + one Arrow span scan + explode."""
    from ..io.pages import decode_pages_df, doc_frame

    docs = doc_frame(decode_pages_df(pages_table), with_combined=False)
    return field_spans(docs)
