"""Geometric layout engine gates (text/layout.py).

The strong gate renders REAL decoded fixture pages into word bounding
boxes (exact char-offset geometry, the information pdfplumber's word
extractor would emit for a fixed-width PDF page) and asserts:

1. the relational layout engine reconstructs every page's text
   byte-identically (modulo trailing whitespace, which word boxes
   cannot carry — pdfplumber's own extract_text has the same property);
2. feeding the reconstructed text through the ENTIRE extraction
   pipeline yields byte-identical extracted_json + report_text — i.e.
   the geometry pass composes with the §2 DAG without drift.

Plus handcrafted-geometry unit gates (y_tol line clustering, column
band detection, x-interval table alignment) and physical-plan gates
(zero Python UDFs, no cartesian products, bounded exchanges).
"""

from __future__ import annotations

import pvsyst_pdf_parser_spark.text.layout as L
from pyspark.sql import functions as F

LINE_H = 12.0


def _render_boxes(key: str, text: str):
    """Exact word-box rendering of fixed-width text: x0 = char offset
    (char_w=1), one line per 12 y-units. The inverse of the engine."""
    rows = []
    for i, line in enumerate(text.split("\n")):
        j = 0
        while j < len(line):
            if line[j] == " ":
                j += 1
                continue
            k = j
            while k < len(line) and line[k] != " ":
                k += 1
            rows.append(
                (
                    key,
                    line[j:k],
                    float(j),
                    float(k),
                    i * LINE_H,
                    i * LINE_H + 10.0,
                )
            )
            j = k
    return rows


def _normalize(text: str) -> str:
    """What word boxes can represent: no trailing ASCII spaces on a
    line, no trailing blank lines (a box ends at its last glyph; NBSP
    is a glyph, not a space — pdfplumber's word splitter agrees)."""
    return "\n".join(ln.rstrip(" ") for ln in text.split("\n")).rstrip("\n")


BOX_SCHEMA = "doc_id string, word string, x0 double, x1 double, top double, bottom double"


def test_roundtrip_real_pages_and_full_pipeline(spark, pages_parquet):
    from pvsyst_pdf_parser_spark.io.pages import decode_pages_df
    from pvsyst_pdf_parser_spark.pipeline import extract_decoded

    pages = spark.read.parquet(pages_parquet)
    page_df = decode_pages_df(pages, num_partitions=8)
    rows = page_df.collect()

    boxes = []
    expected = {}
    for r in rows:
        key = f"{r['url']}#{r['page_no']}"
        expected[key] = _normalize(r["full_text"])
        boxes.extend(_render_boxes(key, r["full_text"]))
    assert boxes, "fixture pages produced no word boxes"

    words = spark.createDataFrame(boxes, BOX_SCHEMA)
    recon = {
        r["doc_id"]: r["text"]
        for r in L.layout_extract(words).collect()
    }
    # 1. byte-identical reconstruction for every page that has words
    for key, exp in expected.items():
        got = recon.get(key, "")
        assert got == exp, f"layout round-trip drift on {key!r}"

    # 2. the reconstructed text drives the FULL extraction DAG to the
    # same bytes as the original decode
    rec_rows = [
        (r["url"], r["page_no"], recon.get(f"{r['url']}#{r['page_no']}", ""),
         r["kind"], r["status"])
        for r in rows
    ]
    page_df2 = spark.createDataFrame(
        rec_rows, "url string, page_no int, full_text string, kind string, status string"
    ).repartition(8, F.col("url"))
    base = {
        r["url"]: (r["extracted_json"], r["report_text"])
        for r in extract_decoded(page_df).collect()
    }
    redo = {
        r["url"]: (r["extracted_json"], r["report_text"])
        for r in extract_decoded(page_df2).collect()
    }
    assert redo == base


def test_cluster_lines_y_tolerance(spark):
    # jitter within y_tol merges; a gap beyond y_tol opens a new line
    words = spark.createDataFrame(
        [
            ("d", "a", 0.0, 1.0, 0.0, 10.0),
            ("d", "b", 5.0, 6.0, 2.5, 12.5),   # +2.5 <= y_tol: same line
            ("d", "c", 0.0, 1.0, 9.0, 19.0),   # +6.5 > y_tol: new line
            ("d", "e", 3.0, 4.0, 9.5, 19.5),   # +0.5: same line as c
        ],
        BOX_SCHEMA,
    )
    got = {
        (r["word"], r["line_id"])
        for r in L.cluster_lines(words, y_tol=3.0).collect()
    }
    assert got == {("a", 0), ("b", 0), ("c", 1), ("e", 1)}


def test_column_band_detection(spark):
    two_col = spark.createDataFrame(
        [
            ("d", "aa", 0.0, 2.0, 0.0, 10.0),
            ("d", "bb", 5.0, 7.0, 0.0, 10.0),
            ("d", "cc", 40.0, 42.0, 0.0, 10.0),   # gap 7..40 = 33
            ("d", "dd", 41.0, 43.0, 12.0, 22.0),  # overlaps right col
            ("one", "x", 0.0, 1.0, 0.0, 10.0),    # no interior gap
        ],
        BOX_SCHEMA,
    )
    by_key = {r["doc_id"]: r for r in L.column_band(two_col).collect()}
    d = by_key["d"]
    assert (d["band_x0"], d["band_x1"], d["band_w"]) == (7, 40, 33)
    assert (d["n_left"], d["n_right"]) == (2, 2)
    assert d["is_two_col"]
    one = by_key["one"]
    assert one["band_w"] == 0 and not one["is_two_col"]


def test_table_grid_x_alignment(spark):
    # x0 jitter <= x_tol folds into one column; beyond opens the next
    words = spark.createDataFrame(
        [
            ("d", "r0c0", 0.0, 4.0, 0.0, 10.0),
            ("d", "r0c1", 20.0, 24.0, 0.0, 10.0),
            ("d", "r1c0", 1.5, 5.5, 12.0, 22.0),   # 0 vs 1.5 <= 2: col 0
            ("d", "r1c1", 21.5, 25.5, 12.0, 22.0),  # 20 vs 21.5 <= 2: col 1
        ],
        BOX_SCHEMA,
    )
    g = L.table_grid(L.cluster_lines(words))
    got = {(r["line_id"], r["col_id"], r["cell"]) for r in g.collect()}
    assert got == {
        (0, 0, "r0c0"),
        (0, 1, "r0c1"),
        (1, 0, "r1c0"),
        (1, 1, "r1c1"),
    }


def test_synth_reports_consistent(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rec = L.layout_reconstruct_report(docs)
    col = L.layout_column_report(docs)
    grid = L.layout_grid_report(docs)
    n = docs.filter(F.col("text") != "").count()
    assert rec.count() == n
    # every synthesized doc with a right-half word detects the gutter
    wide = col.filter(F.col("n_right") > 0)
    assert wide.filter(~F.col("is_two_col")).count() == 0
    # the fixed-width grid never exceeds 8 columns
    assert grid.filter(F.col("n_cols") > L.WORDS_PER_LINE).count() == 0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_layout_plans_are_jvm_relational(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # exchange budgets: reconstruct = doc-key hash + presentation sort;
    # columns adds the broadcast best-band join + one agg re-exchange;
    # grid adds the (doc,x0) join sides + the countDistinct expand
    for df, budget in (
        (L.layout_reconstruct_report(docs), 2),
        (L.layout_column_report(docs), 4),
        (L.layout_grid_report(docs), 6),
    ):
        p = _plan(df)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        assert "CartesianProduct" not in p
        assert p.count("Exchange") <= budget, p
    # the per-doc best-band side is tiny: it must broadcast, not SMJ
    assert "BroadcastExchange" in _plan(L.layout_column_report(docs))
