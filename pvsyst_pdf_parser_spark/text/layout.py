"""Geometric layout engine: word bounding boxes -> lines -> columns ->
tables -> reconstructed text.

The north star calls for "word-bounding-box line clustering and column
detection, table reconstruction via y-coordinate grouping and
x-interval alignment" — the work pdfplumber performs inside
``page.extract_text()`` (the reference consumes only its output,
/root/reference/pvsyst_parser.py:89-111).  This module implements that
geometry pass NATIVELY as relational Spark plans: every stage is a
window + groupBy over rows of ``(key, word, x0, x1, top, bottom)``,
zero UDFs, so the whole engine stays inside whole-stage codegen and
partitions by document key (one exchange, reused by every stage).

Stages (all public, composable):

- :func:`cluster_lines` — y-coordinate grouping: sort words by top and
  open a new line when the vertical gap exceeds ``y_tol`` (a lag +
  running-sum window, the standard relational segmentation idiom).
- :func:`lines_to_text` — per line, order words by x0 and materialize
  inter-word spacing from the actual x gaps (``round(gap / char_w)``
  spaces), so fixed-width table padding survives; per document, order
  lines by y and materialize blank lines from the y gaps.  With exact
  box positions the round trip is byte-identical
  (tests/test_layout.py reconstructs rendered PVsyst pages and runs
  the full extraction pipeline on the result).
- :func:`column_band` — column detection: the widest vertical band
  intersecting no word.  Computed on the x-interval union via a
  running ``max(x1)`` window over per-x0-deduped intervals (ties in
  x0 collapse first so the scan is deterministic under any input
  order).
- :func:`table_grid` — x-interval alignment: cluster the distinct x0
  values of a document with the same gap-segmentation idiom on the x
  axis; (line, x-cluster) is the reconstructed table cell.

Scale: everything shuffles once on the document key; per-document
window state is bounded by words-per-document (crawl pages are KBs,
not GBs), so a 10^12-page corpus runs as an embarrassingly parallel
per-key pass with no hot keys (url-keyed).

The demo queries synthesize boxes relationally from ``documents.text``
(:func:`synth_word_boxes`: 8 fixed-width slots per line, a 24-unit
column gutter before slot 4) so the DuckDB oracle can replay the
identical synth + engine spec in SQL; all emitted geometry is
integral, so cross-engine hashes compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Demo-synth geometry (mirrored in __spark_entry__.py oracle SQL).
SLOT_W = 16          # fixed cell width in char units
GUTTER = 24          # extra gap before slot 4 -> a guaranteed column band
WORDS_PER_LINE = 8
MAX_WLEN = 12        # truncate words so a cell never overflows its slot
LINE_H = 12.0
MIN_BAND_W = 20.0    # > max intra-slot gap (15), < min gutter gap (28)


def synth_word_boxes(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic text -> word-bounding-box synth (relational).

    Lays ``text``'s words into a fixed-width table: 8 slots per line,
    ``SLOT_W`` chars per slot, a ``GUTTER`` shift for slots 4-7.  All
    positions are integral doubles, so Spark and the DuckDB oracle
    agree bit-exactly.
    """
    from ..training.dedup import ensure_scan_parallelism

    # the explode + downstream doc-keyed windows inherit the scan's
    # split count; a degenerate two-split scan would run the whole box
    # synthesis on two cores (r6 dispatch — no-op at real split counts)
    toks = ensure_scan_parallelism(docs, key=key).select(
        key, F.posexplode(F.split("text", " ", -1)).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    w = Window.partitionBy(key).orderBy("pos")
    idx = (F.row_number().over(w) - 1).alias("idx")
    t = toks.select(key, idx, F.substring("tok", 1, MAX_WLEN).alias("word"))
    slot = (F.col("idx") % WORDS_PER_LINE).cast("int")
    x0 = (
        slot * SLOT_W
        + F.when(slot >= WORDS_PER_LINE // 2, F.lit(GUTTER)).otherwise(0)
    ).cast("double")
    top = (F.floor(F.col("idx") / WORDS_PER_LINE) * LINE_H).cast("double")
    return t.select(
        key,
        "word",
        x0.alias("x0"),
        (x0 + F.length("word")).alias("x1"),
        top.alias("top"),
        (top + 10.0).alias("bottom"),
    )


def cluster_lines(
    words: DataFrame, y_tol: float = 3.0, key: str = "doc_id"
) -> DataFrame:
    """y-coordinate grouping: add ``line_id`` (0-based per key).

    A new line opens when a word's top sits more than ``y_tol`` below
    the previous word's top in (top, x0) order — pdfplumber's
    y_tolerance clustering as a lag window + running sum.
    """
    w = Window.partitionBy(key).orderBy("top", "x0", "x1", "word")
    brk = F.when(
        F.col("top") - F.lag("top").over(w) > y_tol, 1
    ).otherwise(0)
    run = Window.partitionBy(key).orderBy("top", "x0", "x1", "word").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return words.withColumn(
        "line_id", (F.sum(brk).over(run) - 0).cast("int")
    )


def lines_to_text(
    words_lines: DataFrame,
    char_w: float = 1.0,
    line_h: float = LINE_H,
    key: str = "doc_id",
) -> DataFrame:
    """Reconstruct ``(key, text, n_lines, n_words)`` from lined boxes.

    Inter-word spacing = ``round(x gap / char_w)`` spaces (min 1, so
    distinct boxes never merge); leading indent = ``round(x0/char_w)``;
    blank lines = y gaps of multiple ``line_h``.  Exact positions ->
    byte-identical round trip, including fixed-width table padding.
    """
    wl = Window.partitionBy(key, "line_id").orderBy("x0", "x1", "word")
    prev_x1 = F.lag("x1").over(wl)
    nsp = F.when(
        prev_x1.isNull(),
        F.greatest(F.lit(0), F.round(F.col("x0") / char_w).cast("int")),
    ).otherwise(
        F.greatest(
            F.lit(1), F.round((F.col("x0") - prev_x1) / char_w).cast("int")
        )
    )
    toks = words_lines.withColumn("nsp", nsp).withColumn(
        "tok", F.concat(F.expr("repeat(' ', nsp)"), F.col("word"))
    )
    lines = (
        toks.groupBy(key, "line_id")
        .agg(
            F.min("top").alias("y"),
            F.count("*").alias("n_words"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("x0", "x1", "word", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                "",
            ).alias("line_str"),
        )
    )
    wp = Window.partitionBy(key).orderBy("y")
    prev_y = F.lag("y").over(wp)
    nsep = F.when(
        prev_y.isNull(),
        F.greatest(F.lit(0), F.round(F.col("y") / line_h).cast("int")),
    ).otherwise(
        F.greatest(F.lit(1), F.round((F.col("y") - prev_y) / line_h).cast("int"))
    )
    lined = lines.withColumn("nsep", nsep).withColumn(
        "ltok", F.concat(F.expr("repeat('\n', nsep)"), F.col("line_str"))
    )
    return (
        lined.groupBy(key)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("y", "ltok"))),
                    lambda s: s["ltok"],
                ),
                "",
            ).alias("text"),
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("n_words").cast("bigint").alias("n_words"),
        )
    )


def layout_extract(
    words: DataFrame,
    y_tol: float = 3.0,
    char_w: float = 1.0,
    line_h: float = LINE_H,
    key: str = "doc_id",
) -> DataFrame:
    """boxes -> text: the full geometry pass (lines + spacing)."""
    return lines_to_text(
        cluster_lines(words, y_tol=y_tol, key=key),
        char_w=char_w,
        line_h=line_h,
        key=key,
    )


def column_band(
    words: DataFrame, min_w: float = MIN_BAND_W, key: str = "doc_id"
) -> DataFrame:
    """Column detection: the widest interior vertical band hitting no
    word.  ``(key, band_x0, band_x1, band_w, n_left, n_right,
    is_two_col)``; docs with no interior gap report a zero band.

    The x-interval union is scanned with a running max(x1) over
    per-x0-deduped intervals — deterministic (x0 is unique after the
    dedupe) and one window pass, never an interval self-join.
    """
    xs = words.groupBy(key, "x0").agg(F.max("x1").alias("x1"))
    wx = Window.partitionBy(key).orderBy("x0")
    runmax = F.max("x1").over(
        Window.partitionBy(key)
        .orderBy("x0")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gaps = xs.select(
        key,
        runmax.alias("gx0"),
        F.col("x0").alias("gx1"),
    ).filter(F.col("gx0").isNotNull() & (F.col("gx1") > F.col("gx0")))
    best = (
        gaps.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(
                    (F.col("gx1") - F.col("gx0")).desc(), "gx0", "gx1"
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(key, "gx0", "gx1")
    )
    sides = (
        words.join(best, key, "left")
        .groupBy(key)
        .agg(
            F.max("gx0").alias("gx0"),
            F.max("gx1").alias("gx1"),
            F.sum(
                F.when(F.col("x1") <= F.col("gx0"), 1).otherwise(0)
            ).cast("bigint").alias("n_left"),
            F.sum(
                F.when(F.col("x0") >= F.col("gx1"), 1).otherwise(0)
            ).cast("bigint").alias("n_right"),
        )
    )
    band_w = F.coalesce(F.col("gx1") - F.col("gx0"), F.lit(0.0))
    return sides.select(
        key,
        F.coalesce("gx0", F.lit(0.0)).cast("int").alias("band_x0"),
        F.coalesce("gx1", F.lit(0.0)).cast("int").alias("band_x1"),
        band_w.cast("int").alias("band_w"),
        "n_left",
        "n_right",
        (band_w >= min_w).alias("is_two_col"),
    )


def table_grid(
    words_lines: DataFrame, x_tol: float = 2.0, key: str = "doc_id"
) -> DataFrame:
    """x-interval alignment: cluster distinct x0 starts into table
    columns (same gap-segmentation idiom as :func:`cluster_lines`, on
    the x axis) and emit ``(key, line_id, col_id, x0, cell)``.

    The break-sum window runs directly over the WORD rows (not a
    distinct-x0 frame joined back): rows tied on x0 have zero gap, so
    each distinct x0 group fires its break exactly once whatever the
    tie order, and the running sum assigns every member of the group
    the same col_id the distinct+join form produced — while staying on
    the key partitioning the line stage already established (no
    distinct exchange, no (key, x0) join exchange)."""
    run = Window.partitionBy(key).orderBy("x0").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    brk = F.when(
        F.col("x0") - F.lag("x0").over(Window.partitionBy(key).orderBy("x0"))
        > x_tol,
        1,
    ).otherwise(0)
    return words_lines.withColumn(
        "col_id", F.sum(brk).over(run).cast("int")
    ).select(
        key, "line_id", "col_id", "x0", F.col("word").alias("cell")
    )


# ---------------------------------------------------------------- demos


def layout_reconstruct_report(docs: DataFrame) -> DataFrame:
    """Per doc: synth boxes -> layout engine -> md5 of the
    reconstructed fixed-width text (oracle replays the same spec)."""
    out = layout_extract(synth_word_boxes(docs))
    return out.select(
        "doc_id", "n_lines", "n_words", F.md5("text").alias("text_md5")
    ).orderBy("doc_id")


def layout_column_report(docs: DataFrame) -> DataFrame:
    """Per doc: detected column band over the synthesized boxes — the
    gutter before slot 4 must be found whenever the doc has a right-
    half word; short docs report is_two_col = false."""
    return column_band(synth_word_boxes(docs)).orderBy("doc_id")


def layout_grid_report(docs: DataFrame) -> DataFrame:
    """Per doc: reconstructed table shape + an order-pinned md5 over
    the (row, col, cell) grid."""
    from ..training.dedup import ensure_scan_parallelism

    g = table_grid(cluster_lines(synth_word_boxes(
        ensure_scan_parallelism(docs)
    )))
    cell = F.concat_ws(
        ":",
        F.col("line_id").cast("string"),
        F.col("col_id").cast("string"),
        F.col("cell"),
    )
    return (
        g.withColumn("cell_str", cell)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("line_id").cast("bigint").alias("n_rows"),
            F.countDistinct("col_id").cast("bigint").alias("n_cols"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("line_id", "col_id", "x0", "cell_str")
                            )
                        ),
                        lambda s: s["cell_str"],
                    ),
                    "|",
                )
            ).alias("grid_md5"),
        )
        .orderBy("doc_id")
    )
