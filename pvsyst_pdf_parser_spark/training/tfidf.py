"""TF-IDF term weighting and inverted-index construction — the IR-side
operators a web corpus needs once it is clean: keyword extraction for
topic bucketing / stratified mixing (TF-IDF, Spärck Jones 1972) and
posting lists for corpus search / decontamination lookups (the
inverted index every search engine builds; at web scale this IS the
MapReduce motivating example from Dean & Ghemawat 2004).

Shapes at 10^12 docs:

- TF-IDF: tokenization + term counting is a map-side explode; the
  (doc_id, token) aggregate rides ONE shuffle on the composite key.
  The document-frequency table is vocabulary-sized (millions, not
  trillions) so it re-enters as a BROADCAST join against the tf frame
  — the trillion-row side never shuffles a second time.  Corpus size
  N is a one-row aggregate (bounded driver collect, same pattern as
  the CC convergence probe).
- inverted index: posting lists are per-term aggregates (one shuffle
  on the token key); the demo caps each list and keeps the top-N
  terms by document frequency so the oracle output is bounded — a
  real build writes every term's postings partitioned by hash(term).

Scores are rounded to 6 dp BEFORE ranking so the per-doc top-k is
stable across engines (ln() may differ in the last ulp between libm
implementations; a 1e-16 difference must not flip a rank).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .rankutil import topk_with_rank


def doc_term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf): whitespace tokens of the lowercased text."""
    from .dedup import ensure_scan_parallelism

    return (
        ensure_scan_parallelism(docs).select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), " ", -1)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tf, df, score)
    with score = tf * (ln((N+1)/(df+1)) + 1) rounded to 6 dp, ranked
    by (score desc, term asc).

    The df table is broadcast (vocabulary-bounded); N is a one-row
    count — at any corpus size the trillion-row token frame shuffles
    exactly once, on (doc_id, term)."""
    tf = doc_term_counts(docs)
    df_tbl = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n_docs = docs.count()  # bounded one-row aggregate
    scored = tf.join(F.broadcast(df_tbl), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "term_rank")
    )


def inverted_postings(
    docs: DataFrame, top_n: int = 20, cap: int = 10
) -> DataFrame:
    """Posting lists for the ``top_n`` terms by document frequency:
    (term, df, postings) where postings is the first ``cap`` doc_ids
    in ascending order, comma-joined (string so the value-hash compare
    is order-exact).

    Term selection by (df desc, term asc) via ``TakeOrderedAndProject``
    (distributed top-k — the vocabulary-sized df table never funnels
    through a single-partition window); the per-term doc list is
    capped BEFORE aggregation by a doc_id-ordered window, so no
    posting list ever materializes unbounded on one task — the guard a
    real index build needs for stopwords, whose postings would
    otherwise be corpus-sized."""
    appears = doc_term_counts(docs).select("term", "doc_id")
    df_tbl = appears.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    top_terms = df_tbl.orderBy(
        F.col("df").desc(), F.col("term").asc()
    ).limit(top_n)
    wd = Window.partitionBy("term").orderBy("doc_id")
    capped = (
        appears.join(F.broadcast(top_terms), "term")
        .withColumn("drank", F.row_number().over(wd))
        .filter(F.col("drank") <= cap)
    )
    return (
        capped.groupBy("term", "df")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
        .select("term", "df", "postings")
    )


def idf_value(n_docs: int, df: int) -> float:
    """Reference scalar for tests: ln((N+1)/(df+1)) + 1."""
    return math.log((n_docs + 1) / (df + 1)) + 1.0


def bm25_topk(
    docs: DataFrame, n_terms: int = 3, skip: int = 1, k: int = 10,
    k1: float = 1.2, b: float = 0.75,
) -> DataFrame:
    """(doc_id, n_hit, score, bm25_rank): top-k documents by BM25
    (Robertson & Zaragoza 2009, the Okapi weighting) for a
    deterministic query — the ``n_terms`` terms ranked ``skip+1`` …
    ``skip+n_terms`` by (df desc, term asc), i.e. mid-frequency terms
    just below the top stopword, so the scoring is non-degenerate on
    any corpus without hard-coding vocabulary.

    score(d) = Σ_q idf(q) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(q) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Plan shape at 10^12 docs: tf rides the ONE corpus shuffle on
    (doc_id, term) that every IR operator in this module shares; dl is
    a same-key-family re-agg of that frame; the query-term table is
    n_terms rows (broadcast), so the scored frame is ≤ n_terms rows per
    doc BEFORE the dl join.  N and Σdl are bounded one-row aggregates
    (the same driver-collect pattern as tfidf_top_terms), and avgdl is
    their exact-integer quotient, so both engines divide identical
    integers.  Both global ranks (query-term selection over the
    vocabulary, final doc top-k over the hit set) run through
    ``TakeOrderedAndProject`` — no single-partition window anywhere.
    Scores round to 6 dp BEFORE ranking (cross-engine rank
    stability); ties break on doc_id ascending."""
    tf = doc_term_counts(docs)
    df_tbl = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    qterms = topk_with_rank(
        df_tbl,
        [F.col("df").desc(), F.col("term").asc()],
        skip + n_terms,
        "trk",
    ).filter(F.col("trk") > skip).drop("trk")
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    totals = tf.agg(
        F.count_distinct("doc_id").alias("n"), F.sum("tf").alias("toks")
    ).collect()[0]  # bounded one-row aggregate
    n_docs, total_tokens = int(totals["n"]), int(totals["toks"])
    avgdl = total_tokens / n_docs
    hit = tf.join(F.broadcast(qterms), "term").join(dl, "doc_id")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
    ) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
    )
    scored = (
        hit.withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_hit"),
            F.round(F.sum("contrib"), 6).alias("score"),
        )
    )
    return topk_with_rank(
        scored,
        [F.col("score").desc(), F.col("doc_id").asc()],
        k,
        "bm25_rank",
        rank_type="bigint",
    ).select("doc_id", "n_hit", "score", "bm25_rank")
