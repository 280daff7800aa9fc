"""Text analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.

All pure column expressions built from functions with exact DuckDB
equivalents (length/replace/split arithmetic, md5) so the oracles match
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import md5_56

EN_MARKERS = [" the ", " and ", " a "]

# Public stopword-profile markers for the multi-language heuristic
# (top function words from the public stopword lists for each language;
# space-delimited so they only match whole tokens).  Order matters: it
# is the deterministic tiebreak when two languages score equally.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", [" the ", " and ", " of ", " to ", " in "]),
    ("de", [" der ", " die ", " und ", " den ", " von "]),
    ("fr", [" le ", " la ", " et ", " les ", " des "]),
    ("es", [" el ", " los ", " y ", " en ", " una "]),
    ("it", [" il ", " che ", " di ", " la ", " per "]),
]
# a language is only guessed when its marker ratio clears this floor
# (hits * 20 >= tokens ⇔ ratio ≥ 0.05); below it the doc is 'und'
LANG_MIN_RATIO_DEN = 20


def _count_occurrences(col, needle: str):
    """(len(s) - len(replace(s, needle, ''))) / len(needle) — portable."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


# GPT-2-style pre-tokenizer (Radford 2019 released regex), restricted
# to the portable Java-regex ∩ RE2 subset (no lookahead, ASCII classes
# — the public pattern's `\s+(?!\S)` tail is RE2-inexpressible; for
# single-space web text the simplified alternation yields identical
# splits).  Each match ≈ one BPE pre-token; real BPE only subdivides
# within these units, so the count upper-bounds at merges=0 and tracks
# any GPT-2-family tokenizer within its merge ratio.
PRETOKEN_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


def token_count_stats(docs: DataFrame) -> DataFrame:
    """Whitespace tokens, a chars/4 BPE estimate, and the GPT-2
    pre-tokenizer unit count per source."""
    tokens = F.size(F.split(F.col("text"), r" ", -1))
    bpe_est = F.ceil(F.length("text") / 4).cast("bigint")
    pretok = F.size(F.regexp_extract_all("text", F.lit(PRETOKEN_PAT), 0))
    return (
        docs.select(
            "source",
            tokens.alias("n_tokens"),
            bpe_est.alias("n_bpe"),
            pretok.alias("n_pretok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 3).alias("avg_tokens"),
            F.sum("n_bpe").alias("total_bpe_est"),
            F.sum("n_pretok").cast("bigint").alias("total_pretok"),
        )
    )


def lang_id_heuristic(docs: DataFrame) -> DataFrame:
    """English-marker stopword ratio vs the table's lang label."""
    text = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    en_hits = sum(_count_occurrences(text, m) for m in EN_MARKERS)
    tokens = F.size(F.split(F.col("text"), r" ", -1))
    scored = docs.select(
        "doc_id",
        "lang",
        en_hits.alias("en_hits"),
        tokens.alias("n_tokens"),
    ).withColumn(
        "guess_en",
        (F.col("en_hits") * 20 >= F.col("n_tokens")).cast("int"),
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("guess_en").alias("n_guessed_en"),
        F.round(F.avg(F.col("en_hits") / F.col("n_tokens")), 4).alias(
            "avg_marker_ratio"
        ),
    )


def lang_id_multi(docs: DataFrame) -> DataFrame:
    """Multi-language stopword-profile ID over LANG_MARKERS (5 languages
    + 'und' fallback), aggregated as a (lang label × guessed) confusion
    table.

    Pure length/replace arithmetic — the DuckDB oracle replays the same
    formula value-for-value.  The guess is the FIRST language in
    LANG_MARKERS order whose marker ratio is maximal (deterministic
    tiebreak) and clears the 0.05 floor; otherwise 'und'.  At 100 TB
    this is one projection + one tiny groupBy — no shuffle beyond the
    (lang, guess) aggregation."""
    from .dedup import ensure_scan_parallelism

    text = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    tokens = F.size(F.split(F.col("text"), r" ", -1))
    # ~25 marker replace-scans of the full text per doc — heavy
    # row-local work that ran on the degenerate scan's 2 splits (r6b;
    # dispatch is a no-op at real split counts)
    scored = ensure_scan_parallelism(docs).select(
        "doc_id",
        "lang",
        tokens.alias("n_tokens"),
        *[
            sum(_count_occurrences(text, m) for m in markers).alias(f"hits_{code}")
            for code, markers in LANG_MARKERS
        ],
    )
    # argmax with first-wins tiebreak: best = greatest(hits); guess =
    # first language (LANG_MARKERS order) whose hits equal best, or
    # 'und' when even the best ratio misses the floor
    best = F.greatest(*[F.col(f"hits_{c}") for c, _ in LANG_MARKERS])
    first_match = F.lit("und")
    for code, _markers in reversed(LANG_MARKERS):
        first_match = F.when(
            F.col(f"hits_{code}") == best, F.lit(code)
        ).otherwise(first_match)
    guess = F.when(
        (best * LANG_MIN_RATIO_DEN >= F.col("n_tokens")) & (best > 0),
        first_match,
    ).otherwise(F.lit("und"))
    return (
        scored.withColumn("guess", guess)
        .groupBy("lang", "guess")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(best / F.col("n_tokens")), 4).alias("avg_best_ratio"),
        )
    )


def quality_scores(docs: DataFrame, sample_mod: int = 20) -> DataFrame:
    """Length/stopword/uppercase composite quality score per document."""
    text = F.col("text")
    n_chars = F.length(text)
    tokens = F.size(F.split(text, r" ", -1))
    spaced = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = sum(_count_occurrences(spaced, m) for m in EN_MARKERS)
    len_score = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    stop_score = F.least(F.lit(1.0), stop_hits * F.lit(10.0) / tokens)
    word_len_score = F.least(F.lit(1.0), (n_chars / tokens) / F.lit(8.0))
    return docs.filter(F.col("doc_id") % sample_mod == 0).select(
        "doc_id",
        n_chars.alias("n_chars_actual"),
        tokens.alias("n_tokens"),
        F.round(
            F.lit(0.4) * len_score + F.lit(0.3) * stop_score
            + F.lit(0.3) * word_len_score,
            4,
        ).alias("quality_score"),
    )


def quality_scores_v2(docs: DataFrame, sample_mod: int = 10) -> DataFrame:
    """Gopher/C4-style rule-based quality signals per document (public
    pipeline practice: Rae et al. 2021 'Scaling Language Models'
    Gopher rules; Raffel et al. 2020 C4 heuristics):

    - mean word length in [3, 10]          (Gopher)
    - ≥ 2 stopword hits                    (Gopher stopword requirement)
    - symbol-to-token ratio ≤ 0.1 (# and …)(Gopher symbol ratio)
    - type-token ratio ≥ 0.2               (repetition proxy — the
      scalable stand-in for Gopher's duplicate-line fraction)
    - token count in [50, 100000]          (Gopher length bounds)

    ``quality2_score`` is the fraction of rules passed.  Everything is
    split/replace/distinct arithmetic with exact DuckDB equivalents;
    one projection, no shuffle — at 100 TB this is a pure map stage."""
    from .dedup import ensure_scan_parallelism

    # heavy row-local regex/split work over a 2-row-group scan would
    # run on 2 cores — one cheap exchange buys full parallelism (r6;
    # no-op at real split counts)
    docs = ensure_scan_parallelism(docs)
    text = F.col("text")
    toks = F.split(text, r" ", -1)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    # total non-space chars / tokens (single-space split both engines)
    mean_word_len = (n_chars - (n_tokens - 1)) / n_tokens
    spaced = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = sum(_count_occurrences(spaced, m) for m in EN_MARKERS)
    symbol_hits = _count_occurrences(text, "#") + _count_occurrences(text, "...")
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    flags = [
        ("flag_word_len", (mean_word_len >= 3.0) & (mean_word_len <= 10.0)),
        ("flag_stopwords", stop_hits >= 2),
        ("flag_symbols", symbol_hits * 10 <= n_tokens),
        ("flag_ttr", ttr >= 0.2),
        ("flag_length", (n_tokens >= 50) & (n_tokens <= 100_000)),
    ]
    out = docs.filter(F.col("doc_id") % sample_mod == 0).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(ttr, 4).alias("type_token_ratio"),
        *[expr.cast("int").alias(name) for name, expr in flags],
    )
    score = sum(F.col(name) for name, _ in flags) / F.lit(float(len(flags)))
    return out.withColumn("quality2_score", F.round(score, 4))


def repetition_stats(docs: DataFrame, n: int = 5, sample_mod: int = 10) -> DataFrame:
    """Gopher duplicate-n-gram repetition signal: the fraction of
    n-gram OCCURRENCES that belong to an n-gram appearing more than
    once in the same document (Rae et al. 2021 filter by duplicate
    5/6/...-gram character fraction; this is the token-occurrence
    variant with exact DuckDB parity).  Two aggregations, both keyed by
    doc — no joins, scales as a pure shuffle-light pipeline."""
    # r6b: ml.feature.NGram builds the same space-joined grams as the
    # old interpreted transform HOF (compiled sliding mkString; empty
    # below n tokens — the old sequence-guard semantics).
    from pyspark.ml.feature import NGram

    from .dedup import ensure_scan_parallelism

    ng = NGram(n=n, inputCol="__toks", outputCol="__grams")
    g = ng.transform(
        ensure_scan_parallelism(
            docs.filter(F.col("doc_id") % sample_mod == 0)
        ).select(
            "doc_id",
            # NULL text → empty array (NGram's Scala UDF would NPE on
            # a null Seq; the old HOF guard yielded no grams)
            F.coalesce(
                F.split(F.lower("text"), " ", -1),
                F.array().cast("array<string>"),
            ).alias("__toks"),
        )
    ).select("doc_id", F.explode("__grams").alias("gram"))
    per = g.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "n_repeated"
        ),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
            / F.sum("cnt"),
            4,
        ).alias("repetition_ratio"),
    )


def quality_gate_expr(text=None):
    """Boolean 'passes the quality gate' column (≥4 of the 5 Gopher/C4
    rules of :func:`quality_scores_v2`) as a pure expression — shared
    by :func:`funnel_flags` and the weak labels of
    training/qualitymodel.py so the gate cannot drift between its
    consumers."""
    text = F.col("text") if text is None else text
    spaced = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    toks = F.split(text, r" ", -1)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    mean_word_len = (n_chars - (n_tokens - 1)) / n_tokens
    stop_hits = sum(_count_occurrences(spaced, m) for m in EN_MARKERS)
    symbol_hits = _count_occurrences(text, "#") + _count_occurrences(text, "...")
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    q_flags = (
        ((mean_word_len >= 3.0) & (mean_word_len <= 10.0)).cast("int")
        + (stop_hits >= 2).cast("int")
        + (symbol_hits * 10 <= n_tokens).cast("int")
        + (ttr >= 0.2).cast("int")
        + ((n_tokens >= 50) & (n_tokens <= 100_000)).cast("int")
    )
    return q_flags >= 4


def cleaning_gate_exprs():
    """The STATELESS cleaning gates as two column expressions over a
    ``text`` column — ``(pass_lang, pass_quality)``, both int 0/1.
    Pure projections (no window/shuffle/state), which is what lets the
    identical gate arithmetic serve batch (:func:`funnel_flags`) and
    Structured Streaming (streaming.clean_documents_stream) alike.

    1. language gate: the multi-language stopword guess is not 'und'
    2. quality gate: ≥ 4 of the 5 Gopher/C4 rules pass
    """
    text = F.col("text")
    spaced = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    n_tokens = F.size(F.split(text, r" ", -1))
    hits = [
        sum(_count_occurrences(spaced, m) for m in markers)
        for _, markers in LANG_MARKERS
    ]
    best = F.greatest(*hits)
    pass_lang = (
        (best * LANG_MIN_RATIO_DEN >= n_tokens) & (best > 0)
    ).cast("int")
    return pass_lang, quality_gate_expr(text).cast("int")


def gate_flags(docs: DataFrame) -> DataFrame:
    """(doc_id, source, text, n_tokens, pass_lang, pass_quality) — the
    stateless gates of :func:`cleaning_gate_exprs` as one projection."""
    from .dedup import ensure_scan_parallelism

    pass_lang, pass_quality = cleaning_gate_exprs()
    # the gate expressions are heavy row-local split/replace chains —
    # parallelize a degenerate scan once for every funnel consumer
    return ensure_scan_parallelism(docs).select(
        "doc_id", "source", "text",
        F.size(F.split(F.col("text"), r" ", -1)).alias("n_tokens"),
        pass_lang.alias("pass_lang"),
        pass_quality.alias("pass_quality"),
    )


def funnel_flags(docs: DataFrame) -> DataFrame:
    """Per-document cleaning-gate flags in ONE projection + ONE window:
    (doc_id, source, text, n_tokens, pass_lang, pass_quality,
    first_copy) — the shared root of :func:`cleaning_funnel_stats`
    (the per-source report) and corpus.corpus_build_report (the
    end-to-end build), so composed pipelines pay for the flag pass
    once.  Gates 1-2 come from :func:`gate_flags`; this adds

    3. exact-dup gate: first occurrence of the text (min doc_id keeps)
    """
    from pyspark.sql import Window

    w = Window.partitionBy("text").orderBy("doc_id")
    return gate_flags(docs).withColumn(
        "first_copy", (F.row_number().over(w) == 1).cast("int")
    ).select(
        "doc_id", "source", "text", "n_tokens",
        "pass_lang", "pass_quality", "first_copy",
    )


def cleaning_funnel_stats(docs: DataFrame) -> DataFrame:
    """The end-to-end corpus-cleaning FUNNEL in one pass: per source,
    how many documents survive each gate and all gates together (see
    :func:`funnel_flags` for the gates).

    This is the decision report an operator reads before committing a
    cleaning run — which source loses how much, and to which gate.
    Plan: one projection computes every flag, ONE window over the text
    hash ranks exact dups, one aggregation — the same shuffle count as
    exact dedup alone."""
    flagged = funnel_flags(docs)
    retained = (
        (F.col("pass_lang") == 1)
        & (F.col("pass_quality") == 1)
        & (F.col("first_copy") == 1)
    ).cast("int")
    return (
        flagged.withColumn("retained", retained)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("pass_lang").alias("n_pass_lang"),
            F.sum("pass_quality").alias("n_pass_quality"),
            F.sum("first_copy").alias("n_first_copy"),
            F.sum("retained").alias("n_retained"),
            F.round(F.sum("retained") / F.count("*"), 4).alias(
                "retention_rate"
            ),
        )
    )


def funnel_attribution_stats(docs: DataFrame) -> DataFrame:
    """Gate-attribution breakdown of the cleaning funnel: one row per
    (pass_lang, pass_quality, first_copy) combination with document and
    token counts plus a human-readable verdict label — the report that
    answers "which gate is actually removing my data, and how much
    would relaxing exactly one gate recover?" (the overlap question the
    per-source funnel totals of :func:`cleaning_funnel_stats` cannot
    answer, because a document failing two gates is hidden in both
    columns).

    Plan: rides :func:`funnel_flags` unchanged — one projection, ONE
    text-keyed window, then an aggregation on a key with at most 8
    values (map-side combined; the shuffle carries <= 8 rows per
    partition whatever the corpus size)."""
    flagged = funnel_flags(docs)
    verdict = (
        F.when(
            (F.col("pass_lang") == 1)
            & (F.col("pass_quality") == 1)
            & (F.col("first_copy") == 1),
            "retained",
        )
        .when(
            F.col("pass_lang") + F.col("pass_quality") + F.col("first_copy")
            == 2,
            F.concat(
                F.lit("lost_to_"),
                F.when(F.col("pass_lang") == 0, "lang")
                .when(F.col("pass_quality") == 0, "quality")
                .otherwise("dup"),
                F.lit("_only"),
            ),
        )
        .otherwise("lost_to_multiple")
    )
    return (
        flagged.groupBy("pass_lang", "pass_quality", "first_copy")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        # exact integer ppm; the window runs over the <= 8 verdict rows
        # of the aggregate output, never the corpus
        .withColumn(
            "share_ppm",
            F.expr("(n_docs * 1000000) div (sum(n_docs) over ())").cast(
                "bigint"
            ),
        )
        .select(
            "pass_lang",
            "pass_quality",
            "first_copy",
            verdict.alias("verdict"),
            "n_docs",
            "n_tokens",
            "share_ppm",
        )
    )


def length_percentile_stats(docs: DataFrame) -> DataFrame:
    """Per-source token-length distribution (p50/p90/p99/max) — the
    corpus report an operator runs BEFORE choosing the Gopher length
    bounds for a new crawl.  Uses EXACT linear-interpolation
    `percentile` so the DuckDB `quantile_cont` oracle matches
    value-for-value; at 10^12 docs swap in `percentile_approx`
    (t-digest, bounded memory) and downgrade the oracle to a tolerance
    check — the documented exact↔sketch trade."""
    n_tokens = F.size(F.split(F.col("text"), r" ", -1))
    return (
        docs.select("source", n_tokens.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.expr("percentile(n_tokens, 0.5)"), 2).alias("p50_tokens"),
            F.round(F.expr("percentile(n_tokens, 0.9)"), 2).alias("p90_tokens"),
            F.round(F.expr("percentile(n_tokens, 0.99)"), 2).alias("p99_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
    )


def unigram_logprob_scores(
    docs: DataFrame, sample_mod: int = 2, carry: tuple = ()
) -> DataFrame:
    """Per-document mean unigram negative log-likelihood under the
    CORPUS unigram distribution — the DataFrame-native proxy for the
    LM-perplexity quality filter of public pipelines (CCNet, Wenzek et
    al. 2020 score documents with a KenLM model; the unigram form needs
    no model artifact and ranks the same gross failures): gibberish /
    OCR noise is rare-token-heavy and scores HIGH, natural prose scores
    LOW.

    Plan shape at 10^12 docs: one token-keyed aggregation (map-side
    combined) builds the vocabulary frequency table; the per-token join
    BROADCASTS that table (a web-corpus unigram vocab is millions of
    rows — broadcastable — vs the corpus' trillions of token
    occurrences, so the big side never shuffles); one doc-keyed
    aggregation finishes.  The corpus total rides along as a column of
    the broadcast frame — no driver-side scalar round trip.

    ``carry`` names extra per-doc columns (e.g. ``("lang",)``) to ride
    through the doc-keyed aggregation — they are functionally dependent
    on doc_id, so widening the groupBy key costs nothing and saves the
    caller a doc-keyed join back against the corpus."""
    from .dedup import ensure_scan_parallelism, persist_tracked

    # fan-out roots (r6): `toks` feeds the vocab count AND the scoring
    # join; `freq` feeds the corpus total AND the broadcast model —
    # persist both so the corpus explode runs once
    toks = persist_tracked(
        ensure_scan_parallelism(docs.filter(F.col("doc_id") % sample_mod == 0))
        .select(
            "doc_id",
            *carry,
            F.explode(F.split(F.lower("text"), " ", -1)).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    freq = persist_tracked(toks.groupBy("tok").agg(F.count("*").alias("c")))
    total = freq.agg(F.sum("c").alias("total"))
    freq = freq.crossJoin(F.broadcast(total)).withColumn(
        "nll", -F.log(F.col("c") / F.col("total"))
    )
    return (
        toks.join(F.broadcast(freq.select("tok", "nll")), "tok")
        .groupBy("doc_id", *carry)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
        )
    )


def doc_fingerprints(docs: DataFrame, sample_mod: int = 25) -> DataFrame:
    """56-bit fingerprint of whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")
    return docs.filter(F.col("doc_id") % sample_mod == 0).select(
        "doc_id", md5_56(norm).alias("fingerprint")
    )


def vocab_coverage_stats(docs: DataFrame, vocab_size: int = 256) -> DataFrame:
    """Tokenizer-prep vocabulary coverage: build the top-``vocab_size``
    token vocabulary (count desc, token asc — a deterministic
    tie-break) and measure the out-of-vocabulary rate per source — the
    coverage report that sizes a tokenizer's vocab against a corpus.

    Plan: explode → token-count agg (map-side combine) → top-V via
    orderBy().limit() (TakeOrdered: distributed partial top-k per
    partition, NO single-task rank window over the token universe) →
    the bounded vocab re-enters as a BROADCAST join against the
    exploded corpus → per-source agg.  The corpus side shuffles once
    for the count and once for the source report; oov_ppm is exact
    integer arithmetic so both engines agree bit-for-bit."""
    from .dedup import ensure_scan_parallelism, persist_tracked

    # `toks` feeds the vocab selection AND the per-source OOV agg —
    # persist so the corpus explode runs once, not twice (r6)
    toks = persist_tracked(ensure_scan_parallelism(docs).select(
        "source",
        F.explode(
            F.filter(F.split("text", " ", -1), lambda x: x != "")
        ).alias("tok"),
    ))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    agg = toks.join(F.broadcast(vocab), "tok", "left").groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
    )
    return agg.select(
        "source", "n_tokens", "n_oov",
        F.expr("div(1000000 * n_oov, n_tokens)").alias("oov_ppm"),
    ).orderBy("source")


def bigram_logprob_scores(
    docs: DataFrame, top_m: int = 4096, alpha: float = 0.5
) -> DataFrame:
    """Per-document mean bigram negative log-likelihood under a PRUNED
    corpus bigram model with add-alpha smoothing — one order up from
    :func:`unigram_logprob_scores` toward the KenLM scoring of CCNet
    (Wenzek 2020): repetitive/templated text scores LOW, token-salad
    scores HIGH even when its unigrams are common.

        nll(w1 w2) = -ln((c(w1,w2) + a) / (c(w1) + a*V))

    with c(w1,w2) = 0 for bigrams outside the top-``top_m`` model —
    the pruning every production n-gram LM applies, and what keeps the
    model BROADCASTABLE: the unigram table is vocab-sized (millions)
    and the bigram table is capped at top_m, so the trillion-pair
    corpus side joins both as broadcasts and never shuffles except
    its own doc-keyed fold.  Bigram pairs are built ROW-LOCALLY
    (sequence + element_at), no self-join.  Top-m selection is
    orderBy().limit() — distributed TakeOrdered, deterministic
    (count desc, w1, w2) tie-break."""
    from .dedup import persist_tracked

    toks_arr = F.filter(
        F.split(F.lower("text"), " ", -1), lambda x: x != ""
    )
    from .dedup import ensure_scan_parallelism

    base = ensure_scan_parallelism(docs).select("doc_id", toks_arr.alias("t"))
    toku = base.select("doc_id", F.explode("t").alias("tok"))
    # fan-out roots (r6, same treatment as kneser_ney_scores): `uni`
    # feeds the vocab-size scalar AND the scoring broadcast; `pairs`
    # feeds the pruned bigram table AND the scoring join — persist both
    # so the corpus token/bigram explodes run once, not 2× each
    uni = persist_tracked(toku.groupBy("tok").agg(F.count("*").alias("c1")))
    vocab_v = uni.agg(F.count("*").alias("v"))
    uni = uni.crossJoin(F.broadcast(vocab_v))
    # r6b note: an ml.feature.NGram + post-explode split form was TRIED
    # and measured 2.2x SLOWER (ABAB, sf1x) — the per-exploded-row
    # split() undoes the compiled window win.  Struct HOF stays.
    pairs = persist_tracked(
        base.filter(F.size("t") >= 2).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        ).select("doc_id", "bg.w1", "bg.w2")
    )
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(top_m)
    )
    scored = (
        pairs.join(F.broadcast(uni), pairs["w1"] == uni["tok"])
        .join(F.broadcast(bi), ["w1", "w2"], "left")
        .withColumn(
            "nll",
            -F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + alpha)
                / (F.col("c1") + alpha * F.col("v"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg("nll"), 4).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


def char_entropy_stats(docs: DataFrame) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) plus
    distinct-character count — the compressibility signal RefinedWeb-
    class pipelines use to catch binary junk / encoding soup (very low
    entropy = repeated filler, very high = base64/gibberish).

    H = ln(n) - (Σ c·ln c)/n over per-(doc, char) counts c — the
    algebra keeps the aggregate a plain partial-combinable sum (no
    per-row p=c/n normalization pass), so the plan is one (doc, char)
    agg + one doc agg: two map-side-combining shuffles at any corpus
    size.  Rounded to 4 decimals so float summation order can never
    flip the hash (same policy as the LM scores)."""
    from .dedup import ensure_scan_parallelism

    chars = ensure_scan_parallelism(docs).select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit("."), 0)).alias("ch"),
    )
    per = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_chars"),
        F.count("*").cast("bigint").alias("distinct_chars"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("slc"),
    )
    return agg.select(
        "doc_id",
        "n_chars",
        "distinct_chars",
        F.round(F.log("n_chars") - F.col("slc") / F.col("n_chars"), 4).alias(
            "entropy"
        ),
    ).orderBy("doc_id")


def type_token_ratio_stats(docs: DataFrame) -> DataFrame:
    """Per-document type-token ratio (distinct tokens / tokens) in
    exact integer ppm — the lexical-diversity gate (low TTR = looped /
    boilerplate text; Gopher prunes on the same family of signals).

    Same two-level agg shape as the entropy stat: per-(doc, token)
    count then per-doc fold — never a countDistinct over the raw token
    stream, so both shuffles partial-aggregate map-side."""
    from .dedup import ensure_scan_parallelism

    toks = ensure_scan_parallelism(docs).select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " ", -1), lambda x: x != "")
        ).alias("tok"),
    )
    per = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.expr("div(1000000 * n_types, n_tokens)").alias("ttr_ppm"),
    ).orderBy("doc_id")


# Unicode-script detection: the five script classes cover the major
# writing systems a Common-Crawl-style corpus actually mixes; digits /
# punctuation / space are Unicode-Common and deliberately belong to no
# class (their mass shows up only in the denominator).  Spark's Java
# regex spells a script \p{IsLatin}; DuckDB's RE2 spells it \p{Latin} —
# the probe-verified pair per class.
SCRIPT_CLASSES = [
    ("latin", "IsLatin"),
    ("cyrillic", "IsCyrillic"),
    ("han", "IsHan"),
    ("arabic", "IsArabic"),
    ("greek", "IsGreek"),
]
_SCRIPT_PHRASES = [
    ("the quick brown fox jumps over the lazy dog", "latin"),
    ("съешь же ещё этих мягких французских булок", "cyrillic"),
    ("天地玄黄宇宙洪荒日月盈昃辰宿列张", "han"),
    ("النص العربي المستخدم في اختبار الكشف عن النظام", "arabic"),
    ("αλφα βητα γαμμα δελτα εψιλον ζητα ητα", "greek"),
    # balanced so NEITHER script reaches the strict majority at ANY
    # repeat count: per repeat latin = 13 (+1 overall for the 'd'
    # tail) and cyrillic = 13 of 26 letters, so with the >=1
    # Common-script digit in the tail each side's ppm is <= 500000
    # and the strict-majority rule always lands on 'mixed'
    ("mixed текст with слова plus еще", "mixed"),
]
SCRIPT_DOMINANT_PPM = 500_000  # strict majority of non-space chars


def synth_script_text(docs: DataFrame) -> DataFrame:
    """Deterministic multiscript fixture: (doc_id, script_label, text).
    Profile = doc_id % 6 picks one of five single-script phrases or a
    Latin/Cyrillic mix; the phrase repeats 1 + doc_id % 4 times and a
    'd<doc_id>' tail varies length (digits are script-Common, so the
    tail never shifts a script count — only the denominator).  The
    documents table's own text is ASCII-only, so script detection
    needs a synthesized input — same fixture pattern as
    crawl.synthetic_snapshots / synthetic_link_edges."""
    phrase_case = "CASE doc_id % 6 " + " ".join(
        f"WHEN {i} THEN '{p}'" for i, (p, _) in enumerate(_SCRIPT_PHRASES)
    ) + " END"
    label_case = "CASE doc_id % 6 " + " ".join(
        f"WHEN {i} THEN '{lab}'" for i, (_, lab) in enumerate(_SCRIPT_PHRASES)
    ) + " END"
    return docs.select(
        "doc_id",
        F.expr(label_case).alias("script_label"),
        F.expr(
            f"concat(repeat(concat({phrase_case}, ' '), "
            "cast(1 + doc_id % 4 AS int)), 'd', cast(doc_id AS string))"
        ).alias("text"),
    )


def script_mix_report(docs: DataFrame) -> DataFrame:
    """Per-document Unicode-script mix over the synthesized multiscript
    fixture — the script-detection gate multilingual pipelines run
    BEFORE n-gram language ID (a Cyrillic page must never reach the
    Latin-stopword scorer; CLD3-class identifiers use the same
    script-first dispatch).

    Output: (doc_id, script_label, n_chars, <script>_ppm × 5,
    dominant) — per-script character mass in exact integer ppm of the
    non-space characters, dominant = the first script in
    SCRIPT_CLASSES order holding a strict majority
    (> SCRIPT_DOMINANT_PPM), else 'mixed'.

    Scale shape: one pure projection (five regexp_replace + length
    per row, zero shuffle at any corpus size) + the presentation sort.
    All arithmetic is integer DIV — bit-equal to the DuckDB oracle."""
    from .dedup import ensure_scan_parallelism

    synth = synth_script_text(ensure_scan_parallelism(docs))
    n_chars = F.length(F.regexp_replace("text", r"\s", ""))
    counts = [
        F.length(
            F.regexp_replace("text", rf"[^\p{{{java}}}]", "")
        ).alias(f"n_{name}")
        for name, java in SCRIPT_CLASSES
    ]
    base = synth.select(
        "doc_id", "script_label", n_chars.alias("n_chars"), *counts
    )
    ppms = [
        F.expr(f"n_{name} * 1000000 DIV n_chars").alias(f"{name}_ppm")
        for name, _ in SCRIPT_CLASSES
    ]
    scored = base.select("doc_id", "script_label", "n_chars", *ppms)
    best = F.greatest(*[F.col(f"{n}_ppm") for n, _ in SCRIPT_CLASSES])
    dominant = F.lit("mixed")
    for name, _ in reversed(SCRIPT_CLASSES):
        dominant = F.when(
            F.col(f"{name}_ppm") == best, F.lit(name)
        ).otherwise(dominant)
    dominant = F.when(
        best > SCRIPT_DOMINANT_PPM, dominant
    ).otherwise(F.lit("mixed"))
    return scored.withColumn("dominant", dominant).orderBy("doc_id")


def token_length_histogram(docs: DataFrame) -> DataFrame:
    """Per-source token-length histogram in power-of-two buckets — the
    length profile that sizes sequence packing, truncation limits, and
    long-doc sampling policy.

    The bucket is the BIT LENGTH of the token count
    (``length(bin(n))``: 1→1, 2-3→2, 4-7→3, …) — exact integer
    arithmetic in both engines, unlike floor(log2(n)) whose float
    rounding can flip a doc at an exact power of two.  One agg, no
    joins."""
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), " ", -1), lambda x: x != "")
    )
    return (
        docs.select(
            "source",
            n_tokens.alias("n_tokens"),
            F.length(F.bin(n_tokens)).cast("bigint").alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source", "bucket")
    )


WINNOW_K = 4   # tokens per k-gram
WINNOW_W = 5   # winnowing window (guarantee: any match ≥ w+k-1 tokens
               # shares a fingerprint; expected density 2/(w+1))


def winnowing_fingerprints(docs: DataFrame, k: int = WINNOW_K,
                           w: int = WINNOW_W) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every k-token gram, slide a w-gram
    window, keep the RIGHTMOST minimal hash per window — a local
    fingerprinting scheme that, unlike MinHash's global sketch,
    guarantees any shared run of ≥ w+k-1 tokens yields a shared
    fingerprint (the copy-detection contract).

    Everything is ROW-LOCAL array HOFs — gram hashing (transform +
    slice + md5), the per-window rightmost-argmin (an ``aggregate``
    fold carrying (best_hash, best_pos, cursor)), and the distinct-
    position fold — zero shuffle at any corpus size; O(n·w) work per
    doc, the classic implementation.  The oracle replays the same
    selection relationally (w-offset unnest + rightmost-min window).

    Output: (doc_id, n_grams, n_selected, fp_hash) where fp_hash is
    the md5 of the selected hashes joined in position order — the
    whole fingerprint set byte-verified across engines."""
    from .dedup import ensure_scan_parallelism

    toks = F.filter(F.split("text", " ", -1), lambda x: x != "")
    # O(n·w) row-local work per doc: on a degenerate one-row-group scan
    # this would run single-core — buy full parallelism with one cheap
    # exchange (no-op at real split counts)
    base = ensure_scan_parallelism(docs).select(
        "doc_id", toks.alias("toks")
    ).filter(F.size("toks") >= k)
    # r6b: gram TEXT via ml.feature.NGram (compiled sliding mkString —
    # the interpreted transform+slice+array_join was the heavy part of
    # the hash chain); md5/conv stay JVM-side on the identical strings,
    # so hashes are bit-identical.
    from pyspark.ml.feature import NGram

    ng = NGram(n=k, inputCol="toks", outputCol="__grams")
    grams = F.transform(
        "__grams",
        lambda s: F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("bigint"),
    )
    g = ng.transform(base).select("doc_id", grams.alias("h"))

    # r6: the per-window rightmost-argmin was an interpreted aggregate
    # fold carrying a struct accumulator — ~(n−w)·w boxed struct
    # allocations per doc, the operator's hot spot.  The gram hashes
    # still come from the JVM md5 chain above (no cross-engine hash
    # parity risk); ONE Arrow stage does the whole sliding-window
    # selection with numpy (reversed-window argmin ⇒ rightmost minimum,
    # ties included — `<=` keeps the later position, exactly the fold's
    # rule), and the fingerprint md5 over the selected hashes stays in
    # the JVM so string formatting and hashing engines are unchanged.
    import numpy as np

    def select_mins(batches):
        import pandas as pd

        for pdf in batches:
            ids, ngs, nsel, sels = [], [], [], []
            for doc_id, hs in zip(pdf["doc_id"].values, pdf["h"]):
                h = np.asarray(hs, dtype="int64")
                n = len(h)
                if n <= w:
                    # single window over the whole (possibly short) doc:
                    # rightmost min = first min of the reversed array
                    pos = np.array(
                        [n - 1 - int(np.argmin(h[::-1]))], dtype="int64"
                    )
                else:
                    win = np.lib.stride_tricks.sliding_window_view(h, w)
                    # argmin on the reversed windows returns the FIRST
                    # minimum of the reversal = the RIGHTMOST in the
                    # original window
                    rev_arg = np.argmin(win[:, ::-1], axis=1)
                    pos = np.unique(
                        np.arange(n - w + 1, dtype="int64") + (w - 1 - rev_arg)
                    )
                ids.append(doc_id)
                ngs.append(n)
                nsel.append(len(pos))
                sels.append(h[pos])
            yield pd.DataFrame(
                {"doc_id": ids, "n_grams": ngs, "n_selected": nsel,
                 "sel": sels}
            )

    picked = g.mapInPandas(
        select_mins,
        "doc_id long, n_grams long, n_selected long, sel array<long>",
    )
    fp = F.md5(
        F.array_join(
            F.transform("sel", lambda x: x.cast("string")), ","
        )
    )
    return picked.select(
        "doc_id",
        "n_grams",
        "n_selected",
        fp.alias("fp_hash"),
    ).orderBy("doc_id")


def curriculum_order(docs: DataFrame, n_phases: int = 3) -> DataFrame:
    """Quality-curriculum training order: (doc_id, phase, rank,
    n_flags) — phase 0 streams the cleanest documents first, later
    phases mix in the rest (curriculum/annealed data schedules in
    public practice: quality-ordered pretraining ablations in e.g.
    DataComp-LM and FineWeb reports; reverse the key for
    anti-curriculum).

    Phase is INTEGER arithmetic on the Gopher/C4 flag count k of
    :func:`quality_scores_v2` — ``phase = ((5 - k) * n_phases) // 6``
    — never a float bucket boundary, so Spark and the SQL oracle can
    not disagree on edge documents.  Within a phase, documents arrive
    in the reproducible (md5, doc_id) order; rank restarts per phase,
    so the global order key is (phase, rank).

    Plan: the quality projection (pure map) + ONE window per phase
    partition — the same single-shuffle shape as training_order; no
    global row_number bottleneck."""
    from pyspark.sql import Window

    from .hashing import md5_56

    q = quality_scores_v2(docs, sample_mod=1)
    k = (
        F.col("flag_word_len") + F.col("flag_stopwords")
        + F.col("flag_symbols") + F.col("flag_ttr") + F.col("flag_length")
    )
    phase = F.floor((F.lit(5) - k) * n_phases / 6).cast("int")
    base = q.select(
        "doc_id",
        k.cast("int").alias("n_flags"),
        phase.alias("phase"),
        md5_56(F.col("doc_id").cast("string")).alias("hk"),
    )
    w = Window.partitionBy("phase").orderBy("hk", "doc_id")
    return (
        base.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "phase", "rank", "n_flags")
    )


def trigram_backoff_scores(
    docs: DataFrame,
    top_m3: int = 4096,
    top_m2: int = 4096,
    backoff: float = 0.4,
) -> DataFrame:
    """Per-document mean trigram log-score under Stupid Backoff
    (Brants 2007, "Large Language Models in Machine Translation") over
    PRUNED corpus n-gram tables — the next order up from
    :func:`bigram_logprob_scores` toward the 5-gram KenLM scoring of
    CCNet (Wenzek 2020), with the backoff chain that production web-
    scale LMs actually use instead of smoothing:

        S(w3|w1,w2) = c123/c12          if the trigram AND its context
                                        bigram are in the pruned tables
                    = 0.4  * c23/c2     else if (w2,w3) is in the
                                        pruned bigram table
                    = 0.4² * c3/N       else (unigram floor; c3 > 0
                                        always — w3 came from the
                                        corpus)

    Pruning (top-``top_m3`` trigrams, top-``top_m2`` bigrams, count-
    desc with full lexicographic tie-break) is what keeps both model
    tables BROADCASTABLE; the unigram table is vocab-sized, the same
    broadcast-class frame every other LM operator here ships.  The
    corpus side builds its trigram positions ROW-LOCALLY (sequence +
    element_at, no self-join), takes five broadcast hash joins, and
    folds once on doc_id — at 10^12 documents nothing shuffles except
    that one doc-keyed aggregate.  ``n_tri_hits`` / ``n_bi_hits`` are
    exact integers (hash anchors for the oracle); the mean log-score
    is rounded to 4 decimals so float summation order cannot flip the
    driver's value hash (same policy as the other LM scores)."""
    toks_arr = F.filter(
        F.split(F.lower("text"), " ", -1), lambda x: x != ""
    )
    from .dedup import ensure_scan_parallelism

    from .dedup import persist_tracked

    base = ensure_scan_parallelism(docs).select("doc_id", toks_arr.alias("t"))
    toku = base.select("doc_id", F.explode("t").alias("tok"))
    # fan-out roots (r6): `uni` is referenced 3× (total, w2/w3 lookups),
    # `bi` 2× (context + backoff tables), `triples` 2× (model count +
    # scoring join) — unpersisted, each reference re-ran the full
    # corpus explode (~7 passes in the r5 plan); persisted it is one
    # explode per n-gram order
    uni = persist_tracked(toku.groupBy("tok").agg(F.count("*").alias("c1")))
    tot = uni.agg(F.sum("c1").cast("double").alias("n_total"))
    # r6b note: ml.feature.NGram + post-explode split forms were TRIED
    # here and measured 2.2-2.4x SLOWER (ABAB, sf1x) — the per-row
    # split() after the explode undoes the compiled window win.  The
    # struct HOFs stay.
    pairs = base.filter(F.size("t") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("w1"),
                    F.element_at("t", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bi = persist_tracked(
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(top_m2)
    )
    triples = persist_tracked(
        base.filter(F.size("t") >= 3).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                        F.element_at("t", i + 2).alias("w3"),
                    ),
                )
            ).alias("tg"),
        ).select("doc_id", "tg.w1", "tg.w2", "tg.w3")
    )
    tri = (
        triples.groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c123"))
        .orderBy(F.col("c123").desc(), "w1", "w2", "w3")
        .limit(top_m3)
    )
    b_ctx = bi.select(
        F.col("w1").alias("x1"), F.col("w2").alias("x2"),
        F.col("c12").alias("ctx12"),
    )
    b_back = bi.select(
        F.col("w1").alias("y2"), F.col("w2").alias("y3"),
        F.col("c12").alias("c23"),
    )
    u2 = uni.select(F.col("tok").alias("u2"), F.col("c1").alias("c2"))
    u3 = uni.select(F.col("tok").alias("u3"), F.col("c1").alias("c3"))
    j = (
        triples
        .join(F.broadcast(tri), ["w1", "w2", "w3"], "left")
        .join(
            F.broadcast(b_ctx),
            (F.col("w1") == F.col("x1")) & (F.col("w2") == F.col("x2")),
            "left",
        )
        .join(
            F.broadcast(b_back),
            (F.col("w2") == F.col("y2")) & (F.col("w3") == F.col("y3")),
            "left",
        )
        .join(F.broadcast(u2), F.col("w2") == F.col("u2"))
        .join(F.broadcast(u3), F.col("w3") == F.col("u3"))
        .crossJoin(F.broadcast(tot))
    )
    tri_hit = F.col("c123").isNotNull() & F.col("ctx12").isNotNull()
    bi_hit = F.col("c23").isNotNull()
    lp = (
        F.when(tri_hit, F.log(F.col("c123") / F.col("ctx12")))
        .when(
            bi_hit,
            F.log(F.lit(backoff) * F.col("c23") / F.col("c2")),
        )
        .otherwise(
            F.log(
                F.lit(backoff) * F.lit(backoff)
                * F.col("c3") / F.col("n_total")
            )
        )
    )
    scored = j.select(
        "doc_id",
        tri_hit.cast("int").alias("tri_hit"),
        bi_hit.cast("int").alias("bi_hit"),
        lp.alias("lp"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            F.sum("tri_hit").cast("bigint").alias("n_tri_hits"),
            F.sum(
                F.when(F.col("tri_hit") == 0, F.col("bi_hit")).otherwise(0)
            ).cast("bigint").alias("n_bi_hits"),
            F.round(F.avg("lp"), 4).alias("avg_lp"),
        )
        .orderBy("doc_id")
    )


def corpus_datasheet(docs: DataFrame) -> DataFrame:
    """Per (source, lang) corpus datasheet: (source, lang, n_docs,
    total_tokens, pass_lang_docs, pass_quality_docs, n_exact_dupes,
    dup_ppm) — the composition table a "datasheet for datasets"
    release card publishes (Gebru et al. 2021) and a mixing run reads
    before setting source weights.

    ONE pass over the corpus: the stateless gates ride the projection
    (cleaning_gate_exprs — the same arithmetic as the funnel and the
    streaming cleaner), exact-duplicate flags come from the one
    text-keyed window, and everything lands in one map-side-combined
    (source, lang) aggregation.  Counts are exact integers; dup_ppm is
    integer DIV.  Shuffle profile at 10^12 docs = the cleaning
    funnel's: one text-keyed exchange + one tiny-key agg."""
    from pyspark.sql import Window

    from .dedup import ensure_scan_parallelism

    pass_lang, pass_quality = cleaning_gate_exprs()
    w = Window.partitionBy("text").orderBy("doc_id")
    per = ensure_scan_parallelism(docs).select(
        "source",
        "lang",
        F.size(F.split(F.col("text"), r" ", -1)).alias("n_tokens"),
        pass_lang.alias("pass_lang"),
        pass_quality.alias("pass_quality"),
        (F.row_number().over(w) > 1).cast("int").alias("is_dup"),
    )
    return (
        per.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("pass_lang").cast("bigint").alias("pass_lang_docs"),
            F.sum("pass_quality").cast("bigint").alias("pass_quality_docs"),
            F.sum("is_dup").cast("bigint").alias("n_exact_dupes"),
        )
        .withColumn("dup_ppm", F.expr("n_exact_dupes * 1000000 DIV n_docs"))
    )


def kneser_ney_scores(
    docs: DataFrame, discount: float = 0.75, top_m: int = 4096
) -> DataFrame:
    """Per-document mean bigram NLL under an interpolated KNESER-NEY
    model (Kneser & Ney 1995; the smoothing KenLM — and therefore the
    CCNet quality stage — actually ships, completing this module's LM
    ladder: add-alpha unigram → add-alpha bigram → Stupid Backoff
    trigram → KN bigram):

        P(w2|w1) = max(c(w1w2) − D, 0)/c(w1) + λ(w1)·Pcont(w2)
        λ(w1)    = D·N1+(w1,·)/c(w1)
        Pcont(w2) = N1+(·,w2)/N1+(··)

    where the N1+ terms are DISTINCT-continuation counts — the KN
    insight that "york" is frequent but only ever follows "new", so
    its continuation probability should be tiny regardless of its raw
    count.  The c(w1w2) lookup table is pruned to ``top_m`` (the
    production KenLM prune; outside the table the max() term is 0 and
    the score is pure continuation mass), which is what keeps it
    broadcastable at a trillion-bigram corpus; the w1- and w2-keyed
    continuation tables are vocab-sized, same broadcast class as the
    unigram model.

    Arithmetic parity: every count entering P is an exact integer on
    both engines, so P is the same double; the per-pair NLL is rounded
    ONCE to integer micro-nats and bigint-summed per doc (order-free —
    stronger than the round-4 float avg the add-alpha bigram op uses),
    then ppl = exp of the integer mean.

    Distributed shape at 10^12 documents: bigram pairs built
    ROW-LOCALLY (sequence + element_at, no self-join); corpus-wide
    aggregations are the (w1,w2) count and the two vocab-keyed
    continuation counts; the scoring join broadcasts all three model
    tables plus the one-row N1+(··) total, so the trillion-pair side
    shuffles only for its own doc-keyed fold."""
    from .dedup import persist_tracked

    toks_arr = F.filter(F.split(F.lower("text"), " ", -1), lambda x: x != "")
    from .dedup import ensure_scan_parallelism

    base = ensure_scan_parallelism(docs).select("doc_id", toks_arr.alias("t"))
    # FAN-OUT ROOTS (r6): `pairs` feeds the model-table aggregations AND
    # the scoring join, and `bi_full` feeds FOUR derived tables (left,
    # right, nbt, pruned bi) — unpersisted, Catalyst re-executed the
    # scan + split + bigram explode once per reference (5 full corpus
    # passes measured in the r5 plan).  Persisting the two roots makes
    # it one pass + four reads of a vocab²-bounded table.
    # r6b note: an ml.feature.NGram + post-explode split form was TRIED
    # and measured 2.2x SLOWER (ABAB, sf1x) — struct HOF stays.
    pairs = persist_tracked(
        base.filter(F.size("t") >= 2).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        ).select("doc_id", "bg.w1", "bg.w2")
    )

    bi_full = persist_tracked(
        pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    )
    # left context table: raw count + distinct continuations of w1
    left = bi_full.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    # continuation table: distinct left-contexts of w2, + the global
    # distinct-bigram-type total as a one-row broadcast
    right = bi_full.groupBy("w2").agg(F.count("*").alias("n1p"))
    nbt = bi_full.agg(F.count("*").alias("nbt"))
    bi = (
        bi_full.orderBy(F.col("c12").desc(), "w1", "w2").limit(top_m)
    )

    d = float(discount)
    scored = (
        pairs.join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .join(F.broadcast(bi), ["w1", "w2"], "left")
        .crossJoin(F.broadcast(nbt))
        .select(
            "doc_id",
            F.round(
                -F.log(
                    F.greatest(
                        F.coalesce(F.col("c12"), F.lit(0)) - F.lit(d),
                        F.lit(0.0),
                    )
                    / F.col("c1")
                    + (F.lit(d) * F.col("n1f") / F.col("c1"))
                    * (F.col("n1p") / F.col("nbt"))
                )
                * F.lit(1_000_000.0),
                0,
            )
            .cast("bigint")
            .alias("nll_unats"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.expr("sum(nll_unats) DIV count(*)").alias("nll_unats"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "nll_unats",
            F.round(F.exp(F.col("nll_unats") / F.lit(1_000_000.0)), 4)
            .alias("ppl"),
        )
    )


def zipf_heaps_report(docs: DataFrame, top_k: int = 256) -> DataFrame:
    """One-row corpus-law diagnostics for the datasheet: the ZIPF
    rank-frequency slope (least-squares fit of ln(count) on ln(rank)
    over the top-``top_k`` tokens — natural language sits near −1;
    spam/template corpora and token salad drift far from it) and the
    HEAPS vocabulary-growth exponent (ln V / ln N — how fast new types
    appear; ~0.4-0.6 for natural text, →1 for gibberish).  Both are
    single numbers a release card quotes next to the per-source
    datasheet rows, and a cheap whole-corpus drift alarm between
    snapshots.

    (n_tokens, n_types, top_k, zipf_slope, heaps_exponent) — slope
    from the closed-form normal equation over exactly ``top_k`` rows
    selected by the deterministic (count desc, token) order; the
    regression sums run over a BOUNDED table so the plan's only
    corpus-wide stage is the token count aggregation (map-side
    combined).  Values are rounded to 4 places — the regression sums
    are O(top_k) doubles built from identical integer counts on both
    engines, so rounding absorbs association-order noise."""
    from .dedup import ensure_scan_parallelism, persist_tracked

    toks = F.explode(
        F.filter(F.split(F.lower("text"), " ", -1), lambda x: x != "")
    ).alias("tok")
    # counts feeds the totals AND the top-k regression — persist the
    # vocab-sized table so the corpus token explode runs once (r6)
    counts = persist_tracked(
        ensure_scan_parallelism(docs).select(toks)
        .groupBy("tok").agg(F.count("*").alias("c"))
    )
    totals = counts.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
    )
    from pyspark.sql import Window

    top = counts.orderBy(F.col("c").desc(), "tok").limit(top_k)
    ranked = top.select(
        F.log(F.row_number().over(
            Window.orderBy(F.col("c").desc(), "tok")
        ).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    reg = ranked.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return (
        reg.crossJoin(F.broadcast(totals))
        .select(
            "n_tokens",
            "n_types",
            F.col("k").cast("bigint").alias("top_k"),
            F.round(
                (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
                4,
            ).alias("zipf_slope"),
            F.round(
                F.log(F.col("n_types").cast("double"))
                / F.log(F.col("n_tokens").cast("double")),
                4,
            ).alias("heaps_exponent"),
        )
    )


def distinct_ngram_diversity(docs: DataFrame) -> DataFrame:
    """Corpus-level distinct-n diversity per source (the distinct-1 /
    distinct-2 metrics of Li et al. 2016, "A Diversity-Promoting
    Objective Function"): distinct n-grams over total n-grams, n=1,2.
    TTR (``type_token_ratio_stats``) is the per-DOCUMENT diversity
    gate; this is the per-SOURCE corpus view — a source whose pages are
    individually diverse but mutually templated (mirror farms, listing
    sites) shows high TTR yet low distinct-2, which is exactly the
    signal a mixing policy downweights.

    Same two-level agg shape as TTR so both shuffles partial-aggregate
    map-side: per-(source, n, gram) count, then per-(source, n) fold —
    never a countDistinct over the raw gram stream.  Ratios are exact
    integer ppm (``div(1e6·distinct, total)``), so the oracle compare
    is integer-exact.  At 10^12 tokens the exact distinct count is the
    one genuinely corpus-sized state here; the documented swap is
    approx_count_distinct (HLL) per (source, n) — one pass, no
    per-gram shuffle — once ±2% is acceptable."""
    from .dedup import ensure_scan_parallelism, persist_tracked

    toks = F.filter(F.split(F.lower("text"), " ", -1), lambda x: x != "")
    # the tokenized base feeds both n-gram orders — persist it so the
    # scan + lower + split chain runs once, not once per order (r6),
    # and repartition the degenerate scan first
    base = persist_tracked(
        # dispatch keyed by doc_id: `source` has a handful of distinct
        # values, which would collapse the repartition to as few slots
        ensure_scan_parallelism(docs).select("source", toks.alias("t"))
    )
    uni = base.select("source", F.lit(1).alias("n"),
                      F.explode("t").alias("gram"))
    # r6b note: an ml.feature.NGram form was TRIED and measured 2x
    # SLOWER here (ABAB, sf1x): at n=2 this HOF is two element_at +
    # one concat_ws — cheaper than the Scala-UDF string conversion.
    # NGram only wins for n >= 3 word-grams (see doc_shingles).
    bi = base.filter(F.size("t") >= 2).select(
        "source",
        F.lit(2).alias("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("gram"),
    )
    per = (
        uni.unionByName(bi)
        .groupBy("source", "n", "gram")
        .agg(F.count("*").alias("c"))
    )
    agg = per.groupBy("source", "n").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("distinct_grams"),
    )
    return agg.select(
        "source",
        F.col("n").cast("int").alias("n"),
        "total",
        "distinct_grams",
        F.expr("div(1000000 * distinct_grams, total)").alias("distinct_ppm"),
    )


def hill_tail_index(docs: DataFrame, ks: tuple = (16, 32, 64)) -> DataFrame:
    """Hill (1975) maximum-likelihood tail-index estimates of the
    DOCUMENT SIZE distribution — the skew audit that decides whether a
    corpus needs size-aware packing before partition sizes are chosen.
    For the top-k order statistics x_1 >= ... >= x_{k+1} of n_chars,
    alpha_k = k / sum_{i<=k} ln(x_i / x_{k+1}); alpha <= 2 means the
    size distribution has infinite variance (a handful of giant docs
    dominate every partition they land in — the straggler regime the
    extraction pipeline's giant-packing stage exists for), while large
    alpha means sizes are light-tailed and plain hash partitioning is
    safe.  Reported at several k because Hill plots (alpha vs k) are
    how the estimate's stability is judged in practice.

    (k, tail_cut, hill_alpha): tail_cut = x_{k+1}.  Deterministic —
    order statistics of integer sizes with (size desc, doc_id) ties;
    ln of an exact integer ratio rounds identically at 4 dp on both
    engines.

    Shape at 10^12 docs: ONE top-(max k + 1) aggregate (TakeOrdered —
    no full sort), then arithmetic over a <=65-row bounded frame; the
    k-grid expansion is a broadcast cross join against that bounded
    frame, never against the corpus."""
    from pyspark.sql import Window

    kmax = max(ks)
    top = (
        docs.select(F.col("n_chars").cast("double").alias("x"), "doc_id")
        .orderBy(F.col("x").desc(), "doc_id")
        .limit(kmax + 1)
    )
    ranked = top.select(
        "x",
        F.row_number()
        .over(Window.orderBy(F.col("x").desc(), "doc_id"))
        .alias("rk"),
    )
    kdf = docs.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    joined = F.broadcast(kdf).join(
        ranked, F.col("rk") <= F.col("k") + 1, "inner"
    )
    return (
        joined.groupBy("k")
        .agg(
            F.min(F.when(F.col("rk") == F.col("k") + 1, F.col("x"))).alias(
                "cut"
            ),
            F.sum(
                F.when(F.col("rk") <= F.col("k"), F.log(F.col("x")))
            ).alias("sum_log"),
        )
        .select(
            "k",
            F.col("cut").cast("bigint").alias("tail_cut"),
            F.round(
                F.col("k")
                / (F.col("sum_log") - F.col("k") * F.log(F.col("cut"))),
                4,
            ).alias("hill_alpha"),
        )
    )


def stopword_drift_regression(docs: DataFrame) -> DataFrame:
    """Per-source least-squares regression of the stopword ratio on
    document length (token count): (source, n_docs, slope_per_1k,
    intercept, pearson_r).  The drift detector behind a quality gate:
    a source whose stopword density FALLS as documents grow is
    accumulating boilerplate/listing tails (navigation, link farms,
    tables) that per-doc threshold filters miss until the docs are
    already long enough to dominate token counts — slope and r localize
    the problem to a source before anyone reads samples.

    x = n_tokens (exact integer in both engines), y = stop_hits /
    n_tokens (one integer division — bit-identical); the closed-form
    moments (covar_pop / var_pop / corr) are then rounded to 4 dp,
    absorbing association-order ulp noise.  slope is scaled per 1000
    tokens so the number is legible.

    Shape at 10^12 docs: one projection + one groupBy(source) with
    map-side-combined moment aggregates — the same cost as a count."""
    text = F.col("text")
    toks = F.split(text, r" ", -1)
    n_tokens = F.size(toks)
    spaced = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = sum(_count_occurrences(spaced, m) for m in EN_MARKERS)
    per = docs.select(
        "source",
        n_tokens.cast("double").alias("x"),
        (stop_hits.cast("double") / n_tokens).alias("y"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.lit(1000.0)
                * F.covar_pop("y", "x")
                / F.var_pop("x"),
                4,
            ).alias("slope_per_1k"),
            F.round(
                F.avg("y")
                - (F.covar_pop("y", "x") / F.var_pop("x")) * F.avg("x"),
                4,
            ).alias("intercept"),
            F.round(F.corr("x", "y"), 4).alias("pearson_r"),
        )
    )


def quality_threshold_budget(
    docs: DataFrame, keep_num: int = 3, keep_den: int = 5
) -> DataFrame:
    """Calibrate a quality gate to a RETENTION BUDGET: per source, the
    v1 composite-quality threshold that keeps ceil(keep_num/keep_den ·
    n) documents, plus how many docs a >=-threshold filter actually
    keeps.  Budgets, not thresholds, are what a corpus plan fixes
    ("keep the best 60% of each source"); because scores are rounded
    to 4 dp, TIES at the cut make a threshold filter overshoot the
    budget — `overshoot` is that audit, and a large value says the
    score needs more resolution before the gate is trustworthy.

    (source, n_docs, keep_budget, threshold_q, n_kept_by_threshold,
    overshoot).  keep_budget = ceil(keep_num·n/keep_den) via pure
    integer arithmetic — no float ceil to disagree across engines.

    Shape at 10^12 docs: one projection, one per-source rank window,
    one broadcast of the per-source thresholds (|sources| rows) back
    over the scored frame.  The documented scale swap for the window:
    histogram the 4-dp score space (10^4 buckets per source, one agg),
    take the threshold from cumulative bucket counts, exact because
    the score grid is finite."""
    from .cache import persist_tracked
    from pyspark.sql import Window

    text = F.col("text")
    n_chars = F.length(text)
    tokens = F.size(F.split(text, r" ", -1))
    spaced = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = sum(_count_occurrences(spaced, m) for m in EN_MARKERS)
    q = F.round(
        F.lit(0.4) * F.least(F.lit(1.0), n_chars / F.lit(500.0))
        + F.lit(0.3) * F.least(F.lit(1.0), stop_hits * F.lit(10.0) / tokens)
        + F.lit(0.3) * F.least(F.lit(1.0), (n_chars / tokens) / F.lit(8.0)),
        4,
    )
    scored = persist_tracked(docs.select("source", "doc_id", q.alias("q")))
    w = Window.partitionBy("source").orderBy(F.col("q").desc(), "doc_id")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    th = (
        scored.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "keep_budget",
            F.expr(f"div({keep_num} * n_docs + {keep_den} - 1, {keep_den})"),
        )
    )
    th = (
        ranked.join(F.broadcast(th), "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("keep_budget").alias("keep_budget"),
            F.min(
                F.when(F.col("rn") <= F.col("keep_budget"), F.col("q"))
            ).alias("threshold_q"),
        )
    )
    kept = (
        scored.join(F.broadcast(th.select("source", "threshold_q")), "source")
        .filter(F.col("q") >= F.col("threshold_q"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept_by_threshold"))
    )
    return (
        th.join(kept, "source")
        .select(
            "source",
            "n_docs",
            "keep_budget",
            "threshold_q",
            "n_kept_by_threshold",
            (F.col("n_kept_by_threshold") - F.col("keep_budget")).alias(
                "overshoot"
            ),
        )
    )


def source_js_divergence(docs: DataFrame) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source UNIGRAM
    DISTRIBUTIONS — the distributional twin of the shingle-overlap
    matrix: overlap asks "do these sources share content", JS asks "do
    they share a language model".  Two sources can share few exact
    shingles yet be distributionally identical (same template family,
    different entities) — the mixer should treat them as one domain
    for weighting even though dedup has nothing to collapse.

    (source_a, source_b, n_common_tokens, js_nats) with js in
    [0, ln 2]; identical distributions score 0.  Computed from the
    vocabulary INTERSECTION join plus the closed-form correction for
    one-sided tokens: for q=0, the pointwise term is p·ln 2, so
    js = Σ_∩ [½p·ln(2p/(p+q)) + ½q·ln(2q/(p+q))]
         + ½·ln 2 · [(1−Σ_∩ p) + (1−Σ_∩ q)].
    Pairs sharing NO vocabulary are omitted (their JS is exactly ln 2).

    Shape at 10^12 docs: one map-side-combined (source, token) count,
    a token-keyed self-join bounded by sources-per-token ≤ n_sources,
    one pair-keyed aggregate.  The token count frame is the same
    posting statistic the TF-IDF and vocab-coverage paths build."""
    from .cache import persist_tracked
    import math

    toks = F.explode(
        F.filter(F.split(F.lower("text"), " ", -1), lambda x: x != "")
    ).alias("tok")
    counts = docs.select("source", toks).groupBy("source", "tok").agg(
        F.count("*").alias("c")
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    dist = persist_tracked(
        counts.join(F.broadcast(totals), "source").select(
            "source", "tok", (F.col("c") / F.col("t")).alias("p")
        )
    )
    a, b = dist.alias("a"), dist.alias("b")
    p, q = F.col("a.p"), F.col("b.p")
    term = F.lit(0.5) * p * F.log(F.lit(2.0) * p / (p + q)) + F.lit(
        0.5
    ) * q * F.log(F.lit(2.0) * q / (p + q))
    ln2 = math.log(2.0)
    return (
        a.join(b, "tok")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count("*").alias("n_common_tokens"),
            F.round(
                F.sum(term)
                + F.lit(0.5 * ln2)
                * ((F.lit(1.0) - F.sum(p)) + (F.lit(1.0) - F.sum(q))),
                4,
            ).alias("js_nats"),
        )
    )
