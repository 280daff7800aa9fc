"""Deterministic sampling / splitting for training-data pipelines.

Random sampling is wrong at 10^12 docs: re-runs must select the SAME
rows (resume, reproducibility, train/val leakage audits), so selection
is a pure function of the stable document key — a portable md5 bucket,
never `rand()`.  Adding data never moves an existing doc between
splits (per-key hashing, not row-number partitioning), which is the
property leakage audits rely on.

All pure projections + one small aggregation; DuckDB oracles replay the
same md5 arithmetic bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import md5_56

N_BUCKETS = 100


def hash_bucket(col, n_buckets: int = N_BUCKETS):
    """Stable bucket 0..n-1 from the md5 of the key's string form."""
    return (md5_56(col.cast("string")) % n_buckets).cast("int")


def stratified_sample_stats(docs: DataFrame, pct: int = 20) -> DataFrame:
    """Per-source counts for a deterministic ``pct``% sample
    (bucket(doc_id) < pct) vs the full table — the sample-rate audit a
    pipeline runs before training on a subsample."""
    b = hash_bucket(F.col("doc_id"))
    return (
        docs.select("source", (b < pct).cast("int").alias("sampled"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("sampled").alias("n_sampled"),
            F.round(F.sum("sampled") / F.count("*"), 4).alias("sample_rate"),
        )
    )


def token_budget_sample_stats(
    docs: DataFrame, budget_tokens: int = 2000
) -> DataFrame:
    """Per-source TOKEN-budget sampling — the data-MIXING primitive
    ("take ~N tokens from each source for this training mix"):
    documents are ordered by (md5 hash of the key, key) — a
    reproducible pseudo-random order, not head-of-corpus bias — and
    selected while the running token total stays within the budget.

    Plan: one window (cumulative sum per source over the hash order) +
    one aggregation.  The source partitions shuffle once; a skewed
    giant source is the known hot key — mitigate with the salting
    pattern (demo_queries.salted_hot_key_agg) or per-source range
    partitioning when one source dominates the corpus.

    Selection is a prefix of a deterministic order, so re-runs pick the
    SAME documents; unlike per-key percentage sampling, ADDING data can
    displace previously selected docs near the budget boundary — use
    :func:`stratified_sample_stats` when per-key stability matters more
    than an exact token budget."""
    from pyspark.sql import Window

    n_tokens = F.size(F.split(F.col("text"), " ", -1))
    base = docs.select(
        "source", "doc_id", n_tokens.alias("n_tokens"),
        md5_56(F.col("doc_id").cast("string")).alias("hk"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    sel = (cum <= budget_tokens).cast("int")
    return (
        base.withColumn("selected", sel)
        .withColumn("sel_tokens", F.col("selected") * F.col("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("selected").alias("n_selected"),
            F.sum("sel_tokens").cast("bigint").alias("tokens_selected"),
        )
    )


def source_mixture_stats(
    docs: DataFrame, alpha: float = 0.7, budget_tokens: int = 100_000
) -> DataFrame:
    """Temperature-based source mixing — the multinomial-sampling
    weight table a multi-source pretraining run draws from (the
    α-smoothed mixture of mBERT/XLM-R and the Pile: w_i ∝ n_i^α,
    α < 1 upweights small sources; Conneau & Lample 2019 §3.1).

    Output per source: raw token count, mixture weight, the expected
    token draw under ``budget_tokens``, and ``epochs`` = expected/raw —
    the standard readout for how many times a small source repeats in
    the mix (epochs > 1 flags sources the budget forces to repeat).

    Plan: one partial-aggregated groupBy over (source) — a few hundred
    groups regardless of corpus size — then a scalar total joined back
    as a broadcast (crossJoin of one row).  Nothing here grows with the
    corpus except the first agg's map side."""
    n_tokens = F.size(F.split(F.col("text"), " ", -1))
    per_src = docs.select("source", n_tokens.alias("n")).groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_tokens")
    )
    weighted = per_src.select(
        "source", "n_tokens",
        F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)).alias("wraw"),
    )
    total = weighted.agg(F.sum("wraw").alias("wsum"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("wraw") / F.col("wsum"), 9).alias("weight"),
            F.floor(F.lit(float(budget_tokens)) * F.col("wraw") / F.col("wsum"))
            .cast("bigint")
            .alias("expected_tokens"),
            F.round(
                F.lit(float(budget_tokens)) * F.col("wraw") / F.col("wsum")
                / F.col("n_tokens"),
                6,
            ).alias("epochs"),
        )
    )


def train_val_split_stats(docs: DataFrame, val_pct: int = 10) -> DataFrame:
    """(split, n_docs, n_chars_total): deterministic train/val split by
    key hash.  Per-key assignment means adding documents never moves an
    existing one across the split boundary."""
    b = hash_bucket(F.col("doc_id"))
    split = F.when(b < val_pct, F.lit("val")).otherwise(F.lit("train"))
    return (
        docs.select(split.alias("split"), F.length("text").alias("n_chars"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )


def leakage_safe_split_stats(docs: DataFrame, val_pct: int = 30) -> DataFrame:
    """Train/val split keyed by the page's HOST, not the document:
    every page of a site lands on the SAME side, so near-duplicate
    pages (mirrors, templated site sections, syndicated articles from
    one domain) can never straddle the split — the leakage mode a
    doc_id-keyed split (:func:`train_val_split_stats`) cannot prevent
    and the one published eval-contamination audits flag first.

    Per (host, split): doc and char counts — host-level granularity so
    the disjointness property (each host on exactly one side) is
    directly visible in the output.  Shape at 10^12 docs: one
    projection + one groupBy on the host key (map-side combined; host
    cardinality ~10^8).  Same md5-bucket determinism contract as every
    split here: adding documents never moves a host across sides."""
    from .urlnorm import synthetic_raw_url
    from .webclean import host_of

    host = F.regexp_replace(
        host_of(synthetic_raw_url(F.col("doc_id"))), r"^www\.", ""
    )
    return (
        docs.select(host.alias("host"), F.length("text").alias("n_chars"))
        .withColumn(
            "split",
            F.when(hash_bucket(F.col("host")) < val_pct, F.lit("val"))
            .otherwise(F.lit("train")),
        )
        .groupBy("host", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        )
    )


def training_order(docs: DataFrame) -> DataFrame:
    """Deterministic GLOBAL training order with source interleaving:
    (ord, doc_id, source, round) — round r of the order takes at most
    one document from every source (round-robin), and within a source
    documents arrive in md5-hash order (a reproducible shuffle, not
    corpus order).  Epoch ordering is a real training lever: grouped
    same-source runs bias early optimization, and a re-run must
    produce the SAME order to resume mid-epoch.

    Scale shape: one window per source (rank within source — the only
    corpus shuffle) plus a BROADCAST join against the tiny distinct-
    source index.  ``ord`` is the closed form
    ``(round - 1) * n_sources + source_idx`` — strictly increasing,
    collision-free, computed WITHOUT a global row_number (an
    unpartitioned window is a one-task bottleneck at 10^12 rows).
    Uneven source sizes leave gaps in ``ord``; it is an ORDER key, not
    a dense index — writers sort by it and derive dense positions from
    (file, offset) at read time."""
    from pyspark.sql import Window

    base = docs.select(
        "doc_id", "source",
        md5_56(F.col("doc_id").cast("string")).alias("hk"),
    )
    src_w = Window.partitionBy("source").orderBy("hk", "doc_id")
    ranked = base.withColumn("round", F.row_number().over(src_w))

    sources = (
        docs.select("source").distinct()
        .withColumn(
            "src_idx",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy("source")
            ),
        )
    )
    n_sources = F.max("src_idx").over(
        Window.partitionBy(F.lit(1))
    )
    sources = sources.withColumn("n_sources", n_sources)

    return (
        ranked.join(F.broadcast(sources), "source")
        .select(
            (
                (F.col("round") - 1) * F.col("n_sources") + F.col("src_idx")
            ).cast("bigint").alias("ord"),
            "doc_id",
            "source",
            F.col("round").cast("bigint").alias("round"),
        )
    )


def sequence_pack_stats(docs: DataFrame, ctx_len: int = 64) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing (the C4/GPT training
    prep step: concatenate documents, split into fixed ``ctx_len``-token
    training sequences).  Documents concatenate per source in the
    deterministic (md5 hash, key) order — the same reproducible
    pseudo-random order :func:`token_budget_sample_stats` uses — and
    the report is per (source, chunk): how many documents contribute,
    how many tokens land in the chunk, and how many contributors
    carried over a chunk boundary (the fragmentation signal packing
    exists to manage).

    Plan: ONE per-source window (exclusive prefix sum of token counts)
    + a row-local chunk-span explode (a doc touches
    ceil(n_tokens/ctx_len)+1 chunks at most) + one (source, chunk) agg.
    No global single-task scan: the prefix sum partitions by source —
    for a single giant source, pre-shard by hash first (same caveat as
    token_budget_sample_stats)."""
    from pyspark.sql import Window

    n_tokens = F.size(F.split(F.col("text"), " ", -1))
    base = docs.select(
        "source", "doc_id", n_tokens.alias("n_tokens"),
        md5_56(F.col("doc_id").cast("string")).alias("hk"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    # div(): exact integer division — floor(double/) drifts past 2^53
    # cumulative tokens, i.e. exactly the corpus sizes packing targets
    spans = base.withColumn("start", start).select(
        "source", "start", "n_tokens",
        F.explode(
            F.sequence(
                F.expr(f"div(start, {ctx_len})"),
                F.expr(f"div(start + n_tokens - 1, {ctx_len})"),
            )
        ).alias("chunk_id"),
    )
    lo = F.greatest(F.col("start"), F.col("chunk_id") * ctx_len)
    hi = F.least(
        F.col("start") + F.col("n_tokens"),
        (F.col("chunk_id") + 1) * F.lit(ctx_len),
    )
    return (
        spans.withColumn("tok_in_chunk", hi - lo)
        .withColumn(
            "carried",
            (F.col("start") < F.col("chunk_id") * ctx_len).cast("int"),
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("tok_in_chunk").cast("bigint").alias("n_tokens"),
            F.sum("carried").cast("bigint").alias("n_carried"),
        )
    )


def sequence_pack_chunks(docs: DataFrame, ctx_len: int = 64) -> DataFrame:
    """MATERIALIZED sequence packing — the actual fixed-length training
    rows, not just the stats: concatenate documents per source in the
    deterministic (md5, key) order, cut at every ``ctx_len`` tokens,
    and emit one row per chunk with the md5 of its reconstructed token
    text, so the packed sequences themselves are byte-verified across
    engines (the oracle rebuilds every chunk and must hash identically).

    Plan: the same ONE per-source prefix-sum window + row-local span
    explode as :func:`sequence_pack_stats`; each doc contributes its
    token sub-slice ROW-LOCALLY (array slice, no token explode), and
    the chunk agg reassembles segments in start order inside the
    aggregate (sort_array over (start, segment) structs — bounded by
    docs-per-chunk, not corpus size).  One corpus-wide exchange on the
    chunk key; at 10^12 tokens this is the export job's exact shape,
    with the parquet/Iceberg writer hanging off the same frame."""
    toks_arr = F.filter(F.split(F.col("text"), " ", -1), lambda x: x != "")
    base = docs.select(
        "source", "doc_id", toks_arr.alias("toks"),
        md5_56(F.col("doc_id").cast("string")).alias("hk"),
    ).withColumn("n_tokens", F.size("toks")).filter(F.col("n_tokens") > 0)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    spans = base.withColumn("start", start).select(
        "source", "start", "n_tokens", "toks",
        F.explode(
            F.sequence(
                F.expr(f"div(start, {ctx_len})"),
                F.expr(f"div(start + n_tokens - 1, {ctx_len})"),
            )
        ).alias("chunk_id"),
    )
    lo = F.greatest(F.col("start"), F.col("chunk_id") * ctx_len)
    hi = F.least(
        F.col("start") + F.col("n_tokens"),
        (F.col("chunk_id") + 1) * F.lit(ctx_len),
    )
    seg = F.array_join(
        F.slice(
            "toks",
            (lo - F.col("start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ),
        " ",
    )
    segs = spans.select(
        "source", "chunk_id", "start", seg.alias("seg"),
        (hi - lo).alias("seg_tokens"),
    )
    assembled = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("start"), F.col("seg")))
            ),
            lambda x: x["seg"],
        ),
        " ",
    )
    return (
        segs.groupBy("source", "chunk_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("seg_tokens").cast("bigint").alias("n_tokens"),
            F.md5(assembled).alias("chunk_hash"),
        )
        .orderBy("source", "chunk_id")
    )


def context_windows(
    docs: DataFrame, ctx_len: int = 64, stride: int = 48
) -> DataFrame:
    """Per-document sliding context windows with overlap (the HF
    tokenizer ``return_overflowing_tokens``/``stride`` semantics):
    windows start at 0, stride, 2·stride, …; every window is ctx_len
    tokens except a shorter final one; consecutive windows overlap by
    ctx_len − stride tokens so no span longer than the overlap is ever
    split across windows unseen.  The within-document twin of
    :func:`sequence_pack_chunks` (which packs ACROSS documents and
    loses intra-doc locality) — fine-tuning and long-doc eval prep use
    this form.

    Shape at 10^12 docs: pure row-local arithmetic — one
    sequence/explode per doc (fan-out n_tokens/stride, bounded by the
    doc length cap upstream), ZERO shuffles.  Each window's token text
    is md5-digested so the oracle byte-verifies every window, not just
    the counts."""
    if stride <= 0 or stride > ctx_len:
        raise ValueError("0 < stride <= ctx_len required")
    toks_arr = F.filter(F.split(F.col("text"), " ", -1), lambda x: x != "")
    base = docs.select("doc_id", toks_arr.alias("toks")).withColumn(
        "n_tokens", F.size("toks").cast("bigint")
    ).filter(F.col("n_tokens") > 0)
    n_windows = F.when(F.col("n_tokens") <= ctx_len, F.lit(1)).otherwise(
        F.expr(f"div(n_tokens - {ctx_len} + {stride} - 1, {stride})") + 1
    )
    w = base.withColumn("n_windows", n_windows.cast("bigint")).select(
        "doc_id", "toks", "n_tokens", "n_windows",
        F.explode(F.sequence(F.lit(0), F.col("n_windows") - 1)).alias("widx"),
    )
    start = F.col("widx") * stride
    wlen = F.least(F.lit(ctx_len), F.col("n_tokens") - start)
    return w.select(
        "doc_id",
        F.col("widx").cast("bigint").alias("widx"),
        start.cast("bigint").alias("start"),
        wlen.cast("bigint").alias("win_tokens"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("toks"), start + 1, wlen)
            )
        ).alias("win_md5"),
    )


def shard_assignment_stats(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """Size-balanced output-shard assignment — the writer-side step
    that splits a cleaned corpus into N training shards of roughly
    equal BYTES (readers stream shards whole, so a fat shard is a
    straggler at training time exactly like a fat partition is here).

    Rule: rank documents by (bytes DESC, doc_id) and deal round-robin
    boustrophedon (serpentine: 0..N-1 then N-1..0) — the classic
    longest-processing-time heuristic's sortless cousin; serpentine
    assignment cancels the systematic bias plain round-robin has when
    sizes are sorted (shard 0 would get the largest doc of EVERY pass).
    Deterministic, one global rank over (bytes, id) pairs only — the
    text itself never shuffles; the verdict joins back by doc_id.

    Report per shard: n_docs, total_bytes, and the max/mean byte ratio
    ("balance"; 1.0 = perfect) replicated on every row for the gate.
    The global LPT rank is EXACT and distributed
    (:func:`rankutil.global_row_number`: range exchange → local rank →
    bounded offset join) — no single-partition window ever sees the
    corpus-sized (bytes, id) frame."""
    from .rankutil import global_row_number

    base = docs.select(
        "doc_id", F.length("text").cast("bigint").alias("n_bytes")
    )
    ranked_base = global_row_number(
        base, [F.col("n_bytes").desc(), F.col("doc_id").asc()], "_grank"
    )
    r0 = F.col("_grank") - 1  # 0-based LPT rank
    pass_idx = F.floor(r0 / n_shards)
    pos = r0 % n_shards
    shard = F.when(
        pass_idx % 2 == 0, pos
    ).otherwise(n_shards - 1 - pos).cast("int")
    per_shard = (
        ranked_base.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
    )
    balance = per_shard.agg(
        F.round(F.max("total_bytes") / F.avg("total_bytes"), 4).alias("balance")
    )
    return per_shard.crossJoin(F.broadcast(balance)).select(
        "shard", "n_docs", "total_bytes", "balance"
    )


def weighted_sample_topk(docs: DataFrame, k: int = 40) -> DataFrame:
    """Exact one-pass weighted sampling WITHOUT replacement of ``k``
    documents with inclusion probability proportional to token count —
    the Efraimidis–Spirakis (2006) A-ES reservoir, expressed as a
    distributed top-k instead of a sequential reservoir.

    Each doc gets key = ln(u) / w with u = (md5_56(doc_id)+1) / 2^56
    (a deterministic uniform in (0, 1] — same no-``rand()`` policy as
    every sampler here) and w = max(1, n_tokens); the k LARGEST keys
    are exactly an A-ES weighted sample.  Selection is
    ``orderBy(key desc).limit(k)`` — Spark plans TakeOrderedAndProject
    (per-partition top-k partials, bounded driver merge), so at 10^12
    docs this is ONE pass over a pure projection with no global sort
    and no corpus-sized window; the rank window then runs over ≤ k
    rows (:func:`rankutil.topk_with_rank`).

    Cross-engine determinism: u and key are a fixed chain of IEEE-754
    double ops on exact integers, so Spark and DuckDB compute
    bit-identical keys; the order (key desc, doc_id) is total.  The
    emitted key is rounded to 6 decimals for display only — ranking
    uses the exact value."""
    from .rankutil import topk_with_rank

    n_tokens = F.size(
        F.filter(F.split(F.lower("text"), " ", -1), lambda x: x != "")
    ).cast("bigint")
    w = F.greatest(F.lit(1).cast("bigint"), n_tokens)
    u = (md5_56(F.col("doc_id").cast("string")) + 1) / F.lit(
        float(1 << 56)
    )
    keyed = docs.select(
        "doc_id",
        "source",
        w.alias("weight"),
        (F.log(u) / w).alias("es_key"),
    )
    top = topk_with_rank(
        keyed,
        [F.col("es_key").desc(), F.col("doc_id")],
        k,
        "sel_rank",
        rank_type="bigint",
    )
    return top.select(
        "doc_id", "source", "weight", "sel_rank",
        F.round("es_key", 6).alias("es_key_r"),
    ).orderBy("sel_rank")


def unimax_budgets(docs: DataFrame, budget_num: int = 4,
                   budget_den: int = 5, max_epochs: int = 1) -> DataFrame:
    """UNIMAX per-language token budgets (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): allocate a total token budget across
    languages as uniformly as possible, capping each language at
    ``max_epochs`` passes over its available data — the closed-form
    waterfill that replaced temperature sampling in public multilingual
    recipes.

    Greedy over languages in ascending cap order: a language whose cap
    fits under the current even share takes its cap; the first language
    whose cap exceeds the share tips ALL remaining languages into the
    even-share regime (ascending caps make the capped set a prefix).

    Exact integer arithmetic end-to-end: token counts and caps are
    bigint, the waterfill comparison ``cap·(n−j+1) ≤ B − Σ_prev`` is
    integer, and the share region distributes ``R DIV m`` with the
    ``R MOD m`` remainder given to the first ``R MOD m`` languages of
    the region (deterministic order) — budgets SUM EXACTLY to
    min(B, Σ caps) and both engines agree bit-for-bit.

    Per language: (lang, available_tokens, cap_tokens, budget_tokens,
    epochs_ppm).  The budget B is ``budget_num/budget_den`` of total
    available tokens (computed from the data, so the demo is
    deterministic at any SF).

    Shape at 10^12 docs: ONE lang-keyed map-side-combined aggregation
    over the corpus; everything after runs on the ≤ O(100)-row language
    table (the single-partition windows are bounded by design — this is
    the one table where a global window is correct)."""
    from pyspark.sql import Window

    tokens = F.size(F.split(F.col("text"), " ", -1)).cast("bigint")
    by_lang = docs.select(F.col("lang"), tokens.alias("t")).groupBy("lang").agg(
        F.sum("t").alias("available_tokens")
    )
    cap = (F.col("available_tokens") * max_epochs).alias("cap_tokens")
    langs = by_lang.select("lang", "available_tokens", cap)
    w = Window.orderBy("cap_tokens", "lang")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    annotated = langs.select(
        "lang",
        "available_tokens",
        "cap_tokens",
        F.row_number().over(w).alias("j"),
        F.coalesce(F.sum("cap_tokens").over(wprev), F.lit(0).cast("bigint")).alias(
            "cum_prev"
        ),
        F.count("*").over(wall).alias("n_langs"),
        (F.sum("available_tokens").over(wall) * budget_num).alias(
            "budget_scaled"
        ),
    ).withColumn(
        "budget_total", F.expr(f"budget_scaled DIV {budget_den}")
    ).withColumn(
        "fails",
        F.col("cap_tokens") * (F.col("n_langs") - F.col("j") + 1)
        > F.col("budget_total") - F.col("cum_prev"),
    )
    first_fail = F.min(F.when(F.col("fails"), F.col("j"))).over(wall)
    # share region: R tokens over m languages, remainder to the first
    # R MOD m of them in (cap, lang) order
    ff = annotated.withColumn("first_fail", first_fail).withColumn(
        "cum_at_ff",
        F.max(
            F.when(F.col("j") == F.col("first_fail"), F.col("cum_prev"))
        ).over(wall),
    )
    r_tokens = F.col("budget_total") - F.col("cum_at_ff")
    m_langs = F.col("n_langs") - F.col("first_fail") + 1
    share_rank = F.col("j") - F.col("first_fail") + 1
    # integer division only: double division truncated via cast loses
    # exactness past 2^53 — DIV keeps the arithmetic bigint end-to-end
    budget = F.when(
        F.col("first_fail").isNull() | (F.col("j") < F.col("first_fail")),
        F.col("cap_tokens"),
    ).otherwise(
        F.expr("(budget_total - cum_at_ff) DIV (n_langs - first_fail + 1)")
        + (share_rank <= r_tokens % m_langs).cast("bigint")
    )
    return ff.withColumn("budget_tokens", budget).select(
        "lang",
        "available_tokens",
        "cap_tokens",
        "budget_tokens",
        F.expr("budget_tokens * 1000000 DIV available_tokens").alias(
            "epochs_ppm"
        ),
    )


def doremi_weights(
    docs: DataFrame, eta: float = 1.0, smooth_ppm: int = 10_000
) -> DataFrame:
    """DoReMi domain-weight update (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    one exponentiated-gradient step over per-domain EXCESS LOSS,
    producing the next-round sampling mixture — the third public
    mixing recipe this module covers, beside temperature mixing
    (:func:`source_mixture_stats`, w ∝ n^α) and the UNIMAX waterfill
    (:func:`unimax_budgets`).

    DoReMi's excess loss is ℓ_proxy − ℓ_ref per domain.  Without a
    trained proxy model in this sandbox the same quantity exists in
    closed form over unigram LMs: cross-entropy of the domain's tokens
    under the CORPUS unigram LM minus cross-entropy under the domain's
    OWN unigram LM = KL(domain ‖ corpus) ≥ 0 — exactly "how much worse
    the shared reference model fits this domain than a domain-fitted
    one", which is the signal DoReMi's EG step consumes.  Domains that
    diverge from the corpus average get up-weighted.

    Arithmetic discipline (Spark ≡ DuckDB bit-for-bit): every
    per-(domain, token) KL contribution ``cnt·(ln p_s − ln p)`` is
    rounded ONCE to integer micro-nats and bigint-summed (order-free,
    exact — the dsir.py pattern); the per-token KL is an integer
    ``DIV``; only the final exp/normalize runs in doubles, computed
    from identical integers on both engines and rounded to 9 places.

    EG step: α'_s ∝ α⁰_s · exp(η · KL_s) with α⁰_s = token share, then
    the paper's uniform smoothing α_s = (1−c)·α'_s + c/k
    (``smooth_ppm`` = c in parts-per-million, default 1%).

    Distributed shape at 10^12 documents: ONE corpus-wide shuffle — the
    (source, token) aggregation (map-side combined; same profile as the
    unigram-LM quality ops in textstats.py).  Everything after runs on
    vocabulary-sized aggregates: the token-marginal table joins back
    token-keyed (two vocab-sized sides, corpus-row-independent), and
    the per-domain table is O(#sources) rows where single-partition
    math is correct by design."""
    from .dedup import ensure_scan_parallelism, persist_tracked

    toks = F.expr("filter(split(lower(text), ' ', -1), t -> t <> '')")
    # r6b: `st` fans out to THREE references (token marginal, source
    # totals, KL contributions) — unpersisted, Catalyst re-ran the
    # corpus explode+aggregate once per reference; persisted it is one
    # pass over a vocab×sources-bounded table.  The dispatch keys the
    # degenerate-scan repartition by doc_id (source is low-cardinality).
    st = persist_tracked(
        ensure_scan_parallelism(docs)
        .select(F.col("source"), F.explode(toks).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("cnt"))
    )
    tok_marg = st.groupBy("token").agg(F.sum("cnt").alias("cnt_t"))
    src_tot = st.groupBy("source").agg(F.sum("cnt").alias("t_s"))
    grand = src_tot.agg(F.sum("t_s").alias("t_all"))
    contrib = (
        st.join(tok_marg, "token")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "t_s",
            F.round(
                F.col("cnt")
                * (
                    F.log(F.col("cnt") / F.col("t_s"))
                    - F.log(F.col("cnt_t") / F.col("t_all"))
                )
                * F.lit(1_000_000.0),
                0,
            )
            .cast("bigint")
            .alias("kl_part_unats"),
        )
    )
    per_src = contrib.groupBy("source", "t_s").agg(
        F.sum("kl_part_unats").alias("kl_scaled")
    ).select(
        "source",
        F.col("t_s").alias("n_tokens"),
        # clamp BEFORE the integer division: KL >= 0 mathematically but
        # per-term rounding can leave the scaled sum marginally
        # negative, and Spark's DIV truncates toward zero while
        # DuckDB's // floors — nonneg operands make the engines agree
        F.expr("greatest(kl_scaled, CAST(0 AS bigint)) DIV t_s").alias(
            "kl_unats"
        ),
    )
    # O(#sources) rows from here down — broadcast scalar joins only
    tot2 = per_src.agg(
        F.sum("n_tokens").alias("t_all"), F.count("*").alias("k")
    )
    raw = per_src.crossJoin(F.broadcast(tot2)).select(
        "source",
        "n_tokens",
        "kl_unats",
        "t_all",
        "k",
        (
            (F.col("n_tokens") / F.col("t_all"))
            * F.exp(F.lit(eta) * F.col("kl_unats") / F.lit(1_000_000.0))
        ).alias("a_raw"),
    )
    z = raw.agg(F.sum("a_raw").alias("z"))
    c = smooth_ppm / 1_000_000.0
    return raw.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        "kl_unats",
        F.round(F.col("n_tokens") / F.col("t_all"), 9).alias("alpha0"),
        F.round(F.col("a_raw") / F.col("z"), 9).alias("alpha_eg"),
        F.round(
            F.lit(1.0 - c) * F.col("a_raw") / F.col("z")
            + F.lit(c) / F.col("k"),
            9,
        ).alias("alpha_smoothed"),
    )


# fixed seqlen ladder — the public bucketed-batching practice pads each
# example to the smallest ladder rung that fits (fairseq/T5-style
# length-bucketed batching); a CASE chain over literals is portable to
# any engine, unlike next-pow2 bit tricks whose zero-padding semantics
# differ between Spark bin() and DuckDB bin()
SEQLEN_LADDER = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def length_bucket_batch_stats(
    docs: DataFrame, batch_size: int = 8
) -> DataFrame:
    """Length-bucketed batching profile — the OTHER public answer to
    variable-length training examples, beside the concat-and-chunk
    packing already covered by :func:`sequence_pack_stats`: pad each
    document up to the smallest rung of the fixed :data:`SEQLEN_LADDER`
    that fits, batch within a rung, and account for the padding the
    ladder wastes (packing wastes nothing but splits documents;
    bucketed padding keeps documents intact but burns pad tokens — this
    report is the input to that trade-off decision).

    Per rung: (bucket_cap, n_docs, n_batches, sum_tokens, pad_tokens,
    pad_ppm) with n_batches = ⌈n_docs / batch_size⌉ in closed form —
    batch membership within a rung is deterministic by construction
    (any stable order deals identical batch COUNTS and identical
    per-rung padding, because every doc in a rung pads to the same
    cap), so no window function is needed at any scale.  Documents
    longer than the top rung are TRUNCATED to it, the standard
    practice, and report zero padding for the truncated part.

    Distributed shape at 10^12 documents: one row-local token count +
    CASE projection, then ONE bucket-keyed aggregation with at most
    ``len(SEQLEN_LADDER)`` groups — map-side combine does nearly all
    the work; no shuffle grows with the corpus.  All arithmetic is
    bigint (pad_ppm via integer DIV), exact on both engines."""
    t = F.size(F.expr("filter(split(lower(text), ' ', -1), t -> t <> '')"))
    cap_expr = F.lit(SEQLEN_LADDER[-1])
    for rung in reversed(SEQLEN_LADDER):
        cap_expr = F.when(t <= rung, F.lit(rung)).otherwise(cap_expr)
    per_doc = docs.select(
        cap_expr.cast("bigint").alias("bucket_cap"),
        F.least(t, F.lit(SEQLEN_LADDER[-1])).cast("bigint").alias("used"),
    )
    return (
        per_doc.groupBy("bucket_cap")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("used").alias("sum_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            F.expr(f"(n_docs + {batch_size} - 1) DIV {batch_size}").alias(
                "n_batches"
            ),
            "sum_tokens",
            (F.col("bucket_cap") * F.col("n_docs") - F.col("sum_tokens"))
            .alias("pad_tokens"),
            F.expr(
                "(bucket_cap * n_docs - sum_tokens) * 1000000"
                " DIV (bucket_cap * n_docs)"
            ).alias("pad_ppm"),
        )
    )


# row-local span-corruption mask arithmetic (T5-style); {p} = span
# start period, {L} = span length.  starts/masked are 0/1 int arrays;
# every guard exists because sequence(1, 0) DESCENDS in Spark while
# the oracle's generate_series(1, 0) is empty
_SPAN_STARTS = """
CASE WHEN size(__toks) >= 1 THEN
  transform(sequence(1, size(__toks)),
            i -> IF(cast(conv(substring(md5(concat(cast(doc_id AS string),
                                                   ':', cast(i AS string))),
                              1, 14), 16, 10) AS bigint) % {p} = 0, 1, 0))
ELSE array() END
"""
_SPAN_MASKED = """
CASE WHEN size(__starts) >= 1 THEN
  transform(sequence(1, size(__starts)),
            i -> IF(exists(sequence(greatest(1, i - {Lm1}), i),
                           j -> element_at(__starts, j) = 1), 1, 0))
ELSE array() END
"""


def span_corruption_stats(
    docs: DataFrame, span_period: int = 7, span_len: int = 3
) -> DataFrame:
    """Span-corruption masking profile (the T5 denoising objective,
    Raffel 2020 §3.1.4): deterministic span starts — token position i
    opens a span iff md5_56(doc_id ':' i) % span_period == 0, the
    hash-as-randomness discipline every sampler in this module uses
    instead of rand() — each span masks ``span_len`` tokens, and
    overlapping or adjacent spans MERGE into one sentinel (exactly the
    T5 rule that consecutive corrupted tokens share a sentinel).  The
    report per document: how many sentinels the example will carry and
    the realized corruption rate, the two numbers that size
    encoder/decoder lengths when preparing a denoising dataset (the
    expected rate is span_len/span_period ≈ 43% here at defaults;
    merging pulls the realized rate below it).

    (doc_id, n_tokens, n_spans, masked_tokens, masked_ppm) with
    n_spans = count of maximal masked runs (mask rises 0→1) and
    masked_ppm an integer DIV — everything from the hash decision down
    is 0/1 integer arithmetic, bit-identical on both engines.

    Distributed shape at 10^12 documents: entirely ROW-LOCAL (split +
    nested HOFs over the token index — no UDF, no shuffle of any
    kind); the output is a pure projection of the corpus."""
    from .dedup import ensure_scan_parallelism

    toks = F.expr("filter(split(text, ' ', -1), t -> t <> '')")
    # per-position md5 HOFs over a 2-row-group scan would run on 2 cores
    base = ensure_scan_parallelism(docs).select("doc_id", toks.alias("__toks"))
    with_starts = base.select(
        "doc_id",
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.expr(_SPAN_STARTS.format(p=span_period)).alias("__starts"),
    )
    with_mask = with_starts.select(
        "doc_id",
        "n_tokens",
        F.expr(_SPAN_MASKED.format(Lm1=span_len - 1)).alias("__masked"),
    )
    return with_mask.select(
        "doc_id",
        "n_tokens",
        # the n_tokens >= 1 guard matters twice over: sequence(1, 0)
        # DESCENDS in Spark ([1, 0]) and ANSI element_at throws on both
        # index 0 and out-of-range probes into the empty __masked array
        F.expr(
            "CASE WHEN n_tokens >= 1 THEN"
            " cast(size(filter(sequence(1, cast(n_tokens AS int)),"
            " i -> element_at(__masked, i) = 1"
            " AND (i = 1 OR element_at(__masked, i - 1) = 0))) AS bigint)"
            " ELSE cast(0 AS bigint) END"
        ).alias("n_spans"),
        F.expr(
            "cast(aggregate(__masked, 0, (acc, x) -> acc + x) AS bigint)"
        ).alias("masked_tokens"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "masked_tokens",
        F.when(F.col("n_tokens") > 0,
               F.expr("masked_tokens * 1000000 DIV n_tokens"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("masked_ppm"),
    )


def repeat_decay_value(
    docs: DataFrame, repeats: tuple = (0, 1, 3, 7, 15, 31),
    r_star: float = 15.4,
) -> DataFrame:
    """Data-constrained repeat-epoch value (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): repeated epochs over
    the same tokens decay in value — the paper's fit gives effective
    data D' = U · (1 + R*·(1 − exp(−R/R*))) for U unique tokens read
    1+R times, with R* ≈ 15.4.  This is the planning row that answers
    "is epoch 8 over source X worth the compute, or should the budget
    buy more crawl?" — the decision UNIMAX makes with a hard epoch cap
    and DoReMi with a loss signal, here priced by the published decay
    law itself.

    Per (source, epochs = 1+R): (source, epochs, unique_tokens,
    effective_tokens, utility) where utility = effective / (epochs·U),
    the fraction of naively-counted tokens that still teach anything.

    Determinism: U is an exact integer count; the decay multiplier is
    rounded to 4 dp BEFORE scaling by U, so both engines multiply
    identical operands.  Shape at 10^12 docs: one map-side-combined
    groupBy(source) + a broadcast cross join against the bounded
    epoch grid."""
    toks = F.size(F.split(F.col("text"), " ", -1))
    per = docs.groupBy("source").agg(
        F.sum(toks).cast("bigint").alias("unique_tokens")
    )
    grid = docs.sparkSession.createDataFrame(
        [(r,) for r in repeats], "repeats int"
    )
    mult = F.round(
        F.lit(1.0)
        + F.lit(r_star)
        * (F.lit(1.0) - F.exp(-F.col("repeats") / F.lit(r_star))),
        4,
    )
    return (
        per.crossJoin(F.broadcast(grid))
        .withColumn("epochs", (F.col("repeats") + 1).cast("int"))
        .withColumn("mult", mult)
        .select(
            "source",
            "epochs",
            "unique_tokens",
            F.round(F.col("unique_tokens") * F.col("mult"), 2).alias(
                "effective_tokens"
            ),
            F.round(
                F.col("mult") / F.col("epochs"), 4
            ).alias("utility"),
        )
    )
