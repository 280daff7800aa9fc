"""Crawl-lifecycle operators: the steps between "a crawler wrote WARCs"
and "the corpus is ready for cleaning" on a Common-Crawl-style table of
``(url, warc_ts, html, text, lang)`` pages.

Three operators, each oracle-gated:

- :func:`latest_snapshot` — cross-snapshot url dedup: the same page is
  captured in many crawl snapshots (often under trivially different
  urls); keep the LATEST capture per canonical url.  One window over
  the canonical-url key — the same shuffle profile as exact dedup.
- :func:`link_pagerank` — damped PageRank over a link graph, the
  public web-scale quality/centrality signal (Brin & Page 1998;
  Common Crawl publishes domain-level centrality ranks).  Fixed
  iteration count so the DuckDB oracle can unroll the same rounds.
- :func:`bloom_incremental_dedup` — incremental-ingest dedup: probe a
  new crawl batch against a Bloom filter (Bloom 1970) built from the
  ALREADY-INGESTED corpus.  The filter is m bits regardless of corpus
  size, so it broadcasts to every executor and the trillion-row new
  batch is gated in a ZERO-SHUFFLE map stage; only flagged docs pay
  the exact-verification join.

Portability: every hash is the md5-derived 56-bit integer
(training/hashing.py), every arithmetic step is integer mod — the
DuckDB oracles reproduce each bit, including the Bloom filter's false
positives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_56
from .urlnorm import canonicalize_url

# ---------------------------------------------------------------------------
# cross-snapshot keep-latest
# ---------------------------------------------------------------------------


def synthetic_snapshots(docs: DataFrame) -> DataFrame:
    """Deterministic (doc_id, raw_url, warc_ts) recrawl fixture: groups
    of up to 4 consecutive doc_ids are captures of ONE page, each
    capture carrying a different utm_source (so only canonicalization
    reveals they are the same url) and a later warc_ts."""
    d = F.col("doc_id")
    page = (d / 4).cast("bigint")  # page key: 4 captures per page
    cap = d % 4  # capture index within the page
    raw = F.format_string(
        "HTTPS://WWW.Site%d.Example.COM:443/page/%d/?utm_source=snap%d&v=1",
        page % 13,
        page,
        cap,
    )
    ts = F.expr(
        "timestamp'2024-01-01 00:00:00' "
        "+ make_interval(0, 0, 0, cast(doc_id % 4 as int), 0, "
        "cast(doc_id % 7 as int), 0)"
    )
    return docs.select(
        "doc_id", raw.alias("raw_url"), ts.alias("warc_ts")
    )


def latest_snapshot(docs: DataFrame) -> DataFrame:
    """Per-capture verdict ``(doc_id, canonical_url, warc_ts,
    n_captures, is_latest)``: the latest ``warc_ts`` per CANONICAL url
    wins (ties to the higher doc_id — a deterministic total order).

    Scale shape: one projection (canonicalization is shuffle-free) +
    ONE window over the canonical-url key.  At 10^12 pages this is the
    same cost as exact dedup; AQE skew-join/salting notes for hot urls
    (a template page captured in every snapshot) apply unchanged."""
    snaps = synthetic_snapshots(docs).withColumn(
        "canonical_url", canonicalize_url(F.col("raw_url"))
    )
    w = Window.partitionBy("canonical_url").orderBy(
        F.col("warc_ts").desc(), F.col("doc_id").desc()
    )
    return snaps.select(
        "doc_id",
        "canonical_url",
        "warc_ts",
        F.count("*").over(Window.partitionBy("canonical_url")).alias(
            "n_captures"
        ),
        (F.row_number().over(w) == 1).cast("int").alias("is_latest"),
    )


# ---------------------------------------------------------------------------
# link-graph PageRank
# ---------------------------------------------------------------------------


def synthetic_link_edges(docs: DataFrame, n_docs: int) -> DataFrame:
    """Deterministic (src, dst) link graph over the doc ids: every page
    links to three arithmetic neighbors, except every 10th page which
    is DANGLING (no out-links — the case that breaks naive PageRank).
    Self-loops dropped, parallel edges deduped."""
    d = F.col("doc_id")
    dsts = F.array(
        (d * 7 + 1) % n_docs, (d * 13 + 3) % n_docs, (d * 31 + 5) % n_docs
    )
    return (
        docs.select(d.alias("src"), F.explode(dsts).alias("dst"))
        .filter((F.col("src") % 10 != 0) & (F.col("src") != F.col("dst")))
        .distinct()
    )


def link_pagerank(
    docs: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    top_k: int = 20,
) -> DataFrame:
    """Top-k pages by damped PageRank after a FIXED number of power
    iterations, dangling mass redistributed uniformly:

        pr'(v) = (1-d)/n + d * (Σ_{u→v} pr(u)/outdeg(u) + dangling/n)

    Distributed shape per iteration: one edges⋈ranks join + one
    groupBy(dst) sum (partial aggregation map-side), plus a ONE-ROW
    dangling-mass aggregate that re-enters via a broadcast cross join —
    no driver-side collect anywhere, so the loop is K bounded shuffle
    rounds on the edge key, the standard Pregel cost shape.  The edge
    and out-degree frames are computed once and persisted.  Fixed
    ``iters`` keeps the oracle expressible as unrolled SQL; production
    runs iterate to an L1 fixpoint probe instead (same rounds).

    Output ranks are scaled by n (so a uniform-rank page scores 1.0)
    and rounded; the top-k sort runs on the ROUNDED rank in both
    engines so float summation order can never flip boundary
    membership."""
    from .cache import persist_tracked

    n_docs = docs.count()  # one bounded job; the oracle's COUNT(*) twin
    ids = docs.select("doc_id")
    # persist_tracked (not a manual unpersist before the action): the
    # whole loop materializes at the FINAL action, so the edge cache
    # must outlive this function's return (harness releases)
    edges = persist_tracked(synthetic_link_edges(docs, n_docs))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # nodes with no out-links: their whole rank is dangling mass
    dangling = ids.join(
        edges.select("src").distinct(),
        ids["doc_id"] == F.col("src"),
        "left_anti",
    ).select("doc_id")

    ranks = ids.select("doc_id", F.lit(1.0 / n_docs).alias("pr"))
    for _ in range(iters):
        dmass = dangling.join(ranks, "doc_id").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dmass")
        )
        contribs = (
            edges.join(
                ranks.withColumnRenamed("doc_id", "src"), "src"
            )
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("doc_id"),
                (F.col("pr") / F.col("outdeg")).alias("c"),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ids.join(contribs, "doc_id", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "doc_id",
                (
                    F.lit((1.0 - damping) / n_docs)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dmass") / n_docs
                    )
                ).alias("pr"),
            )
        )
        # ranks is referenced TWICE next round (dmass + contribs): a
        # per-round persist stops the 2x recompute per reference while
        # costing one lazy Py4J call — localCheckpoint (even lazy)
        # pays a full synchronous analyze/optimize/physical-plan round
        # trip PER ROUND at build time (~1.4 s each, measured).  With
        # fixed iters=3 the un-truncated logical plan is 2^3 bounded;
        # a fixpoint-probe production run (large iters) would add a
        # checkpoint every ~5 rounds to re-truncate lineage.
        ranks = persist_tracked(ranks)
    scaled = ranks.select(
        "doc_id", F.round(F.col("pr") * n_docs, 8).alias("rank_x_n")
    )
    return scaled.orderBy(F.col("rank_x_n").desc(), "doc_id").limit(top_k)


# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup
# ---------------------------------------------------------------------------

# Demo operating point: sized so the sf0.01 fixture (500 prior docs ×
# 3 probes → ~52% fill) produces a MEASURABLE false-positive band
# (~14% of novel docs) that the oracle reproduces bit-for-bit.
# Production sizing is the standard Bloom rule — m ≈ 10 bits per prior
# key gives ~1% FP at k=3; the filter stays a broadcastable constant
# because m is chosen, not data-driven.
BLOOM_M = 2048  # bits
BLOOM_K = 3  # hash probes per document


def _bloom_positions(text_col, k: int = BLOOM_K, m: int = BLOOM_M):
    """The k bit positions of a text under the portable Bloom hash
    family: position_j = md5_56('b{j}:' || text) mod m."""
    return [
        F.pmod(md5_56(F.concat(F.lit(f"b{j}:"), text_col)), F.lit(m))
        for j in range(k)
    ]


def bloom_bit_positions(prior: DataFrame, text_col: str = "text") -> list[int]:
    """The SET bits of the Bloom filter over the prior corpus — at most
    BLOOM_M integers whatever the corpus size, which is the whole point:
    this is the collect that is ALWAYS bounded (it is the filter), so it
    can be broadcast into a literal predicate on any cluster."""
    t = F.col(text_col)
    pos = prior.select(
        F.explode(F.array(*_bloom_positions(t))).alias("p")
    ).distinct()
    return sorted(r["p"] for r in pos.collect())


def bloom_incremental_dedup(docs: DataFrame) -> DataFrame:
    """Incremental-ingest dedup verdict for a new crawl batch against
    an already-ingested corpus, per new document:

        (doc_id, source, bloom_maybe_dup, verified_dup, false_positive)

    Fixture: the PRIOR corpus is the documents table itself; the new
    batch is a deterministic recrawl where every 4th page carries the
    SAME text as a prior page (a true incremental dup) and the rest
    carry novel text.  The prior corpus is folded into an m-bit Bloom
    filter (m=2048, k=3, md5-derived positions); the new batch probes
    it with ``isin`` against the set-bit literal — Catalyst compiles a
    >10-element list to an InSet hash probe, so the gate is O(1)/row,
    pure JVM, and ZERO-shuffle (the plan gate pins this).  Flagged docs
    are then exact-verified by content-hash against the prior corpus
    (broadcast join here; on a 10^12-doc prior this join runs
    shuffle-side but only the Bloom-flagged sliver of the batch pays
    it).  ``false_positive`` rows measure the filter's actual FP rate —
    the oracle reproduces them bit-for-bit."""
    prior = docs
    new = docs.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 4 == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit(" fresh "),
                F.col("doc_id").cast("string"),
            )
        )
        .alias("text"),
    )
    bits = bloom_bit_positions(prior)
    t = F.col("text")
    probes = _bloom_positions(t)
    # r6: ship the filter as ONE m-slot 0/1 mask-array literal probed
    # with element_at — O(1) per probe like the InSet hash, but the plan
    # carries a single 2048-element literal instead of three up-to-2048
    # literal IN lists (the r5 form's ~6k-literal predicate dominated
    # analysis/codegen time at this query's size — a constant cost paid
    # per run).  p ∈ bits ⟺ mask[p] = 1, value-identical.
    bitset = set(bits)
    # one Py4J call for the whole mask literal (BLOOM_M F.lit calls
    # cost ~1 s of driver time per build)
    mask = F.lit([1 if i in bitset else 0 for i in range(BLOOM_M)])
    maybe = F.element_at(mask, (probes[0] + 1).cast("int")) == 1
    for p in probes[1:]:
        maybe = maybe & (F.element_at(mask, (p + 1).cast("int")) == 1)
    prior_hashes = F.broadcast(
        prior.select(md5_56(t).alias("h")).distinct()
    )
    flagged = new.select(
        "doc_id",
        "source",
        maybe.cast("int").alias("bloom_maybe_dup"),
        md5_56(t).alias("h"),
    )
    return (
        flagged.join(prior_hashes.withColumn("in_prior", F.lit(1)), "h", "left")
        .select(
            "doc_id",
            "source",
            "bloom_maybe_dup",
            (
                (F.col("bloom_maybe_dup") == 1)
                & F.col("in_prior").isNotNull()
            ).cast("int").alias("verified_dup"),
            (
                (F.col("bloom_maybe_dup") == 1) & F.col("in_prior").isNull()
            ).cast("int").alias("false_positive"),
        )
    )


def anchor_text_stats(docs: DataFrame, anchor_tokens: int = 3) -> DataFrame:
    """Anchor-text aggregation — the classic web-corpus signal of what
    OTHER pages say about a page (in-link anchor text, used for search
    indexing and WebText-style quality weighting): per destination
    page, count in-links, count distinct anchor strings, and pick the
    majority anchor (count desc, anchor asc — deterministic).

    Anchors synthesize deterministically as the first ``anchor_tokens``
    tokens of the linking page's text over the same
    :func:`synthetic_link_edges` graph link_pagerank uses, so the
    DuckDB oracle replays every byte.

    Plan: edges are a row-local explode; ONE edges⋈docs join on the
    src doc key, one (dst, anchor) partial agg, one per-dst window for
    the majority pick — no per-dst collect_list, so a celebrity page
    with 10^9 in-links stays a big-but-partial-aggregated group, never
    a driver-side list."""
    from pyspark.sql import Window

    n_docs = docs.count()  # bounded job; the oracle's COUNT(*) twin
    anchor = F.array_join(
        F.slice(
            F.filter(F.split("text", " ", -1), lambda x: x != ""),
            1,
            anchor_tokens,
        ),
        " ",
    )
    edges = synthetic_link_edges(docs, n_docs)
    anchors = edges.join(
        docs.select(F.col("doc_id").alias("src"), anchor.alias("anchor")),
        "src",
    )
    per = anchors.groupBy("dst", "anchor").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), "anchor")
    return (
        per.withColumn("rn", F.row_number().over(w))
        .groupBy("dst")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_inlinks"),
            F.count("*").cast("bigint").alias("n_anchors"),
            F.max(F.when(F.col("rn") == 1, F.col("anchor"))).alias(
                "top_anchor"
            ),
        )
        .orderBy("dst")
    )


def snapshot_delta_report(docs: DataFrame) -> DataFrame:
    """Cross-snapshot corpus DIFF — the incremental-ingest decision
    report: comparing crawl N to crawl N+1, how many pages were added,
    removed, changed, or unchanged, so the pipeline re-processes only
    the delta instead of the full 10^12-page corpus.

    Snapshots synthesize deterministically from the documents table so
    the DuckDB oracle replays every byte: page key = div(doc_id, 2),
    even doc_ids are the OLD crawl's capture, odd the NEW; pages with
    page % 5 = 0 are missing from the old crawl (-> 'added'), pages
    with page % 7 = 3 missing from the new (-> 'removed'), and pages
    with page % 3 = 0 carry a page-keyed content hash on both sides
    (-> 'unchanged') while the rest hash their own text (-> 'changed').

    Plan: two shuffle-free projections + ONE full outer join on the
    page key + one 4-row verdict agg — at 10^12 pages the join is the
    only corpus-wide exchange, the same cost as exact dedup, and
    bucketing both snapshot tables on the page key makes it
    exchange-free."""
    page = F.expr("div(doc_id, 2)")
    content = F.when(
        page % 3 == 0, F.md5(page.cast("string"))
    ).otherwise(F.md5("text"))
    base = docs.select(
        page.alias("page"),
        (F.col("doc_id") % 2).alias("side"),
        content.alias("content"),
    )
    old = base.filter((F.col("side") == 0) & (F.col("page") % 5 != 0)).select(
        "page", F.col("content").alias("old_content")
    )
    new = base.filter((F.col("side") == 1) & (F.col("page") % 7 != 3)).select(
        "page", F.col("content").alias("new_content")
    )
    verdict = (
        F.when(F.col("old_content").isNull(), F.lit("added"))
        .when(F.col("new_content").isNull(), F.lit("removed"))
        .when(F.col("old_content") == F.col("new_content"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        old.join(new, "page", "full_outer")
        .select("page", verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(
            F.count("*").cast("bigint").alias("n_pages"),
            F.min("page").cast("bigint").alias("min_page"),
            F.max("page").cast("bigint").alias("max_page"),
        )
        .orderBy("verdict")
    )


def synthetic_robots_rules(docs: DataFrame) -> DataFrame:
    """Deterministic per-host robots rules (RFC 9309 shapes): each of
    the 13 synthetic hosts disallows two /page/N prefixes and carves a
    LONGER Allow back out under one of them — so longest-match has to
    do real work.  Bounded output (3 rows/host), derived relationally
    from the corpus so any SF replays it."""
    h = F.col("hh")
    hosts = docs.select(
        (F.col("doc_id") % 13).cast("int").alias("hh")
    ).distinct()
    rule = F.explode(
        F.array(
            F.struct(
                F.lit("disallow").alias("rule_type"),
                F.format_string("/page/%d", h % 3).alias("prefix"),
            ),
            F.struct(
                F.lit("disallow").alias("rule_type"),
                F.format_string("/page/%d", h % 3 + 3).alias("prefix"),
            ),
            F.struct(
                F.lit("allow").alias("rule_type"),
                F.format_string("/page/%d/open", h % 3).alias("prefix"),
            ),
        )
    )
    return hosts.select(
        F.format_string("site%d.example.com", h).alias("rhost"),
        rule.alias("r"),
    ).select("rhost", "r.rule_type", "r.prefix")


def robots_filter_report(docs: DataFrame) -> DataFrame:
    """Robots-exclusion verdict per url — the crawl-side gate every
    corpus ingest runs (RFC 9309 'Robots Exclusion Protocol'): the
    MOST SPECIFIC (longest) matching rule wins, Allow beats Disallow
    on a length tie, no match means allowed.

    Scale shape: the rule table is bounded (hosts × a handful of
    prefixes) and BROADCASTS; the url side joins on host equality plus
    a row-local startswith — one hash join probe per url, no url-side
    shuffle before the verdict window, which partitions on doc_id (the
    url key) and is the only exchange.  Verdict columns stay NULL for
    default-allowed urls so the report distinguishes 'allowed by rule'
    from 'allowed by default'."""
    from pyspark.sql import Window

    d = F.col("doc_id")
    urls = docs.select(
        "doc_id",
        F.format_string("site%d.example.com", d % 13).alias("host"),
        F.format_string(
            "/page/%d/%s/%d",
            d % 9,
            F.when(d % 2 == 0, F.lit("open")).otherwise(F.lit("item")),
            d,
        ).alias("path"),
    )
    rules = synthetic_robots_rules(docs)
    j = urls.join(
        F.broadcast(rules),
        (F.col("host") == F.col("rhost"))
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.length("prefix").desc_nulls_last(),
        F.col("rule_type").asc_nulls_last(),
        F.col("prefix").asc_nulls_last(),
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "host",
            "path",
            "rule_type",
            F.col("prefix").alias("rule_prefix"),
            (
                F.col("rule_type").isNull() | (F.col("rule_type") == "allow")
            ).cast("int").alias("allowed"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# frontier politeness partitioning
# ---------------------------------------------------------------------------


def frontier_slots_report(docs: DataFrame, n_slots: int = 8) -> DataFrame:
    """Crawl-frontier sharding with per-host serialization — the
    partitioning every polite distributed crawler uses (Mercator,
    Heydon & Najork 1999; Nutch's host-keyed fetch lists): ALL urls of
    a host map to ONE fetch slot, so crawl-delay enforcement needs no
    cross-worker coordination, and within the slot each host's pages
    carry a deterministic fetch sequence.

    Per doc: (doc_id, host, slot, fetch_seq, n_host_pages).

    Shape at 10^12 urls: slot assignment is a pure projection
    (hash(host) % n_slots); fetch_seq is ONE window keyed by host.
    n_host_pages rides the same window (count over the full host
    frame).  Slot *balance* is the operational risk — a giant host
    saturates its slot — which is why the report carries
    n_host_pages: the frontier scheduler splits any host above its
    politeness budget into time-sliced epochs rather than re-keying
    (re-keying would break the per-host serialization invariant)."""
    from .urlnorm import synthetic_raw_url
    from .webclean import host_of

    host = F.regexp_replace(
        host_of(synthetic_raw_url(F.col("doc_id"))), r"^www\.", ""
    )
    base = docs.select(
        "doc_id",
        host.alias("host"),
        md5_56(F.col("doc_id").cast("string")).alias("rank_key"),
    )
    w = Window.partitionBy("host").orderBy("rank_key", "doc_id")
    wc = Window.partitionBy("host")
    return base.select(
        "doc_id",
        "host",
        (md5_56(F.col("host")) % n_slots).cast("bigint").alias("slot"),
        F.row_number().over(w).cast("bigint").alias("fetch_seq"),
        F.count("*").over(wc).cast("bigint").alias("n_host_pages"),
    )


def link_hits(docs: DataFrame, iters: int = 3, top_k: int = 20) -> DataFrame:
    """Top-k pages by HITS authority (Kleinberg 1999, "Authoritative
    sources in a hyperlinked environment") after a FIXED number of
    mutual-reinforcement rounds over the same deterministic link graph
    as :func:`link_pagerank` — the hub/authority complement to
    PageRank's single prestige score: a page can matter as a DIRECTORY
    (hub — links to good content) without being content itself, the
    distinction a crawl scheduler uses to pick seed lists vs fetch
    targets.

        auth'(v) = Σ_{u→v} hub(u)        hub'(u) = Σ_{u→v} auth'(v)

    NO per-round normalization: the classic L2 normalizer is a
    corpus-wide float sum whose accumulation order differs between
    engines, so instead scores grow unnormalized through ``iters``
    rounds (bounded by (max_degree²)^iters — fine in doubles for fixed
    small iters) and are normalized ONCE at the end by the corpus MAX
    (order-free), rounded to 8 places BEFORE the top-k sort so float
    noise can never flip boundary membership — the same discipline as
    link_pagerank's rounded rank sort.

    Distributed shape per round: two edge-keyed join+groupBy passes
    (the Pregel cost shape, partial aggregation map-side); the edge
    frame is computed once and persisted.  No collect anywhere; the two
    one-row max frames re-enter as broadcasts."""
    from .cache import persist_tracked

    n_docs = docs.count()  # bounded job; the oracle's COUNT(*) twin
    ids = docs.select("doc_id")
    edges = persist_tracked(synthetic_link_edges(docs, n_docs))
    hub = ids.select("doc_id", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(iters):
        auth = (
            edges.join(hub.withColumnRenamed("doc_id", "src"), "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("h").alias("a"))
        )
        auth = (
            ids.join(auth, "doc_id", "left")
            .select("doc_id", F.coalesce("a", F.lit(0.0)).alias("a"))
        )
        hub = (
            edges.join(auth.withColumnRenamed("doc_id", "dst"), "dst")
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.sum("a").alias("h"))
        )
        hub = (
            ids.join(hub, "doc_id", "left")
            .select("doc_id", F.coalesce("h", F.lit(0.0)).alias("h"))
        )
    # the mutual-reinforcement chain is LINEAR (each round's auth feeds
    # hub once, each hub feeds next auth once), so intermediate rounds
    # need no truncation or caching at fixed iters=3 — only the FINAL
    # frames fan out (amax/hmax broadcasts + the scored join), and one
    # persist each stops that recompute.  The r5/early-r6 per-round
    # localCheckpoints paid a synchronous plan-compile round trip per
    # call (~1.4 s each at build, measured) for lineage that a 3-round
    # fixed loop never grows; large-iters production runs would add a
    # checkpoint every ~5 rounds.
    auth = persist_tracked(auth)
    hub = persist_tracked(hub)
    amax = auth.agg(F.max("a").alias("amax"))
    hmax = hub.agg(F.max("h").alias("hmax"))
    scored = (
        auth.join(hub, "doc_id")
        .crossJoin(F.broadcast(amax))
        .crossJoin(F.broadcast(hmax))
        .select(
            "doc_id",
            F.round(F.col("a") / F.col("amax"), 8).alias("auth_norm"),
            F.round(F.col("h") / F.col("hmax"), 8).alias("hub_norm"),
        )
    )
    return scored.orderBy(F.col("auth_norm").desc(), "doc_id").limit(top_k)
