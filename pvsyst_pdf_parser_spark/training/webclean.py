"""Web-corpus hygiene: PII scrubbing and domain-level filtering —
the per-row redaction and per-site policy passes every public
web-corpus pipeline runs before training (C4 removed pages by
blocklist; CCNet/RefinedWeb describe URL/domain filtering; PII
masking of emails/IPs/phones is standard release practice).

Both operators are pure column expressions:

- PII scrub: three chained regexp_replace projections — zero shuffle,
  a free map stage at 10^12 docs.  Patterns use plain character
  classes and alternation only (no backreferences, no lookaround) so
  they behave identically under Java regex (Spark), RE2, and DuckDB.
- domain stats: one regexp projection + one groupBy on the domain key
  (map-side combined; domain cardinality is millions, not trillions,
  so the aggregate output is small) + a broadcast blocklist check.

The synthetic corpus has no real PII/URLs, so the demo faces inject
deterministic PII / urls from doc_id (same technique as
urlnorm.synthetic_raw_url) — the operators themselves take any text /
url column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .urlnorm import _HOST_PAT, synthetic_raw_url

# Plain-class patterns, portable across Java regex / RE2 / DuckDB.
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_PAT = (
    r"[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?\."
    r"[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?"
)
PHONE_PAT = r"[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"

_REPLACEMENTS = [
    # order matters: emails first (their local/domain parts contain
    # digits and dots an IP/phone pattern could bite into), then IPs
    # (dotted digits), then phones (dashed digits)
    (EMAIL_PAT, "<EMAIL>"),
    (IPV4_PAT, "<IP>"),
    (PHONE_PAT, "<PHONE>"),
]


def scrub_pii(col: Column) -> Column:
    """Mask emails / IPv4 addresses / dashed phone numbers with typed
    placeholder tokens."""
    out = col
    for pat, token in _REPLACEMENTS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_scrub_stats(docs: DataFrame) -> DataFrame:
    """Demo/oracle face: inject deterministic PII into each document,
    scrub it, and report per doc: (doc_id, n_emails, n_ips, n_phones,
    clean_text).  Every doc gets an email; ids divisible by 3 get an
    IP, divisible by 4 a phone — so counts vary and the oracle can
    replay the arithmetic."""
    d = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.format_string(" contact user%d@mail%d.example.org", d, d % 9),
        F.when(
            d % 3 == 0, F.format_string(" host 10.%d.0.%d", d % 256, d % 100)
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 0, F.format_string(" call 555-01%d-%04d", d % 10, d % 10000)
        ).otherwise(F.lit("")),
    )
    from .dedup import ensure_scan_parallelism

    # four corpus-wide regex passes per row — parallelize a degenerate
    # 2-row-group scan (no-op at real split counts)
    return ensure_scan_parallelism(docs).select(
        "doc_id",
        F.regexp_count(dirty, F.lit(EMAIL_PAT)).cast("bigint").alias("n_emails"),
        F.regexp_count(dirty, F.lit(IPV4_PAT)).cast("bigint").alias("n_ips"),
        F.regexp_count(dirty, F.lit(PHONE_PAT)).cast("bigint").alias("n_phones"),
        scrub_pii(dirty).alias("clean_text"),
    )


# -- domain-level stats / blocklist ----------------------------------

# naive registered domain = last two dot labels; real pipelines use the
# Public Suffix List (multi-label TLDs like co.uk need it) — that is a
# data file, not an algorithm change: the regex becomes a longest-match
# join against the PSL broadcast
_REG_DOMAIN = r"([^.]+\.[^.]+)$"

DEFAULT_BLOCKLIST = ("mirror2.example.com", "mirror5.example.com")


def host_of(url: Column) -> Column:
    """Lowercased host with default ports stripped (the host rules of
    urlnorm.canonicalize_url, applied directly so the full
    canonicalization isn't recomputed for a host-keyed aggregate)."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(url, _HOST_PAT, 1)), r":(80|443)$", ""
    )


def domain_cap_report(docs: DataFrame, cap: int = 5) -> DataFrame:
    """Per-host frequency cap — keep at most ``cap`` pages per host
    (the C4 / RefinedWeb guard against a single mirror or forum
    dominating the corpus).  Which pages survive must not depend on
    input order, so the rank inside each host is ordered by a
    deterministic content-free hash of the doc id (md5-portable, same
    both engine sides), ties broken by doc_id.

    Per doc: (doc_id, host, host_rank, kept).

    Shape at 10^12 docs: ONE window keyed by host.  Host cardinality
    is ~10^8 with a long tail — the hot host (a crawler trap with 10^7
    pages) makes this window skew-prone; the fix is the same rank
    semantics via a two-phase count: pre-aggregate per (host,
    salt=hash%k), then only hosts over the cap enter the window
    (hosts under it keep everything — at web scale that is >99% of
    hosts filtered out of the shuffle)."""
    from .hashing import md5_56

    host = F.regexp_replace(
        host_of(synthetic_raw_url(F.col("doc_id"))), r"^www\.", ""
    )
    w = Window.partitionBy("host").orderBy("rank_key", "doc_id")
    return (
        docs.select(
            "doc_id",
            host.alias("host"),
            md5_56(F.col("doc_id").cast("string")).alias("rank_key"),
        )
        .withColumn("host_rank", F.row_number().over(w).cast("bigint"))
        .select(
            "doc_id",
            "host",
            "host_rank",
            (F.col("host_rank") <= cap).cast("int").alias("kept"),
        )
    )


# -- C4 line-level page cleaning --------------------------------------

# C4 (Raffel et al. 2020 §2.2) cleans pages line-by-line BEFORE the
# page verdict: keep only lines that end in terminal punctuation and
# have >= 5 words, drop lines with the word "javascript", and discard
# whole pages that contain "{" (code), "lorem ipsum" (placeholder), or
# end up with < 3 retained lines.  All rules are row-local HOFs over
# the line list — ZERO shuffle at any corpus size (plan-gated).
#
# The synthetic corpus is flat space-separated tokens, so the demo
# face manufactures the line structure deterministically from doc_id
# (the same technique as the PII face above): 8-token lines, terminal
# '.' on lines where (doc_id + idx) % 3 != 0, a ' javascript' token
# injected where (doc_id + idx) % 11 == 0, a code line appended when
# doc_id % 13 == 0 and a 'lorem ipsum' line when doc_id % 17 == 0 —
# so every rule, line- and page-level, does real work and the DuckDB
# oracle can replay the injection arithmetic.

C4_LINE_TOKENS = 8
C4_MIN_WORDS = 5
C4_MIN_KEPT_LINES = 3

_C4_LINES = """
CASE WHEN size(__toks) = 0 THEN array()
     ELSE transform(sequence(0, ((size(__toks) + {lt} - 1) div {lt}) - 1),
        j -> concat(
               array_join(slice(__toks, j * {lt} + 1, {lt}), ' '),
               CASE WHEN (doc_id + j) % 11 = 0 THEN ' javascript'
                    ELSE '' END,
               CASE WHEN (doc_id + j) % 3 != 0 THEN '.' ELSE '' END))
END
"""

_C4_EXTRA = """
concat(
  CASE WHEN doc_id % 13 = 0 THEN array('function() { return 0; }')
       ELSE array() END,
  CASE WHEN doc_id % 17 = 0
       THEN array('lorem ipsum dolor sit amet consectetur adipiscing elit.')
       ELSE array() END)
"""

_C4_LINE_KEPT = (
    "l -> endswith(l, '.') "
    "AND size(filter(split(l, ' ', -1), t -> t <> '')) >= {mw} "
    "AND NOT contains(l, 'javascript') AND NOT contains(l, '{{')"
)


def c4_line_filter_report(
    docs: DataFrame,
    min_words: int = C4_MIN_WORDS,
    min_kept_lines: int = C4_MIN_KEPT_LINES,
) -> DataFrame:
    """Per document: (doc_id, n_lines, n_kept_lines, page_kept,
    kept_digest) — the C4 line filters plus the page verdict, with the
    retained text md5-digested so both engines verify every surviving
    byte, not just the counts."""
    from .dedup import ensure_scan_parallelism

    kept = _C4_LINE_KEPT.format(mw=min_words)
    lines = (
        ensure_scan_parallelism(docs).select(
            "doc_id",
            F.expr("filter(split(text, ' ', -1), t -> t <> '')").alias(
                "__toks"
            ),
        )
        .select(
            "doc_id",
            F.expr(
                "concat("
                + _C4_LINES.format(lt=C4_LINE_TOKENS).strip()
                + ", "
                + _C4_EXTRA.strip()
                + ")"
            ).alias("lines"),
        )
        .select(
            "doc_id",
            "lines",
            F.expr(f"filter(lines, {kept})").alias("kept_lines"),
        )
    )
    has_page_killer = F.expr(
        "exists(lines, l -> contains(l, '{') OR contains(l, 'lorem ipsum'))"
    )
    page_kept = (
        (F.size("kept_lines") >= min_kept_lines) & ~has_page_killer
    ).cast("int")
    return lines.select(
        "doc_id",
        F.size("lines").cast("bigint").alias("n_lines"),
        F.size("kept_lines").cast("bigint").alias("n_kept_lines"),
        page_kept.alias("page_kept"),
        F.md5(F.array_join("kept_lines", "\n")).alias("kept_digest"),
    )


def domain_stats(
    docs: DataFrame, blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> DataFrame:
    """Per-host corpus report over the synthesized urls: (host,
    registered_domain, n_docs, total_tokens, blocked) — the table a
    crawl operator ranks to decide domain-level policy.  The blocklist
    is a literal here; a real one is a small frame broadcast into the
    same expression."""
    host = host_of(synthetic_raw_url(F.col("doc_id")))
    # www. is a display alias, not a distinct site
    host = F.regexp_replace(host, r"^www\.", "")
    tokens = F.size(F.split(F.col("text"), " ", -1))
    per = docs.select(
        host.alias("host"), tokens.alias("n_tokens")
    )
    return (
        per.groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .select(
            "host",
            F.regexp_extract("host", _REG_DOMAIN, 1).alias("registered_domain"),
            "n_docs",
            "total_tokens",
            F.col("host").isin(*blocklist).cast("int").alias("blocked"),
        )
    )


def domain_quality_prior(docs: DataFrame, pseudo_count: int = 5) -> DataFrame:
    """Empirical-Bayes shrinkage of document quality toward the host
    mean: (host, n_docs, host_mean_q, shrunk_q).

    Public pipeline practice scores *pages* but enforces policy per
    *site* (C4/RefinedWeb host rules; FineWeb's per-domain analysis):
    a host with three pages and a lucky quality score should not
    outrank a host whose mean is earned over thousands of pages.  The
    standard fix is the Bayesian posterior mean with a pseudo-count
    prior at the corpus mean:

        shrunk = (n · host_mean + m · global_mean) / (n + m)

    Arithmetic discipline (same as dsir.py's micro-nats): per-document
    quality scores are already rounded to 1e-4, so they are lifted to
    exact integer micro-units before any aggregation.  Both the host
    sum and the corpus sum are bigint — order-free, spill-safe — and
    the shrunk score is ONE exact-integer ratio

        (sum_host · N_total + m · sum_total) / ((n + m) · N_total)

    evaluated as a single double division, so Spark and the DuckDB
    oracle agree without float-summation drift.

    Distributed shape at 10^12 documents: one projection, one groupBy
    host (~10^8 keys), one single-row corpus aggregate broadcast back
    via crossJoin — the document side shuffles exactly once.
    """
    from .textstats import quality_scores

    # host is a pure function of doc_id (synthesized url), so it rides
    # the SAME projection as the quality score — no self-join
    host = F.regexp_replace(
        host_of(synthetic_raw_url(F.col("doc_id"))), r"^www\.", ""
    )
    q_micro = F.round(F.col("quality_score") * 10000, 0).cast("bigint")
    per = quality_scores(docs, sample_mod=1).select(
        host.alias("host"), q_micro.alias("q_micro")
    )
    by_host = per.groupBy("host").agg(
        F.count("*").alias("n_docs"), F.sum("q_micro").alias("sum_q")
    )
    totals = per.agg(
        F.count("*").alias("n_total"), F.sum("q_micro").alias("sum_total")
    )
    # exact 128-bit integer arithmetic: sum_q·N_total reaches ~10^28 at
    # 10^12 docs, past bigint — decimal(38,0) here, HUGEINT in DuckDB
    m = F.lit(pseudo_count).cast("decimal(38,0)")
    sum_q = F.col("sum_q").cast("decimal(38,0)")
    num = (sum_q * F.col("n_total") + m * F.col("sum_total")).cast("double")
    den = ((F.col("n_docs") + m) * F.col("n_total")).cast("double")
    return by_host.crossJoin(F.broadcast(totals)).select(
        "host",
        "n_docs",
        F.round(F.col("sum_q").cast("double") / F.col("n_docs") / 10000.0, 4).alias(
            "host_mean_q"
        ),
        F.round(num / den / 10000.0, 4).alias("shrunk_q"),
    )


# Deterministic sentinel tokens standing in for the public bad-words
# blocklist C4 uses (the "List of Dirty, Naughty, Obscene..." list is
# not vendored here; the FILTER mechanics are what this operator
# demonstrates).  'dup' is the fixture's planted duplicate marker, so
# the flag rate is non-degenerate at every SF.
BADWORD_SENTINELS = ("dup", "lorem", "xxx")


def badwords_filter_report(
    docs: DataFrame, blockwords: tuple[str, ...] = BADWORD_SENTINELS
) -> DataFrame:
    """C4's bad-words page filter (Raffel 2020 §2.2: drop any page
    containing a blocklisted word), with exact token-boundary
    semantics: the page is tokenized on non-alphanumeric runs and a
    hit is an exact token match — the substring false-positive class
    ('scunthorpe', 'bass') the naive contains() filter is famous for
    is structurally excluded.

    Per source: (source, n_docs, n_flagged, n_kept, drop_rate,
    flagged_digest) where flagged_digest is the md5 of the
    comma-joined ascending flagged doc_ids — both engines verify the
    exact FLAG SET, not just its size.

    Distributed shape at 10^12 documents: tokenize + array-overlap is
    a pure projection against a literal array (a real 2k-word list
    rides the closure the same way; a million-entry list would switch
    to a broadcast join on the exploded token), then ONE source-keyed
    groupBy with map-side partials.  The digest's collect_list is
    per-(source, flagged) — bounded by the flag rate, and at real
    scale the digest column is dropped or replaced by the xxhash64
    bit_xor running checksum."""
    from .dedup import ensure_scan_parallelism

    toks = F.split(F.lower("text"), "[^a-z0-9]+", -1)
    hit = F.arrays_overlap(
        toks, F.array(*[F.lit(w) for w in blockwords])
    ).cast("int")
    per = ensure_scan_parallelism(docs).select(
        "source", "doc_id", hit.alias("flagged"))
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("flagged").cast("bigint").alias("n_flagged"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.when(F.col("flagged") == 1, F.col("doc_id"))
                            )
                        ),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("flagged_digest"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            (F.col("n_docs") - F.col("n_flagged")).cast("bigint").alias("n_kept"),
            F.round(F.col("n_flagged") / F.col("n_docs"), 4).alias("drop_rate"),
            "flagged_digest",
        )
    )
