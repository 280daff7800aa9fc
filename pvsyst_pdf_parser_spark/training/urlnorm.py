"""URL canonicalization — the web-scale dedup primitive that runs
BEFORE content dedup: mirror urls differing only in scheme/host case,
default ports, tracking parameters, fragments, or trailing slashes
must collapse to one canonical key, or every downstream url-keyed
stage (exact dedup, bucketing, resume manifests) treats them as
distinct documents.

Pure column expressions (regexp_extract / regexp_replace / lower /
CASE) with exact DuckDB equivalents — no backreferences, no lookaround,
so the same patterns run identically under Java regex and RE2.  One
projection, no shuffle: at 10^12 urls this is a free map stage.

Rules (the conservative, loss-free subset of public crawl practice):
1. scheme and host lowercased (RFC 3986 §6.2.2.1 — case-insensitive
   components; path/query case is preserved, it is significant)
2. default ports stripped (:80, :443)
3. fragment dropped (never sent to the server)
4. tracking parameters removed (utm_*, fbclid, gclid)
5. dangling '?'/'&' separators cleaned up
6. trailing path slash stripped except for the root path
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_PAT = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_PAT = r"\?([^#]*)"
# Tracking-param removal is BOUNDARY-ANCHORED in two passes: an
# unanchored pattern partially strips any param whose name merely ends
# in a tracking name ('a=1&myfbclid=2&b=3' -> 'a=1&myb=3' — unrelated
# params merged into a corrupted one, so distinct urls could collide
# and identical urls diverge).  Pass 1 strips '&name=value' mid-query
# (the '&' must IMMEDIATELY precede the tracking name); pass 2 strips a
# leading 'name=value&?'.  Running mid before lead makes a run of
# leading tracking params collapse correctly ('utm_a=1&utm_b=2&id=3':
# mid drops '&utm_b=2', lead then drops 'utm_a=1&').  Plain anchors +
# alternation only — no backreferences/lookaround, portable to RE2,
# Java regex and DuckDB alike.
_TRACKING_MID_PAT = r"&(utm_[a-z]+|fbclid|gclid)=[^&]*"
_TRACKING_LEAD_PAT = r"^(utm_[a-z]+|fbclid|gclid)=[^&]*&?"


def canonicalize_url(col: Column) -> Column:
    """Canonical form of an absolute http(s) url column."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_PAT, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, _HOST_PAT, 1)), r":(80|443)$", ""
    )
    raw_path = F.regexp_extract(u, _PATH_PAT, 1)
    path = _strip_trailing_slash(
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    )
    query = F.regexp_extract(u, _QUERY_PAT, 1)
    query = F.regexp_replace(query, _TRACKING_MID_PAT, "")
    query = F.regexp_replace(query, _TRACKING_LEAD_PAT, "")
    query = F.regexp_replace(query, r"[&]+$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def _strip_trailing_slash(path: Column) -> Column:
    return F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)


def synthetic_raw_url(doc_id: Column) -> Column:
    """Deterministic MESSY url per doc_id — two alternating templates
    exercising every canonicalization rule (upper-case scheme/host,
    default port, utm/fbclid params, fragment, trailing slash).  The
    oracle replays the same format arithmetic."""
    return F.when(
        doc_id % 2 == 0,
        F.format_string(
            "HTTPS://WWW.Mirror%d.Example.COM:443/Docs/%d/"
            "?utm_source=feed&id=%d&utm_campaign=x#frag",
            doc_id % 7, doc_id, doc_id,
        ),
    ).otherwise(
        F.format_string(
            "http://mirror%d.example.com:80/Docs/%d?fbclid=abc%d&page=2",
            doc_id % 7, doc_id, doc_id,
        )
    )


def canonical_url_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, raw_url, canonical_url) over the synthesized messy urls
    — the demo/oracle face of :func:`canonicalize_url`."""
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        synthetic_raw_url(d).alias("raw_url"),
        canonicalize_url(synthetic_raw_url(d)).alias("canonical_url"),
    )
