"""Unicode-whitespace parity helpers for Column-side text ops.

The reference parser is CPython: ``str.strip()`` / ``str.split()`` /
``str.splitlines()`` and re's ``\\s`` are Unicode-aware.  Spark's
``F.trim`` strips only ASCII 0x20 and Java regex ``\\s`` / ``\\d`` are
ASCII-only by default, so a monthly line with a leading tab, a trailing
``\\r`` (CRLF text), or NBSP token separators — all common in PDF/HTML-
derived crawl text — would be accepted by the reference but rejected or
mis-tokenized by a naive Spark port.

Every Column-side regex in the extraction path therefore:

- carries the embedded Java flag ``(?U)`` (UNICODE_CHARACTER_CLASS,
  which also implies UNICODE_CASE for ``(?i)``), making ``\\s``/``\\d``/
  ``\\b``/``\\w`` match Python semantics;
- trims with :func:`utrim` (regexp-based Unicode strip, the analogue of
  ``str.strip()``), never ``F.trim``;
- splits lines with :func:`split_lines` / :data:`LINE_BREAK` — the
  ``str.splitlines()`` terminator set, not a bare ``"\\n"``;
- splits tokens with :func:`split_ws` (``str.split()`` analogue).

The training/demo modules intentionally do NOT use these helpers: their
ground truth is a DuckDB oracle with matching ASCII semantics on both
sides, not the CPython reference.

Known residual divergences (documented, fixture-free):
- Java ``.`` excludes \\r/\\u0085/\\u2028/\\u2029 while Python ``.``
  excludes only \\n — immaterial after line splitting, since those
  chars are line terminators on both sides;
- Python ``float()`` accepts non-ASCII Unicode digits that Spark's
  ``try_cast(double)`` rejects (a row with Arabic-Indic numerals would
  diverge); ``str.isspace()`` and Unicode White_Space agree on every
  character either side treats as whitespace.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# str.splitlines() terminators: \r\n pair first, then the singles
# (\n \r \v \f FS GS RS NEL LS PS).
LINE_BREAK = "\\r\\n|[\\n\\r\\u000B\\u000C\\u001C\\u001D\\u001E\\u0085\\u2028\\u2029]"

# the EXACT str.isspace() character set (what str.strip() strips):
# note \x1c-\x1f are Python-whitespace but NOT Unicode White_Space, so
# btrim over this literal set is both faster than a regex strip AND
# more faithful than Java's (?U)\s
PY_WHITESPACE = "".join(chr(c) for c in (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
    0x85, 0xA0, 0x1680,
    0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
    0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
))


def utrim(col) -> Column:
    """``str.strip()``: remove leading/trailing Python whitespace.
    btrim with the literal isspace() charset — a charset scan, not a
    regex pass (the strip runs on every line of every document)."""
    if isinstance(col, str):
        col = F.col(col)
    return F.btrim(col, F.lit(PY_WHITESPACE))


def split_lines(col) -> Column:
    """``str.splitlines()`` as a split (trailing-empty elements are NOT
    removed — callers that mirror ``if ln.strip()`` filters drop them)."""
    if isinstance(col, str):
        col = F.col(col)
    return F.split(col, LINE_BREAK, -1)


def split_ws(col) -> Column:
    """``str.split()`` token split on Unicode-whitespace runs.  Assumes
    the input is already :func:`utrim`-med (as the reference always
    strips before splitting), so no empty edge tokens appear."""
    if isinstance(col, str):
        col = F.col(col)
    return F.split(col, r"(?U)\s+", -1)


# SQL-expression fragments for F.expr() call sites (doubled backslashes
# survive the SQL string-literal parser).
SQL_USTRIP = "regexp_replace({x}, '(?U)^\\\\s+|\\\\s+$', '')"


def sql_ustrip(x: str) -> str:
    return SQL_USTRIP.format(x=x)
