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

_STRIP_PAT = r"(?U)^\s+|\s+$"


def utrim(col) -> Column:
    """``str.strip()``: remove leading/trailing Unicode whitespace."""
    if isinstance(col, str):
        col = F.col(col)
    return F.regexp_replace(col, _STRIP_PAT, "")


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
