"""Inverter / MPPT range notation expansion (reference A8/A9) — native.

``"INV02-05, 7,8" → [INV02..INV05, INV07, INV08]``, ``"R1-3" →
[INVR01..INVR03]`` (pvsyst_parser.py:394-436); ``"1-3,5" → [MPPT 1..3,
MPPT 5]`` (:438-457).  Implemented entirely with split / transform /
sequence / format_string — runs inside codegen as a projection (no UDF,
no shuffle), unlike a per-row Python implementation.

Semantics preserved exactly:
- comma parts trimmed, empties dropped
- parts not starting with "INV" (case-insensitive) get an "INV " prefix
- range regex ``INV\\s*([A-Za-z]*)(\\d+)\\s*-\\s*([A-Za-z]*)(\\d+)`` →
  names ``INV{prefix1}{i:02d}`` (the second prefix is parsed but unused,
  mirroring :418-426); a descending range yields nothing (Python
  ``range()`` semantics) — guarded, since Spark ``sequence()`` counts down
- single regex ``INV\\s*([A-Za-z]*)(\\d+)`` → ``INV{prefix}{n:02d}``
- unparseable parts contribute nothing
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..text.uws import sql_ustrip

# doubled backslashes survive the SQL string literal parser
_INV_RANGE = r"(?iU)INV\\s*([A-Za-z]*)(\\d+)\\s*-\\s*([A-Za-z]*)(\\d+)"
_INV_SINGLE = r"(?iU)INV\\s*([A-Za-z]*)(\\d+)"
_MPPT_RANGE = r"(?U)(\\d+)\\s*-\\s*(\\d+)"
_MPPT_SINGLE = r"(?U)(\\d+)"


def expand_inverter_spec(spec_sql: str) -> Column:
    """array<string> of inverter names for a spec column (SQL expr text).

    Null/empty spec → empty array.
    """
    rg = lambda i: f"regexp_extract(q, '{_INV_RANGE}', {i})"  # noqa: E731
    sg = lambda i: f"regexp_extract(q, '{_INV_SINGLE}', {i})"  # noqa: E731
    sql = f"""
      flatten(transform(
        transform(
          filter(transform(split(coalesce({spec_sql}, ''), ','),
                           x -> {sql_ustrip('x')}),
                 p -> p != ''),
          p -> CASE WHEN upper(p) LIKE 'INV%' THEN p ELSE concat('INV ', p) END),
        q -> CASE
          WHEN {rg(2)} != '' AND {rg(4)} != '' THEN
            CASE WHEN cast({rg(2)} as int) <= cast({rg(4)} as int)
            THEN transform(sequence(cast({rg(2)} as int), cast({rg(4)} as int)),
                           i -> format_string('INV%s%02d', {rg(1)}, i))
            ELSE array() END
          WHEN {sg(2)} != '' THEN
            array(format_string('INV%s%02d', {sg(1)}, cast({sg(2)} as int)))
          ELSE array()
        END))
    """
    return F.expr(sql)


def expand_mppt_spec(spec_sql: str) -> Column:
    """array<string> of 'MPPT n' labels (reference :438-457)."""
    coalesced = f"coalesce({spec_sql}, '')"
    stripped = f"regexp_replace({sql_ustrip(coalesced)}, '(?iU)^MPPT\\\\s*', '')"
    rg = lambda i: f"regexp_extract(p, '{_MPPT_RANGE}', {i})"  # noqa: E731
    sql = f"""
      flatten(transform(
        filter(transform(split({stripped}, ','),
                         x -> {sql_ustrip('x')}),
               p -> p != ''),
        p -> CASE
          WHEN p LIKE '%-%' THEN
            CASE WHEN {rg(1)} != '' AND cast({rg(1)} as int) <= cast({rg(2)} as int)
            THEN transform(sequence(cast({rg(1)} as int), cast({rg(2)} as int)),
                           i -> concat('MPPT ', cast(i as string)))
            ELSE array() END
          WHEN regexp_extract(p, '{_MPPT_SINGLE}', 1) != '' THEN
            array(concat('MPPT ',
                  cast(cast(regexp_extract(p, '{_MPPT_SINGLE}', 1) as int) as string)))
          ELSE array()
        END))
    """
    return F.expr(sql)
