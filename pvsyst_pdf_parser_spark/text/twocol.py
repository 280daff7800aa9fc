"""Native two-column row parsing (reference P2/P3).

PVsyst prints module and inverter tables side by side; a row reads
``Manufacturer LONGi Solar Manufacturer Huawei``.  The reference parses
this with three fallbacks (pvsyst_parser.py:179-213): repeated-label
pattern, single-label + ≥2-space split, single value.  Reproduced here
as pure Column expressions (regexp_extract + split), no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .uws import utrim


def first_line_with(block: Column, label_regex: str) -> Column:
    """First line of ``block`` containing ``label_regex`` (case-insensitive),
    trimmed — mirrors the reference's next(ln for ln in lines if search).
    (?U): Unicode \\s/\\b inside ``label_regex`` (Python re parity)."""
    pat = rf"(?imU)^(.*{label_regex}.*)$"
    return utrim(F.regexp_extract(block, pat, 1))


def two_column_values(line: Column, label: str) -> tuple[Column, Column]:
    """(left, right) column values for a repeated-label two-column row.

    Mirrors _two_column_values (pvsyst_parser.py:179-208): try
    ``label X label Y``; else ``label remainder`` split on 2+ spaces;
    else (remainder, null).  Empty extractions become null.  (?U) makes
    ``\\s`` match NBSP/Unicode spaces like Python re; trims/splits are
    the Unicode ``str.strip()`` / ``re.split(r"\\s{2,}")`` analogues.
    """
    esc = re.escape(label)
    pat_two = rf"(?iU){esc}\s+(.+?)\s+{esc}\s+(.+)$"
    pat_one = rf"(?iU){esc}\s+(.+)$"

    l2 = F.nullif(utrim(F.regexp_extract(line, pat_two, 1)), F.lit(""))
    r2 = F.nullif(utrim(F.regexp_extract(line, pat_two, 2)), F.lit(""))

    remainder = F.nullif(utrim(F.regexp_extract(line, pat_one, 1)), F.lit(""))
    parts = F.split(remainder, r"(?U)\s{2,}")
    multi = F.size(parts) >= 2
    l1 = F.when(multi, F.nullif(utrim(parts[0]), F.lit(""))).otherwise(remainder)
    r1 = F.when(multi, F.nullif(utrim(parts[1]), F.lit("")))

    two_matched = l2.isNotNull() | r2.isNotNull()
    left = F.when(two_matched, l2).otherwise(l1)
    right = F.when(two_matched, r2).otherwise(r1)
    return left, right


def second_column_value(line: Column, label: str) -> Column:
    """right-or-left pick, mirrors _second_column_value (pvsyst_parser.py:210-213)."""
    left, right = two_column_values(line, label)
    return F.coalesce(right, left)
