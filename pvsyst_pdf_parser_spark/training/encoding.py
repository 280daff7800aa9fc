"""Mojibake repair — fixing UTF-8 text that was decoded as
Windows-1252 somewhere in the crawl path (the single most common
encoding damage in web corpora; the public `ftfy` tool exists for
exactly this).  A page served as UTF-8 but labeled latin-1/cp1252
turns every non-ASCII character into a 2-3 byte artifact sequence:
U+2019 RIGHT SINGLE QUOTE (E2 80 99) becomes "â€™", U+00E9 é (C3 A9)
becomes "Ã©".  The repair is the inverse byte map, applied as literal
multi-character replacements — longest sequences first so a 3-byte
artifact is never half-eaten by a 2-byte rule.

Shape at 10^12 docs: a chain of literal `replace` projections — zero
shuffle, whole-stage-codegen'd, a free map stage exactly like PII
scrubbing.  Detection (artifact counting) is one `regexp_count` over
the same projection.

Only characters whose UTF-8 bytes are all *defined* in cp1252 are
mapped (0x81/0x8D/0x8F/0x90/0x9D are unmapped, so e.g. U+201D " comes
back from a cp1252 round trip as replacement garbage and cannot be
repaired losslessly; real pipelines drop those).  The artifact
strings are GENERATED from ``ch.encode('utf-8').decode('cp1252')`` at
import time — no hand-typed invisible characters — and the DuckDB
oracle builder imports the same table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# highest-frequency web-text characters that survive a cp1252 round
# trip; repair of U+00A0 nbsp maps to a plain space (the cleanup every
# pipeline wants anyway)
_REPAIR_CHARS = "’“–…éèüñç\u00a0"  # last char: nbsp (explicit escape)

MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = tuple(
    (ch.encode("utf-8").decode("cp1252"), " " if ch == "\u00a0" else ch)
    for ch in _REPAIR_CHARS
)

# one detection regex: literal alternation of the artifact sequences,
# longest first so a 3-byte artifact counts once.  No metacharacters —
# portable across Java regex (Spark) and RE2 (DuckDB).
ARTIFACT_PAT = (
    "(" + "|".join(sorted((a for a, _ in MOJIBAKE_TABLE),
                          key=len, reverse=True)) + ")"
)


def fix_mojibake(col: Column) -> Column:
    """Repair cp1252-mojibake artifact sequences with literal
    (non-regex) replacements, longest-first (3-byte artifacts precede
    2-byte ones in MOJIBAKE_TABLE by construction)."""
    out = col
    for artifact, repaired in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(artifact), F.lit(repaired))
    return out


# deterministic damage suffixes (module-level so the oracle builder
# can embed the identical literals)
_DMG2 = " don" + "’".encode("utf-8").decode("cp1252") + "t stop"
_DMG3 = (" caf" + "é".encode("utf-8").decode("cp1252")
         + " cr" + "è".encode("utf-8").decode("cp1252") + "me")
_DMG5 = (" " + "“".encode("utf-8").decode("cp1252") + "a"
         + "–".encode("utf-8").decode("cp1252") + "b"
         + "…".encode("utf-8").decode("cp1252")
         + "\u00a0".encode("utf-8").decode("cp1252") + "end")


def inject_mojibake(doc_id: Column) -> Column:
    """Deterministic artifact suffix per doc_id (the synthetic corpus
    is pure ASCII, so the demo plants damage the oracle replays):
    every 2nd doc gets a curly-quote artifact, every 3rd an accented
    pair, every 5th a dash+ellipsis+nbsp cluster."""
    return F.concat(
        F.when(doc_id % 2 == 0, F.lit(_DMG2)).otherwise(F.lit("")),
        F.when(doc_id % 3 == 0, F.lit(_DMG3)).otherwise(F.lit("")),
        F.when(doc_id % 5 == 0, F.lit(_DMG5)).otherwise(F.lit("")),
    )


def mojibake_repair_stats(docs: DataFrame) -> DataFrame:
    """Demo/oracle face: damage each document deterministically, then
    detect + repair.  Per doc: (doc_id, n_artifacts, chars_dirty,
    chars_clean, clean_text).  `n_artifacts` counts artifact sequences
    BEFORE repair; repair shrinks the text by 1-2 chars per artifact,
    which the oracle replays exactly."""
    dirty = F.concat(F.col("text"), inject_mojibake(F.col("doc_id")))
    clean = fix_mojibake(dirty)
    from .dedup import ensure_scan_parallelism

    docs = ensure_scan_parallelism(docs)
    return docs.select(
        "doc_id",
        F.regexp_count(dirty, F.lit(ARTIFACT_PAT)).cast("bigint")
        .alias("n_artifacts"),
        F.length(dirty).cast("bigint").alias("chars_dirty"),
        F.length(clean).cast("bigint").alias("chars_clean"),
        clean.alias("clean_text"),
    )
