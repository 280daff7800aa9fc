"""Match-position scan over doc_text (reference C1 + orientation matches).

Spark has no regex function returning *character offsets*, which the
reference needs for section slicing (pvsyst_parser.py:141-150) and the
nearest-tilt orientation join (:342-352).  This is the one genuinely
UDF-shaped text operator: a single vectorized Arrow pass per document
that returns all (pattern, offset) hits; everything downstream (interval
slicing, nearest-match join) is relational.

Patterns are fixed at plan time; compiled once per executor.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The 10 fixed section patterns, in reference dict order
# (pvsyst_parser.py:128-139) — order is the stable-sort tiebreak.
SECTION_PATTERNS: list[tuple[str, str]] = [
    ("Project Summary", r"Project summary|System summary|Results summary"),
    ("PV Array Characteristics",
     r"PV Array Characteristics|Array Characteristics|PV Modules|Module Configuration"),
    ("Total Inverter Power", r"Total inverter power"),
    ("System Losses", r"System losses|Loss diagram"),
    ("Array Losses", r"Array losses"),
    ("Horizon Definition", r"Horizon definition"),
    ("Near Shading", r"Near shading|Iso-shadings diagram"),
    ("Main Results", r"Main results"),
    ("Predefined Graphs", r"Predef\.? graphs"),
    ("P50-P90 Evaluation", r"P50.*P90 evaluation"),
]

ORI_PATTERN = r"Orientation\s*#?\s*(\d+)"                       # :332
TILT_PATTERN = r"Tilt\s*[/]?\s*Azimuth\s*([-\d.]+)\s*[/]\s*([-\d.]+)°?"  # :336

SCAN_SCHEMA = T.StructType(
    [
        T.StructField(
            "sections",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("pidx", T.IntegerType()),
                        T.StructField("midx", T.IntegerType()),
                        T.StructField("pos", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "oris",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("ori_id", T.StringType()),
                        T.StructField("pos", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "tilts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pos", T.IntegerType()),
                        T.StructField("tilt", T.DoubleType()),
                        T.StructField("az_pv", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


@F.pandas_udf(SCAN_SCHEMA)
def scan_positions(doc_text: pd.Series) -> pd.DataFrame:
    section_res = [
        (name, i, re.compile(pat, re.IGNORECASE))
        for i, (name, pat) in enumerate(SECTION_PATTERNS)
    ]
    ori_re = re.compile(ORI_PATTERN, re.IGNORECASE)
    tilt_re = re.compile(TILT_PATTERN, re.IGNORECASE)

    secs_out, oris_out, tilts_out = [], [], []
    for text in doc_text:
        text = text or ""
        secs = []
        for name, pidx, rx in section_res:
            for midx, m in enumerate(rx.finditer(text)):
                secs.append((name, pidx, midx, m.start()))
        oris = [(m.group(1), m.start()) for m in ori_re.finditer(text)]
        tilts = [
            (m.start(), float(m.group(1)), float(m.group(2)))
            for m in tilt_re.finditer(text)
        ]
        secs_out.append(secs)
        oris_out.append(oris)
        tilts_out.append(tilts)
    return pd.DataFrame({"sections": secs_out, "oris": oris_out, "tilts": tilts_out})


def nearest_tilt_for_orientations(oris: Column, tilts: Column) -> Column:
    """Native nearest-match join: for each orientation match, the tilt
    match minimizing |tilt.pos - ori.pos| (first wins ties) — the as-of
    join of SURVEY §2 P6, expressed with transform + array_min (no
    shuffle).  Returns array<struct<ori_id, tilt, az_pv>> (null tilt
    when no tilt matches exist)."""
    return F.transform(
        oris,
        lambda o: F.struct(
            o["ori_id"].alias("ori_id"),
            F.array_min(
                F.zip_with(
                    tilts,
                    F.sequence(F.lit(0), F.greatest(F.size(tilts) - 1, F.lit(0))),
                    lambda t, i: F.struct(
                        F.abs(t["pos"] - o["pos"]).alias("dist"),
                        i.alias("idx"),
                        t["tilt"].alias("tilt"),
                        t["az_pv"].alias("az_pv"),
                    ),
                )
            ).alias("best"),
        ),
    )
