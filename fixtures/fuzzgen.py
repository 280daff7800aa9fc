"""Randomized DocSpec generator for differential fuzzing.

Draws documents from the grammar the reference parser accepts —
including its quirk corners (glued vs spaced units, descending ranges,
alpha-prefixed ranges, huge MPPT labels, duplicate array ids, malformed
losses rows, Unicode whitespace) — so the byte-identity property is
checked on inputs nobody hand-picked.  Seeded and deterministic: the
same seed always yields the same corpus (CI reruns are reproducible;
a failing seed is a permanent regression test).
"""

from __future__ import annotations

import random

from .gen import ArraySpec, DocSpec, render_pages

_INV_SPECS = [
    "01-03", "02-05, 7,8", "R1-3", "09", "1,2,3", "7", "03, 05",
    "A1-2", "05-03", "01-08", "2-4, 6", "B07",
]
_MPPT_SPECS = [None, "1-2", "1 - 3", "2", "1,3", "999", "#2", "1-4", "3,1"]
_EQUIP = [
    ("LONGi Solar", "LR5-72HBD-540M", "540Wp"),
    ("JA Solar", "JAM72S30-545", "545 Wp"),
    ("Trina", "TSM-DE21", "0.6kW"),
    None,
]
_INV_EQUIP = [
    ("Huawei", "SUN2000-100KTL-M1", "100kW"),
    ("SMA", "Sunny Tripower CORE1 50", "50kW"),
    ("Chint Power Systems", "CPS SCA50KTL-DO", "50kW"),
    ("Acme Power", "AP-100X", "0.1MW"),
    None,
]
_TRAILING = [
    ("Sungrow", "SG110CX", "110kW"),
    ("Chint Power", "CPS SCA60KTL-DO", "60kW"),
    None,
    None,
]


def _random_array(rng: random.Random, aid: int) -> ArraySpec:
    return ArraySpec(
        array_id=aid,
        inv_spec=rng.choice(_INV_SPECS),
        mppt_spec=rng.choice(_MPPT_SPECS),
        inverters_line=(
            (rng.randint(1, 12), round(rng.uniform(10, 100), 1), float(rng.randint(1, 4)))
            if rng.random() < 0.5
            else None
        ),
        orientation_id=rng.choice([None, 1, 2, 3, 7]),
        n_modules=rng.choice([None, rng.randint(20, 4000)]),
        stc_kwp=rng.choice([None, round(rng.uniform(10, 2000), 1)]),
        strings=rng.randint(1, 80),
        series=rng.randint(1, 40),
        tilt_az=(
            (round(rng.uniform(0, 45), 1), round(rng.uniform(-180, 180), 1))
            if rng.random() < 0.6
            else None
        ),
        u_mpp=rng.choice([None, round(rng.uniform(100, 900), 1)]),
        i_mpp=rng.choice([None, round(rng.uniform(1, 200), 1)]),
        trailing_equipment=rng.choice(_TRAILING),
        spaced_units=rng.random() < 0.3,
    )


def random_doc(doc_id: int, seed: int) -> DocSpec:
    rng = random.Random(seed * 7_654_321 + doc_id)
    spec = DocSpec(
        doc_id=doc_id,
        kind="pdf",
        scenario="fuzz",
        site=f"fuzz{doc_id % 5}",
        module_equipment=rng.choice(_EQUIP),
        inverter_equipment=rng.choice(_INV_EQUIP),
    )
    spec.orientations = [
        (i + 1, round(rng.uniform(0, 45), 1), round(rng.uniform(-180, 180), 1))
        for i in range(rng.randint(0, 3))
    ]
    n_arrays = rng.randint(0, 5)
    spec.arrays = [_random_array(rng, i + 1) for i in range(n_arrays)]
    if n_arrays >= 2 and rng.random() < 0.3:
        spec.duplicate_array_id = rng.randint(1, n_arrays)
    if n_arrays == 0 and rng.random() < 0.6:
        spec.single_cfg = (
            rng.randint(50, 2000),
            rng.randint(2, 60),
            rng.randint(5, 30),
            rng.randint(1, 8),
        )
    if rng.random() < 0.8:
        spec.monthly = [
            (round(rng.uniform(20.0, 250.0), 1), round(rng.uniform(1e4, 5e5), 0))
            for _ in range(rng.randint(1, 12))
        ]
        spec.extra_results_lines = rng.sample(
            [
                "January 1.0 2.0",
                "March bogus 1 2 3 4 5 6 7 8",
                "May 1,234.5 2.0 3.0 4.0 5.0 6.0 70,000 8.0",
            ],
            rng.randint(0, 3),
        )
    spec.losses = rng.random() < 0.8
    if spec.losses and spec.arrays:
        spec.loss_arrays = [
            (a.array_id, f"INV {a.inv_spec}", round(rng.uniform(50, 500), 1),
             round(rng.uniform(0.5, 3.0), 1))
            for a in spec.arrays
            if rng.random() < 0.8
        ]
        spec.malformed_losses = rng.random() < 0.3
    spec.total_inverters_line = rng.choice([None, rng.randint(1, 12)])
    spec.total_modules_line = rng.choice([None, rng.randint(100, 5000)])
    spec.spaced_total_modules = rng.random() < 0.4
    if rng.random() < 0.25:
        spec.unicode_ws = True
    spec.filler_pages = rng.choice([0, 0, 1, 3])
    return spec


def make_fuzz_docs(n: int, seed: int = 1337):
    """[(spec, pages)] — deterministic randomized corpus."""
    out = []
    for i in range(n):
        spec = random_doc(i, seed)
        out.append((spec, render_pages(spec)))
    return out
