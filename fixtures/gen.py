"""Deterministic fixture generator: PVsyst-style reports + pages table.

Synthesizes (seeded, no external data) the Common-Crawl-style input table
``pages(url, warc_ts, html BINARY, text, lang)`` from BASELINE.json's
input_hint, whose payloads are text-layer PDF containers or HTML mirrors
of PVsyst simulation reports.

The synthesized report text exercises the grammar the reference parser
accepts (cited against /root/reference/pvsyst_parser.py):

- 10 section-header patterns (:129-139)
- two-column equipment rows after the ``PV module`` anchor (:242-305)
- ``Orientation #n`` + ``Tilt/Azimuth a/b °`` pairs (:331-385)
- ``Array #`` blocks with inverter ranges ``01-03``, ``02-05, 7,8``,
  ``R1-3`` (:394-436), MPPT headers (:596-602), glued-unit fields such
  as ``Number of PV modules 1860units`` (:628-632), ``Nominal (STC)
  1004.4kWp`` (:641-645), ``U mpp 600V`` / ``I mpp 120A`` (:672-677)
- trailing per-array equipment blocks → one-block-lag type propagation
  (:1072-1107)
- single-configuration fallback with SMA/CHINT/default topology
  heuristics (:888-1004, :787-817)
- array-losses section with the five sub-blocks (:1170-1372)
- monthly balance rows: month name + ≥8 columns, GlobHor=parts[1],
  E_Grid=parts[-2], thousands commas (:1512-1543)

Scenario cycle also covers the edge cases in FIXTURES.md §2: zero-array
docs, duplicate Array # ids, missing MPPT info (gap-fill), non-divisible
string counts, overflow beyond per-MPPT caps, HTML mirrors, text-only
rows.
"""

from __future__ import annotations

import html as _html
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]


@dataclass
class ArraySpec:
    array_id: int
    inv_spec: str                      # header text after "INV "
    mppt_spec: str | None = None       # header text after "MPPT "
    inverters_line: tuple | None = None  # (total_mppts, share_pct, unit_frac)
    orientation_id: int | None = None
    n_modules: int | None = None
    stc_kwp: float | None = None
    strings: int = 10
    series: int = 28
    tilt_az: tuple | None = None       # (tilt, azimuth_pvsyst)
    u_mpp: float | None = None
    i_mpp: float | None = None
    trailing_equipment: tuple | None = None  # (manufacturer, model, power_text)
    spaced_units: bool = False         # "500 units" (glued-regex quirk, ref :629)


@dataclass
class DocSpec:
    doc_id: int
    kind: str = "pdf"                 # pdf | html | text
    scenario: str = "multi_standard"
    site: str = "site"
    module_equipment: tuple | None = ("LONGi Solar", "LR5-72HBD-540M", "540Wp")
    inverter_equipment: tuple | None = ("Huawei", "SUN2000-100KTL-M1", "100kW")
    orientations: list = field(default_factory=list)  # [(id, tilt, az), ...]
    arrays: list = field(default_factory=list)
    single_cfg: tuple | None = None   # (n_modules, strings, series, n_inverters)
    monthly: list = field(default_factory=list)  # 12 x (globhor, e_grid)
    losses: bool = True
    loss_arrays: list = field(default_factory=list)  # [(id, notation, res, loss)]
    total_modules_line: int | None = None
    total_inverters_line: int | None = None
    duplicate_array_id: int | None = None
    filler_pages: int = 0
    unicode_ws: bool = False           # inject \t / \r / NBSP whitespace
    malformed_losses: bool = False     # drop one "Global array res." line
    spaced_total_modules: bool = False  # "Nb. of modules N units" (spaced)
    extra_chars_lines: list = field(default_factory=list)
    extra_results_lines: list = field(default_factory=list)

    @property
    def url(self) -> str:
        ext = "html" if self.kind == "html" else "pdf"
        return f"https://cc-mirror.example/{self.site}/doc_{self.doc_id:05d}.{ext}"


# ---------------------------------------------------------------------------
# Text rendering
# ---------------------------------------------------------------------------


def _fmt_num(x: float, nd: int = 1) -> str:
    return f"{x:.{nd}f}"


def _render_project_page(spec: DocSpec, npages: int) -> str:
    lines = [
        "PVsyst V7.2 - Simulation report",
        "Grid-Connected System",
        "Project summary",
        f"Project: {spec.site.title()} Solar Plant",
        f"Site name: {spec.site.title()}",
        "Country: Exampleland",
        "Geographical Site Latitude: 41.2 N",
        "Meteo data: Meteonorm 8.0",
        f"Variant: VC{spec.doc_id % 9}",
        "System power: 1.25 MWp nominal",
        f"Page 1/{npages}",
    ]
    return "\n".join(lines)


def _render_equipment_block(spec: DocSpec) -> list[str]:
    lines = []
    if spec.module_equipment or spec.inverter_equipment:
        mm, mo, mp = spec.module_equipment or ("", "", "")
        im, io_, ip = spec.inverter_equipment or ("", "", "")
        lines.append("PV module Inverter")
        lines.append(f"Manufacturer {mm} Manufacturer {im}")
        lines.append(f"Model {mo} Model {io_}")
        lines.append(f"Unit Nom. Power {mp} Unit Nom. Power {ip}")
    return lines


def _render_characteristics_page(spec: DocSpec, page_no: int, npages: int) -> str:
    lines = ["PV Array Characteristics"]

    if spec.single_cfg:
        n_modules, strings, series, n_inv = spec.single_cfg
        lines += [
            "PV Array",
            f"Number of PV modules {n_modules} units",
            f"Modules {strings} Strings x {series} In series",
        ]

    for oid, tilt, az in spec.orientations:
        lines.append(f"Orientation #{oid} Fixed plane")
        lines.append(f"Tilt/Azimuth {_fmt_num(tilt)} / {_fmt_num(az)} °")

    lines += _render_equipment_block(spec)

    if spec.total_inverters_line is not None:
        lines += [
            "Total inverter power",
            f"Total power {spec.total_inverters_line * 100} kWac",
            f"Number of inverters {spec.total_inverters_line} units",
            "Pnom ratio 1.25",
        ]

    if spec.total_modules_line is not None:
        sep = " " if spec.spaced_total_modules else ""
        lines.append(f"Nb. of modules {spec.total_modules_line}{sep}units")

    lines.extend(spec.extra_chars_lines)

    lines.append(f"Page {page_no}/{npages}")
    return "\n".join(lines)


def _render_array_block(a: ArraySpec) -> list[str]:
    header = f"Array #{a.array_id} INV {a.inv_spec}"
    if a.mppt_spec:
        header += f" MPPT {a.mppt_spec}"
    lines = [header]
    if a.inverters_line:
        total, share, frac = a.inverters_line
        lines.append(f"Number of inverters {total} * MPPT {share}% {frac} unit")
    if a.orientation_id is not None:
        lines.append(f"Orientation #{a.orientation_id}")
    if a.n_modules is not None:
        sep = " " if a.spaced_units else ""
        lines.append(f"Number of PV modules {a.n_modules}{sep}units")
    if a.stc_kwp is not None:
        lines.append(f"Nominal (STC) {a.stc_kwp}kWp")
    lines.append(f"Modules {a.strings} strings x {a.series}")
    if a.tilt_az:
        tilt, az = a.tilt_az
        lines.append(f"Tilt/Azimuth {_fmt_num(tilt)} / {_fmt_num(az)} °")
    if a.u_mpp is not None:
        lines.append(f"U mpp {a.u_mpp:g}V")
    if a.i_mpp is not None:
        lines.append(f"I mpp {a.i_mpp:g}A")
    if a.trailing_equipment:
        manu, model, power = a.trailing_equipment
        lines += [
            "PV module",
            "Manufacturer JA Solar",
            "Model JAM72S30-545",
            "Inverter",
            f"Manufacturer {manu}",
            f"Model {model}",
            f"Unit Nom. Power {power}",
        ]
    return lines


def _render_arrays_page(spec: DocSpec, page_no: int, npages: int) -> str:
    lines: list[str] = []
    for a in spec.arrays:
        lines += _render_array_block(a)
        if spec.duplicate_array_id == a.array_id:
            dup = ArraySpec(
                array_id=a.array_id, inv_spec="77", strings=a.strings,
                series=a.series, n_modules=a.n_modules,
            )
            lines += _render_array_block(dup)
    lines.append(f"Page {page_no}/{npages}")
    return "\n".join(lines)


def _render_results_page(spec: DocSpec, page_no: int, npages: int) -> str:
    lines = [
        "Main results",
        "System Production",
        "Balances and main results",
        "GlobHor DiffHor T_Amb GlobInc GlobEff EArray E_Grid PR",
        "kWh/m² kWh/m² °C kWh/m² kWh/m² kWh kWh ratio",
    ]
    for (month, (globhor, e_grid)) in zip(MONTHS, spec.monthly):
        earr = e_grid * 1.03
        lines.append(
            f"{month} {globhor:.1f} {globhor * 0.45:.1f} {10 + globhor * 0.1:.1f} "
            f"{globhor * 1.1:.1f} {globhor * 1.05:.1f} {earr:,.0f} {e_grid:,.0f} 0.845"
        )
    if spec.monthly:
        tg = sum(g for g, _ in spec.monthly)
        te = sum(e for _, e in spec.monthly)
        lines.append(f"Year {tg:.1f} {tg * 0.45:.1f} 14.8 {tg * 1.1:.1f} {tg * 1.05:.1f} {te * 1.03:,.0f} {te:,.0f} 0.845")
    lines.extend(spec.extra_results_lines)
    lines.append(f"Page {page_no}/{npages}")
    return "\n".join(lines)


def _render_losses_page(spec: DocSpec, page_no: int, npages: int) -> str:
    lines = [
        "Array losses",
        "Array Soiling Losses",
        "Average loss Fraction 2.0%",
        "Jan. Feb. Mar. Apr. May June July Aug. Sep. Oct. Nov. Dec.",
        "3.0% 3.0% 2.0% 1.0% 1.0% 1.0% 1.0% 1.0% 1.0% 2.0% 3.0% 3.0%",
        "Thermal Loss factor",
        "Module temperature according to irradiance",
        "Uc (const) 20.0 W/m²K",
        "Uv (wind) 0.0 W/m²K / m/s",
        "Loss Fraction 1.2%",
        "Module mismatch losses",
        "Loss Fraction 2.1% at MPP",
        "IAM loss factor",
        "Incidence effect (IAM): User defined profile",
        "1.000 0.998 0.992 0.981 0.961 0.919 0.826 0.599 0.000",
        "DC wiring losses",
        "Global wiring resistance 12.5mΩ Loss Fraction 1.5%",
    ]
    for i, (aid, notation, res, loss) in enumerate(spec.loss_arrays):
        if spec.malformed_losses and i == len(spec.loss_arrays) - 1:
            # malformed row: missing "Global array res." → reference's
            # res_list < notations length-guard rejects ALL per-array
            # rows (pvsyst_parser.py:1334-1341)
            lines.append(f"Array #{aid} - {notation} Loss Fraction {loss}%")
        else:
            lines.append(
                f"Array #{aid} - {notation} Global array res. {res}mΩ Loss Fraction {loss}%"
            )
    lines += [
        "AC wiring losses",
        "Inverter voltage 800Vac",
        "Loss Fraction 1.0%",
        "Wire section 3x95mm²",
        "Wires length 250m",
    ]
    lines.append(f"Page {page_no}/{npages}")
    return "\n".join(lines)


def _render_filler_page(rng: random.Random, page_no: int, npages: int) -> str:
    lines = [
        "Iso-shadings diagram" if page_no % 2 == 0 else "Horizon definition",
        "Beam shading factor (linear calculation): curves for several sun heights",
    ]
    for i in range(40):
        lines.append(
            f"h = {10 + 5 * (i % 8)} deg azimuth {rng.randint(-120, 120)} "
            f"attenuation {rng.random():.3f} factor {rng.random():.3f}"
        )
    lines.append(f"Page {page_no}/{npages}")
    return "\n".join(lines)


_NBSP = " "
_NNBSP = " "   # narrow no-break space
_EMSP = " "    # em space


def _inject_unicode_ws(page: str) -> str:
    """Deterministically inject \\t / \\r / NBSP-family whitespace into
    lines the parser grammar accepts via Unicode-aware strip/split/\\s —
    exercising the CPython-vs-Java whitespace-class parity fixes."""
    out = []
    for ln in page.split("\n"):
        if any(ln.startswith(m + " ") for m in MONTHS):
            # leading tab, NBSP first separator, CRLF line end
            head, rest = ln.split(" ", 1)
            ln = "\t" + head + _NBSP + rest + "\r"
        elif ln.startswith("Manufacturer "):
            ln = ln.replace("Manufacturer ", "Manufacturer" + _NBSP, 1)
        elif "Tilt/Azimuth" in ln:
            ln = ln.replace(" / ", _NBSP + "/" + _NNBSP)
        elif ln == "Inverter":
            ln = _NBSP + "Inverter" + _NBSP
        elif "Loss Fraction " in ln:
            ln = ln.replace("Loss Fraction ", "Loss Fraction" + _NBSP)
        elif ln.startswith("Number of PV modules "):
            ln = ln.replace("Number of PV modules ", "Number of PV modules" + _EMSP)
        elif ln.startswith("Nb. of modules"):
            ln = "\t" + ln + "\r"
        out.append(ln)
    return "\n".join(out)


def render_pages(spec: DocSpec) -> list[str]:
    """Render a DocSpec to per-page text layers (the pdfplumber view)."""
    rng = random.Random(9000 + spec.doc_id)
    has_arrays_page = bool(spec.arrays)
    npages = (
        2
        + (1 if has_arrays_page else 0)
        + (1 if spec.monthly else 0)
        + (1 if spec.losses else 0)
        + spec.filler_pages
    )
    pages = [_render_project_page(spec, npages)]
    page_no = 2
    pages.append(_render_characteristics_page(spec, page_no, npages))
    page_no += 1
    if has_arrays_page:
        pages.append(_render_arrays_page(spec, page_no, npages))
        page_no += 1
    if spec.monthly:
        pages.append(_render_results_page(spec, page_no, npages))
        page_no += 1
    if spec.losses:
        pages.append(_render_losses_page(spec, page_no, npages))
        page_no += 1
    for _ in range(spec.filler_pages):
        pages.append(_render_filler_page(rng, page_no, npages))
        page_no += 1
    if spec.unicode_ws:
        pages = [_inject_unicode_ws(p) for p in pages]
    return pages


def render_html_mirror(spec: DocSpec, main_text: str) -> bytes:
    """Wrap report text in a boilerplate-heavy HTML mirror page."""
    rng = random.Random(7000 + spec.doc_id)
    nav_links = " ".join(
        f'<a href="/r/{rng.randint(1, 999)}">Report {rng.randint(1, 999)}</a>'
        for _ in range(8)
    )
    sidebar = "".join(
        f'<li><a href="/site/{i}">Mirror site {i} archive</a></li>' for i in range(12)
    )
    body = _html.escape(main_text)
    page = f"""<!DOCTYPE html>
<html lang="en">
<head>
<title>PVsyst report mirror {spec.doc_id}</title>
<style>body {{ font-family: sans-serif; }} nav a {{ padding: 2px; }}</style>
<script>window.trackPageView && trackPageView({spec.doc_id});</script>
</head>
<body>
<header><div class="brand">SolarHost Mirror</div>
<nav>{nav_links}</nav>
</header>
<div class="layout">
<aside><h3>Archive</h3><ul>{sidebar}</ul></aside>
<main><article><h1>Simulation report</h1><pre>{body}</pre></article></main>
</div>
<footer><p>© 2026 SolarHost — <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>
</body>
</html>"""
    return page.encode("utf-8")


# ---------------------------------------------------------------------------
# Scenario builders
# ---------------------------------------------------------------------------


def _monthly(rng: random.Random) -> list:
    return [
        (round(rng.uniform(40.0, 220.0), 1), round(rng.uniform(60_000, 220_000), 0))
        for _ in range(12)
    ]


def _scn_multi_standard(spec: DocSpec, rng: random.Random) -> None:
    spec.orientations = [(1, 25.0, 0.0), (2, 20.0, -90.0)]
    spec.arrays = [
        ArraySpec(
            1, "01-03", mppt_spec="1-2", inverters_line=(6, 50.0, 3.0),
            orientation_id=1, n_modules=1860, stc_kwp=1004.4, strings=60,
            series=31, tilt_az=(25.0, 0.0), u_mpp=600.0, i_mpp=120.0,
            trailing_equipment=("Sungrow", "SG110CX", "110kW"),
        ),
        ArraySpec(
            2, "04-06", inverters_line=(6, 33.0, 2.0), orientation_id=2,
            n_modules=1206, stc_kwp=651.2, strings=39, series=31,
            tilt_az=(20.0, -90.0), u_mpp=590.0, i_mpp=78.0,
        ),
    ]
    spec.total_inverters_line = 6
    spec.monthly = _monthly(rng)
    spec.loss_arrays = [
        (1, "INV 01-03", 350.0, 1.4),
        (2, "INV 04-06", 420.0, 1.6),
    ]


def _scn_multi_complex(spec: DocSpec, rng: random.Random) -> None:
    spec.orientations = [(1, 15.0, 45.0)]
    spec.arrays = [
        ArraySpec(
            1, "02-05, 7,8", mppt_spec="1-3", orientation_id=1,
            n_modules=900, stc_kwp=486.0, strings=45, series=20,
            tilt_az=(15.0, 45.0), u_mpp=610.0, i_mpp=90.0,
        ),
        ArraySpec(
            2, "R1-3", inverters_line=(6, 40.0, 2.0), n_modules=612,
            stc_kwp=330.5, strings=34, series=18, u_mpp=605.0, i_mpp=64.0,
            trailing_equipment=("Chint Power", "CPS SCA60KTL-DO", "60kW"),
        ),
        ArraySpec(
            3, "09", n_modules=240, stc_kwp=129.6, strings=12, series=20,
            u_mpp=598.0,
        ),
        ArraySpec(
            4, "02-05, 7,8", mppt_spec=None, n_modules=61, stc_kwp=32.9,
            strings=61, series=1, i_mpp=13.0,
        ),
    ]
    spec.duplicate_array_id = 2
    spec.total_inverters_line = 8
    spec.total_modules_line = 1813
    spec.monthly = _monthly(rng)
    spec.loss_arrays = [
        (1, "INV 02-05, 7,8", 210.0, 1.2),
        (2, "INV R1-3", 305.0, 1.3),
        (3, "INV 09", 150.0, 1.1),
        (4, "INV 02-05, 7,8", 280.0, 1.5),
    ]


def _scn_single(spec: DocSpec, rng: random.Random, flavor: str) -> None:
    spec.arrays = []
    spec.orientations = [(1, 12.0, 20.0)]
    if flavor == "sma":
        spec.inverter_equipment = ("SMA", "Sunny Tripower CORE1 50", "50kW")
        spec.single_cfg = (578, 34, 17, 4)   # strings 34 ≤ 4*6*2=48
    elif flavor == "chint":
        spec.inverter_equipment = ("Chint Power Systems", "CPS SCA50KTL-DO", "50kW")
        spec.single_cfg = (612, 36, 17, 2)   # 36 ≤ 2*3*6
    elif flavor == "overflow":
        spec.inverter_equipment = ("SMA", "Sunny Tripower CORE1 62", "62kW")
        spec.single_cfg = (1040, 52, 20, 3)  # 52 > 3*6*2=36 → overflow path
    else:
        spec.inverter_equipment = ("Acme Power", "AP-100X", "100kW")
        spec.single_cfg = (400, 20, 20, 2)   # default topology (1, strings)
    spec.total_inverters_line = spec.single_cfg[3]
    spec.monthly = _monthly(rng)
    spec.loss_arrays = []


def _scn_empty(spec: DocSpec, rng: random.Random) -> None:
    spec.arrays = []
    spec.orientations = []
    spec.module_equipment = None
    spec.inverter_equipment = None
    spec.single_cfg = None
    spec.monthly = _monthly(rng)
    spec.losses = False
    spec.total_inverters_line = None


def _scn_gapfill(spec: DocSpec, rng: random.Random) -> None:
    """Arrays sharing inverters, one without any MPPT info → G1 gap labels."""
    spec.orientations = [(1, 30.0, 10.0)]
    spec.arrays = [
        ArraySpec(
            1, "01-02", mppt_spec="1-2", orientation_id=1, n_modules=560,
            stc_kwp=302.4, strings=28, series=20, tilt_az=(30.0, 10.0),
            u_mpp=600.0, i_mpp=56.0,
        ),
        ArraySpec(
            2, "01-02", n_modules=140, stc_kwp=75.6, strings=7, series=20,
            u_mpp=600.0, i_mpp=14.0,
        ),
    ]
    spec.total_inverters_line = 2
    spec.monthly = _monthly(rng)
    spec.loss_arrays = [(1, "INV 01-02", 200.0, 1.2), (2, "INV 01-02", 260.0, 1.3)]


def _scn_no_monthly(spec: DocSpec, rng: random.Random) -> None:
    _scn_multi_standard(spec, rng)
    spec.monthly = []


def _scn_unicode_ws(spec: DocSpec, rng: random.Random) -> None:
    """multi_standard content with \\t / \\r / NBSP-family whitespace
    injected into accepted lines (CPython Unicode-strip/split parity)."""
    _scn_multi_standard(spec, rng)
    spec.unicode_ws = True


def _scn_adversarial(spec: DocSpec, rng: random.Random) -> None:
    """Reference-quirk edge cases: glued-vs-spaced units (:629 vs :897),
    orientation with no tilt anywhere near (:342-385 nearest/800-window),
    descending + punctuated range specs, huge labeled MPPT number next
    to a NULL-mppt combo (gap-fill bound), malformed losses table
    (res_list < notations → all per-array rows rejected, :1334-1341),
    monthly rows that fail each acceptance rule, inverter-count
    mismatch vs the Total-inverter-power section."""
    spec.orientations = [(1, 18.0, -45.0)]
    spec.arrays = [
        # spaced units → array-block glued regex misses number_of_modules
        ArraySpec(
            1, "01-02", mppt_spec="1 - 2", orientation_id=1, n_modules=500,
            stc_kwp=270.0, strings=25, series=20, tilt_az=(18.0, -45.0),
            u_mpp=600.0, i_mpp=50.0, spaced_units=True,
        ),
        # huge labeled MPPT number; array 3 below shares INV03 with a
        # NULL-mppt combo → gap-fill must assign 1,2,... not 998 slots
        ArraySpec(
            2, "03", mppt_spec="999", n_modules=120, stc_kwp=64.8,
            strings=6, series=20, u_mpp=598.0,
        ),
        ArraySpec(
            3, "03", n_modules=60, stc_kwp=32.4, strings=3, series=20,
            i_mpp=6.0,
        ),
        # descending range expands to nothing → no inverters → no combos
        ArraySpec(
            4, "05-03", n_modules=240, stc_kwp=129.6, strings=12,
            series=20, u_mpp=600.0,
        ),
    ]
    # orientation mention with no nearby tilt (nearest-join binds the far
    # one; also exercises the mention-without-own-tilt path)
    spec.extra_chars_lines = ["Orientation #7 Unlabeled plane"]
    spec.total_inverters_line = 5      # parsed arrays imply 3 → mismatch
    spec.total_modules_line = 920
    spec.spaced_total_modules = True   # ":1560 glued regex → no match"
    spec.monthly = _monthly(rng)
    # monthly rows that must be REJECTED: <8 tokens; non-numeric parts[1]
    spec.extra_results_lines = [
        "January 12.3 45.6",
        "February n/a 1.0 2.0 3.0 4.0 5.0 6.0 7.0 8.0",
    ]
    spec.malformed_losses = True
    spec.loss_arrays = [
        (1, "INV 01-02", 180.0, 1.1),
        (2, "INV 03", 220.0, 1.2),
        (3, "INV 03", 260.0, 1.3),
    ]


SCENARIOS = [
    ("multi_standard", lambda s, r: _scn_multi_standard(s, r)),
    ("multi_complex", lambda s, r: _scn_multi_complex(s, r)),
    ("single_sma", lambda s, r: _scn_single(s, r, "sma")),
    ("single_chint", lambda s, r: _scn_single(s, r, "chint")),
    ("single_default", lambda s, r: _scn_single(s, r, "default")),
    ("single_overflow", lambda s, r: _scn_single(s, r, "overflow")),
    ("gapfill", lambda s, r: _scn_gapfill(s, r)),
    ("empty", lambda s, r: _scn_empty(s, r)),
    ("no_monthly", lambda s, r: _scn_no_monthly(s, r)),
    ("unicode_ws", lambda s, r: _scn_unicode_ws(s, r)),
    ("adversarial", lambda s, r: _scn_adversarial(s, r)),
]


@dataclass
class DocFixture:
    spec: DocSpec
    pages: list[str]          # ground-truth text layer, per page
    payload: bytes | None     # html column
    text: str | None          # text column

    @property
    def url(self) -> str:
        return self.spec.url

    @property
    def doc_text(self) -> str:
        return "\n".join(self.pages)


def make_docs(n_docs: int, seed: int = 42, skew: bool = False) -> list[DocFixture]:
    """Build n deterministic fixture docs cycling through scenarios.

    Every 10th doc is an HTML mirror; every 17th is a text-only row
    (payload null, pre-extracted text column). ``skew=True`` adds a
    long-tail filler-page distribution to induce realistic decode skew.
    """
    return _make_docs_range(0, n_docs, seed=seed, skew=skew)


def _make_docs_range(
    lo: int, hi: int, seed: int = 42, skew: bool = False
) -> list[DocFixture]:
    from pvsyst_pdf_parser_spark.io.payload import encode_textlayer_pdf

    docs: list[DocFixture] = []
    for i in range(lo, hi):
        rng = random.Random(seed * 1_000_003 + i)
        name, build = SCENARIOS[i % len(SCENARIOS)]
        kind = "pdf"
        if i % 10 == 3:
            kind = "html"
        elif i % 17 == 5:
            kind = "text"
        spec = DocSpec(doc_id=i, kind=kind, scenario=name, site=f"site{i % 7}")
        build(spec, rng)
        if skew and kind == "pdf":
            # realistic report sizes: most 5-15 pages, long tail of huge
            # reports (the decode-stage skew driver)
            r = rng.random()
            if r < 0.5:
                spec.filler_pages = rng.randint(2, 6)
            elif r < 0.95:
                spec.filler_pages = rng.randint(8, 16)
            else:
                spec.filler_pages = rng.randint(30, 60)
        pdf_pages = render_pages(spec)
        if kind == "html":
            main_text = "\n".join(pdf_pages)
            docs.append(
                DocFixture(spec, [main_text], render_html_mirror(spec, main_text), None)
            )
        elif kind == "text":
            main_text = "\n".join(pdf_pages)
            docs.append(DocFixture(spec, [main_text], None, main_text))
        else:
            docs.append(
                DocFixture(spec, pdf_pages, encode_textlayer_pdf(pdf_pages), None)
            )
    return docs


def write_pages_dataset(
    n_docs: int, out_dir: str, seed: int = 42, skew: bool = True,
    chunk: int = 20_000,
) -> str:
    """Generate a large pages dataset chunk-wise (bounded memory) into a
    parquet directory; returns the directory path."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for start in range(0, n_docs, chunk):
        n = min(chunk, n_docs - start)
        docs = _make_docs_range(start, start + n, seed=seed, skew=skew)
        write_pages_parquet(docs, os.path.join(out_dir, f"part-{start:08d}.parquet"))
    return out_dir


def write_pages_parquet(docs: list[DocFixture], path: str) -> None:
    """Write the pages table (url, warc_ts, html, text, lang) as parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    table = pa.table(
        {
            "url": pa.array([d.url for d in docs], pa.string()),
            "warc_ts": pa.array(
                [t0 + timedelta(minutes=17 * d.spec.doc_id) for d in docs],
                pa.timestamp("us", tz="UTC"),
            ),
            "html": pa.array([d.payload for d in docs], pa.binary()),
            "text": pa.array([d.text for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
        }
    )
    # modest row groups: parallel-scan granularity + bounded reader
    # buffers for the binary payload column
    pq.write_table(table, path, row_group_size=1024)
