"""Per-document output assembly with reference-exact semantics.

The Spark stages extract typed structures (equipment strings, match
positions, monthly rows, array fields, expanded combinations).  This
module turns one document's structures into the final canonical JSON +
text report, reproducing the reference's Python-only semantics that
Spark expressions cannot match byte-for-byte (SURVEY.md §7 hard parts):

- dict key *insertion order* (json key order) per pvsyst_parser.py
  program order
- absent-vs-null keys (fields never set vs set to None)
- Python ``round()`` half-even decimal rounding (:637, :1609, :1637,
  :1771, :1874, :1901) — Spark's round/bround on doubles can differ
- float ``repr`` in json.dumps output
- order-dependent aggregation (first-seen type ids :1398-1435,
  last-wins association overwrite :1808-1820, iteration-order float
  sums :1563-1613)

Everything here is per-document O(arrays × inverters) — trivially small
next to the regex scan — and runs inside the Arrow-batched assembly UDF.
All functions are pure; no Spark imports.
"""

from __future__ import annotations

import json
import re
from collections import defaultdict

# --- small helpers -----------------------------------------------------------


def _power_number(power_str: str | None) -> float | None:
    """Numeric part of a power string; MW→kW ×1000 (reference :38-56)."""
    if not power_str:
        return None
    s = power_str.strip().lower()
    m = re.search(r"([0-9]*\.?[0-9]+)", s)
    if not m:
        return None
    value = float(m.group(1))
    if "mw" in s:
        return value * 1000.0
    return value


def _compass(az_pv: float) -> float:
    return (180.0 + az_pv) % 360.0  # reference :315-317


_INV_NUM_RE = re.compile(r"^INV\D*(\d+)$", re.IGNORECASE)
_MPPT_NUM_RE = re.compile(r"^MPPT\s*(\d+)$", re.IGNORECASE)
_INV_LABEL_RE = re.compile(r"^INV([A-Za-z]*)(\d+)$", re.IGNORECASE)


def _sort_inv_ids(ids):
    """Numeric-aware inverter sort; non-numeric ranked last (:819-827)."""
    def key(inv):
        m = _INV_NUM_RE.match(inv)
        return (int(m.group(1)), inv) if m else (10**9, inv)

    return sorted(ids, key=key)


def _sort_mppt_ids(ids):
    def key(mppt):
        m = _MPPT_NUM_RE.match(mppt)
        return (int(m.group(1)), mppt) if m else (10**9, mppt)

    return sorted(ids, key=key)


def _format_kw(kw) -> str:
    """Int-valued floats render without .0 (:1437-1447)."""
    if kw is None:
        return "?"
    try:
        fkw = float(kw)
    except (TypeError, ValueError):
        return str(kw)
    if fkw.is_integer():
        return str(int(fkw))
    return str(fkw)


# --- equipment ---------------------------------------------------------------


def build_equipment(doc: dict) -> tuple[dict, dict]:
    """module_info / inverter_info dicts in reference key order (:232-309).

    Note the reference's W normalization double-converts MW (numeric is
    already kW before the ×1e6 — :289-295); replicated as-is.
    """
    module_info: dict = {}
    inverter_info: dict = {}
    if doc.get("module_manufacturer"):
        module_info["manufacturer"] = doc["module_manufacturer"]
    if doc.get("inverter_manufacturer"):
        inverter_info["manufacturer"] = doc["inverter_manufacturer"]
    if doc.get("module_model"):
        module_info["model"] = doc["module_model"]
    if doc.get("inverter_model"):
        inverter_info["model"] = doc["inverter_model"]

    left = doc.get("module_power_raw")
    if left:
        module_info["unit_nom_power_raw"] = left
        numeric = _power_number(left)
        if numeric is not None:
            low = left.lower()
            if "mw" in low:
                module_info["unit_nom_power_w"] = int(round(numeric * 1_000_000))
            elif "kw" in low:
                module_info["unit_nom_power_w"] = int(round(numeric * 1_000))
            else:
                module_info["unit_nom_power_w"] = int(round(numeric))
    right = doc.get("inverter_power_raw")
    if right:
        inverter_info["unit_nom_power_raw"] = right
        numeric = _power_number(right)
        if numeric is not None:
            inverter_info["unit_nom_power_kw"] = numeric
    return module_info, inverter_info


# --- orientations ------------------------------------------------------------


def build_orientations(oris, tilts) -> dict:
    """Nearest-tilt association (:342-363).  The reference's 800-char
    fallback (:365-385) is unreachable — it only runs when no tilt match
    exists anywhere, in which case the windowed search finds nothing
    either — so it is intentionally not replicated."""
    orientations: dict = {}
    for ori_id, pos in oris:
        best = None
        best_dist = None
        for tpos, tilt, az_pv in tilts:
            dist = abs(tpos - pos)
            if best_dist is None or dist < best_dist:
                best_dist = dist
                best = (tilt, az_pv)
        if best:
            tilt, az_pv = best
            az = _compass(az_pv)
            orientations[ori_id] = {
                "tilt": tilt,
                "azimuth_pvsyst_deg": az_pv,
                "azimuth_deg": az,
                "azimuth_compass_deg": az,
            }
    return orientations


# --- array dict construction --------------------------------------------------


def build_array_dict(a: dict, module_unit_w, orientations: dict) -> dict:
    """One array_configurations entry, keys in parse order (:567-688 for
    Array# blocks, :959-1002 for the single-config fallback)."""
    if a.get("is_single"):
        d: dict = {
            "array_id": a["array_id"],
            "original_block_text": "PV Array Characteristics (single configuration)",
            "original_notation": "Single configuration",
            "strings": a["strings"],
            "modules_in_series": a["modules_in_series"],
            "number_of_modules": a["number_of_modules"],
            "inverter_ids": list(a["inverter_ids"]),
            "mppt_ids": list(a["mppt_ids"]),
            "inferred_single_config": True,
            "inferred_mppt_per_inverter": a["inferred_mppt_per_inverter"],
            "inferred_strings_per_mppt_max": a["inferred_strings_per_mppt_max"],
            "inferred_topology_source": a["inferred_topology_source"],
            "inferred_inverters_reported": a["inferred_inverters_reported"],
            "inferred_inverters_required": a["inferred_inverters_required"],
            "inferred_inverters_used": a["inferred_inverters_used"],
        }
        if a.get("tilt") is not None:
            az = _compass(a["azimuth_pvsyst"])
            d["tilt"] = a["tilt"]
            d["azimuth_pvsyst_deg"] = a["azimuth_pvsyst"]
            d["azimuth_deg"] = az
            d["azimuth_compass_deg"] = az
        if len(orientations) == 1:
            ori_id = next(iter(orientations))
            try:
                d["orientation_id"] = int(ori_id)
            except ValueError:
                d["orientation_id"] = ori_id
        if isinstance(module_unit_w, int) and a.get("number_of_modules") is not None:
            d["nominal_stc_kwp_from_module"] = round(
                module_unit_w * a["number_of_modules"] / 1000.0, 3
            )
        return d

    d = {
        "array_id": a["array_id"],
        "original_block_text": a["block_text"],
        "original_notation": f"Array #{a['array_id']}",
    }
    inv_ids = a.get("inverter_ids") or []
    if inv_ids:
        d["inverter_ids"] = list(inv_ids)
        d["inverter_id"] = inv_ids[0]
    if a.get("mppt_ids"):
        d["mppt_ids"] = list(a["mppt_ids"])
    if a.get("mppt_total_endpoints") is not None:
        d["mppt_total_endpoints"] = a["mppt_total_endpoints"]
        d["mppt_count"] = a["mppt_count"]
        d["mppt_share_percent"] = a["mppt_share_percent"]
        d["inverter_unit_fraction"] = a["inverter_unit_fraction"]
    if a.get("orientation_id") is not None:
        d["orientation_id"] = a["orientation_id"]
    if a.get("number_of_modules") is not None:
        d["number_of_modules"] = a["number_of_modules"]
        if isinstance(module_unit_w, int):
            d["nominal_stc_kwp_from_module"] = round(
                module_unit_w * a["number_of_modules"] / 1000.0, 3
            )
    if a.get("nominal_stc_kwp") is not None:
        d["nominal_stc_kwp"] = a["nominal_stc_kwp"]
    if a.get("strings") is not None:
        d["strings"] = a["strings"]
        d["modules_in_series"] = a["modules_in_series"]
        d["modules_config_text"] = (
            f"Modules {a['strings']} string x {a['modules_in_series']}"
        )
    if a.get("tilt") is not None:
        az = _compass(a["azimuth_pvsyst"])
        d["tilt"] = a["tilt"]
        d["azimuth_pvsyst_deg"] = a["azimuth_pvsyst"]
        d["azimuth_deg"] = az
        d["azimuth_compass_deg"] = az
    if a.get("u_mpp_v") is not None:
        d["u_mpp_v"] = a["u_mpp_v"]
    if a.get("i_mpp_a") is not None:
        d["i_mpp_a"] = a["i_mpp_a"]
    # one-block-lag propagated inverter type (:1082-1086); internal keys,
    # dropped from the final output but drive type collection
    if a.get("inv_type_manufacturer"):
        d["inverter_manufacturer"] = a["inv_type_manufacturer"]
    if a.get("inv_type_model"):
        d["inverter_model"] = a["inv_type_model"]
    return d


def backfill_single_orientation(arrays: dict, orientations: dict) -> None:
    """A15 (:1145-1162): iff exactly one orientation exists, copy it onto
    arrays lacking orientation_id — keys appended at dict end."""
    if not orientations or len(orientations) != 1:
        return
    ori_id_str, ori = next(iter(orientations.items()))
    try:
        ori_id = int(ori_id_str)
    except ValueError:
        ori_id = ori_id_str
    for arr in arrays.values():
        if "orientation_id" not in arr:
            arr["orientation_id"] = ori_id
            if "tilt" in ori:
                arr["tilt"] = ori["tilt"]
            if "azimuth_pvsyst_deg" in ori:
                arr["azimuth_pvsyst_deg"] = ori["azimuth_pvsyst_deg"]
            if "azimuth_compass_deg" in ori:
                arr["azimuth_deg"] = ori["azimuth_compass_deg"]
                arr["azimuth_compass_deg"] = ori["azimuth_compass_deg"]


# --- inverter types (G2, :1398-1435) ------------------------------------------


def collect_inverter_types(arrays: dict, inverter_info: dict) -> list:
    types: dict = {}
    counter = 1
    for arr in arrays.values():
        man = arr.get("inverter_manufacturer")
        mod = arr.get("inverter_model")
        power = arr.get("inverter_unit_nom_power_kw")
        if man or mod or power is not None:
            key = (man or "", mod or "", float(power or 0))
            if key not in types:
                types[key] = {
                    "id": f"inverter_{counter}",
                    "manufacturer": man,
                    "model": mod,
                    "unit_nom_power_kw": power,
                }
                counter += 1
            arr["inverter_type_id"] = types[key]["id"]

    g_man = inverter_info.get("manufacturer")
    g_mod = inverter_info.get("model")
    g_pow = inverter_info.get("unit_nom_power_kw")
    if g_man or g_mod or g_pow is not None:
        key = (g_man or "", g_mod or "", float(g_pow or 0))
        if key not in types:
            types[key] = {
                "id": f"inverter_{counter}",
                "manufacturer": g_man,
                "model": g_mod,
                "unit_nom_power_kw": g_pow,
            }
        for arr in arrays.values():
            arr.setdefault("inverter_type_id", types[key]["id"])
    return list(types.values())


# --- monthly + capacities (P7/P8/G3/G4/G8, :1499-1642) ------------------------


def build_monthly(monthly_rows) -> tuple[dict, dict]:
    """(globhor_by_month, e_grid_by_month) with line-order insertion."""
    globhor: dict = {}
    e_grid: dict = {}
    for _seq, month, gh, eg in monthly_rows:
        globhor[month] = gh
        e_grid[month] = eg
    return globhor, e_grid


def total_modules(doc: dict, arrays: dict) -> int:
    if doc.get("total_modules_line") is not None:
        return doc["total_modules_line"]
    return sum(int(a.get("number_of_modules") or 0) for a in arrays.values())


def inverter_capacities_and_modules(expanded, arrays: dict):
    """Reference :1563-1613 — note int() truncation of module counts."""
    by_inverter: dict = defaultdict(list)
    for combo in expanded:
        by_inverter[combo["inverter"]].append(combo)

    usage: dict = {}
    for inverter, combos in by_inverter.items():
        for combo in combos:
            usage.setdefault(str(combo["array_id"]), set()).add(inverter)

    capacities: dict = {}
    modules: dict = {}
    for inverter, combos in by_inverter.items():
        total_capacity = 0.0
        total_mods = 0
        by_array: dict = defaultdict(list)
        for combo in combos:
            by_array[str(combo["array_id"])].append(combo)
        for array_id, array_combos in by_array.items():
            if array_id not in arrays:
                continue
            arr = arrays[array_id]
            cap = float(arr.get("nominal_stc_kwp") or 0.0)
            mods = int(arr.get("number_of_modules") or 0)
            n_using = len(usage.get(array_id, set()))
            mppts_per_inv = len(array_combos)
            total_mppts = n_using * mppts_per_inv
            if total_mppts <= 0:
                continue
            total_capacity += (cap / total_mppts) * mppts_per_inv
            total_mods += int((mods / total_mppts) * mppts_per_inv)
        capacities[inverter] = round(total_capacity, 1)
        modules[inverter] = total_mods
    return capacities, modules


def monthly_allocation(e_grid_by_month: dict, inverter_modules: dict, total_mods: int):
    if not inverter_modules:
        return {}
    out: dict = {}
    for inverter, count in inverter_modules.items():
        share = count / total_mods if total_mods else 0.0
        out[inverter] = {
            m: round(v * share, 0) for m, v in e_grid_by_month.items()
        }
    return out


# --- string allocation (G5/G6, :839-886 and :1784-1806) -----------------------


def allocate_strings_capped(inv_ids, mppt_ids, total_strings, cap):
    """Capped mppt-major round-robin with uncapped overflow (:839-886)."""
    alloc = {(inv, mppt): 0 for inv in inv_ids for mppt in mppt_ids}
    remaining = int(total_strings)
    endpoints = [(inv, mppt) for mppt in mppt_ids for inv in inv_ids]
    while remaining > 0:
        progressed = False
        for key in endpoints:
            if remaining <= 0:
                break
            if alloc[key] < cap:
                alloc[key] += 1
                remaining -= 1
                progressed = True
        if not progressed:
            break
    if remaining > 0:
        idx = 0
        while remaining > 0 and endpoints:
            alloc[endpoints[idx % len(endpoints)]] += 1
            remaining -= 1
            idx += 1
    return alloc
