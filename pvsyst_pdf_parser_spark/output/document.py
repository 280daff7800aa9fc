"""Top-level per-document output builder (reference O1-O7 + G4-G10).

Consumes the Spark-extracted structures for one url and emits the
canonical JSON string + text report, byte-identical to the reference's
``parse_pdf`` artifacts (pvsyst_parser.py:1677-1948, :1648-1675).
"""

from __future__ import annotations

import json
from collections import defaultdict

from . import refsemantics as R
from .losses import parse_array_losses


def _rename_array_id_to_config_id(obj):
    """Recursive key rename (:1682-1691)."""
    if isinstance(obj, dict):
        return {
            ("config_id" if k == "array_id" else k): _rename_array_id_to_config_id(v)
            for k, v in obj.items()
        }
    if isinstance(obj, list):
        return [_rename_array_id_to_config_id(x) for x in obj]
    return obj


_INTERNAL_ARRAY_KEYS = [
    "expanded_combinations",
    "original_notation",
    "inverter_manufacturer",
    "inverter_model",
    "inverter_unit_nom_power_raw",
    "inverter_unit_nom_power_kw",
    "module_manufacturer",
    "module_model",
    "module_unit_nom_power_raw",
    "module_unit_nom_power_w",
]


def build_document(doc: dict) -> tuple[str, str]:
    """doc → (structured_json, analysis_text).

    Expected keys (see output/assemble.py for the Spark row mapping):
    n_sections, losses_content, total_modules_line,
    module_manufacturer/model/power_raw, inverter_manufacturer/model/
    power_raw, oris, tilts, monthly_rows, arrays, combos.
    """
    module_info, inverter_info = R.build_equipment(doc)
    orientations = R.build_orientations(doc.get("oris") or [], doc.get("tilts") or [])

    # arrays dict in first-seen block order (:1056-1113)
    arrays: dict = {}
    for a in doc.get("arrays") or []:
        arrays[a["array_id"]] = R.build_array_dict(
            a, module_info.get("unit_nom_power_w"), orientations
        )

    # expanded combinations in expansion order, MPPT labels already
    # gap-filled by the Spark G1 stage (:1116-1143)
    expanded = [
        {
            "array_id": c["array_id"],
            "inverter": c["inverter"],
            "mppt": c["mppt"],
            "original_notation": c["original_notation"],
        }
        for c in (doc.get("combos") or [])
    ]

    R.backfill_single_orientation(arrays, orientations)
    inverter_types = R.collect_inverter_types(arrays, inverter_info)

    # monthly + capacities (:1615-1642)
    globhor_by_month, e_grid_by_month = R.build_monthly(doc.get("monthly_rows") or [])
    total_mods = R.total_modules(doc, arrays)
    capacities, inverter_modules = R.inverter_capacities_and_modules(expanded, arrays)
    monthly_production = R.monthly_allocation(
        e_grid_by_month, inverter_modules, total_mods
    )

    # array losses (:1985-1994): failures leave {}
    array_losses: dict = {}
    if doc.get("losses_content"):
        try:
            array_losses = parse_array_losses(doc["losses_content"])
        except Exception:  # noqa: BLE001 - reference warns and continues
            array_losses = {}

    # ---- _build_output_data replica (:1677-1939) ----
    array_configurations = {
        k: {kk: vv for kk, vv in v.items() if kk not in _INTERNAL_ARRAY_KEYS}
        for k, v in arrays.items()
    }
    array_configurations = {
        k: _rename_array_id_to_config_id(v) for k, v in array_configurations.items()
    }

    # per-array string allocation over unique endpoints (:1718-1806)
    mppt_allocation: dict = {}
    combos_by_array: dict = defaultdict(list)
    for combo in expanded:
        if combo.get("mppt") is None:
            continue
        combos_by_array[str(combo["array_id"])].append(
            (combo["inverter"], str(combo["mppt"]))
        )

    for arr_id, pairs in combos_by_array.items():
        unique_endpoints = sorted(set(pairs))
        n_endpoints = len(unique_endpoints)
        arr = arrays.get(arr_id, {})
        strings_val = arr.get("strings")
        series_val = arr.get("modules_in_series")
        strings = int(strings_val) if isinstance(strings_val, int) else 0
        series = int(series_val) if isinstance(series_val, int) else 0
        stc_kwp = arr.get("nominal_stc_kwp_from_module") or arr.get("nominal_stc_kwp")
        if not isinstance(stc_kwp, (int, float)):
            stc_kwp = None
        total_modules_arr = strings * series

        if arr.get("inferred_single_config"):
            cap = arr.get("inferred_strings_per_mppt_max")
            if isinstance(cap, int) and cap > 0:
                inv_ids = R._sort_inv_ids(sorted({i for i, _ in unique_endpoints}))
                mppt_ids = R._sort_mppt_ids(sorted({m for _, m in unique_endpoints}))
                alloc = R.allocate_strings_capped(inv_ids, mppt_ids, strings, cap)
                for inv, mppt in unique_endpoints:
                    strings_here = int(alloc.get((inv, mppt), 0))
                    modules_here = strings_here * series
                    dc = (
                        round(float(stc_kwp) * (modules_here / total_modules_arr), 3)
                        if stc_kwp and total_modules_arr
                        else None
                    )
                    mppt_allocation[(inv, mppt, arr_id)] = {
                        "strings": strings_here,
                        "modules": modules_here,
                        "dc_kwp": dc,
                    }
                continue

        base = strings // n_endpoints if n_endpoints else 0
        remainder = strings % n_endpoints if n_endpoints else 0
        for idx, (inv, mppt) in enumerate(unique_endpoints):
            strings_here = base + (1 if idx < remainder else 0)
            modules_here = strings_here * series
            dc = (
                round(float(stc_kwp) * (modules_here / total_modules_arr), 3)
                if stc_kwp and total_modules_arr
                else None
            )
            mppt_allocation[(inv, mppt, arr_id)] = {
                "strings": strings_here,
                "modules": modules_here,
                "dc_kwp": dc,
            }

    # associations: later duplicate (inv, mppt) overwrites (:1808-1824)
    associations: dict = {}
    for combo in expanded:
        mppt = combo.get("mppt")
        if mppt is None:
            continue
        inv_id = combo["inverter"]
        mppt = str(mppt)
        config_id = str(combo["array_id"])
        associations.setdefault(inv_id, {})
        alloc = mppt_allocation.get((inv_id, mppt, config_id), {})
        associations[inv_id][mppt] = {"config_id": config_id, **alloc}

    type_by_id = {
        str(t.get("id")): t
        for t in inverter_types
        if isinstance(t, dict) and t.get("id") is not None
    }

    def inverter_type_for(inv_id):
        tid = None
        for combo in expanded:
            if combo.get("inverter") != inv_id:
                continue
            arr = arrays.get(str(combo.get("array_id")), {})
            t = arr.get("inverter_type_id")
            if t:
                tid = str(t)
                break
        return type_by_id.get(tid) if tid and tid in type_by_id else None

    def display_name(inv_id):
        """:1449-1497"""
        tid = None
        for combo in expanded:
            if combo.get("inverter") != inv_id:
                continue
            arr = arrays.get(str(combo.get("array_id")), {})
            t = arr.get("inverter_type_id")
            if t:
                tid = str(t)
                break
        type_data = type_by_id.get(tid or "") if tid else None
        manufacturer = model = unit_kw = None
        if type_data:
            manufacturer = type_data.get("manufacturer")
            model = type_data.get("model")
            unit_kw = type_data.get("unit_nom_power_kw")
        manufacturer = manufacturer or inverter_info.get("manufacturer")
        model = model or inverter_info.get("model")
        unit_kw = unit_kw or inverter_info.get("unit_nom_power_kw")
        if manufacturer is None and model is None and unit_kw is None:
            return inv_id
        kw_str = R._format_kw(unit_kw)
        manu_model = f"{manufacturer or 'Unknown'} {model or ''}".strip()
        label = inv_id
        m = R._INV_LABEL_RE.match(inv_id)
        if m and not m.group(1):
            label = f"Inv {int(m.group(2)):02d}"
        return f"{label} - ({kw_str} kW) - {manu_model}"

    # inverter_summary (:1846-1909)
    inverter_summary: dict = {}
    for inv_id in sorted(associations.keys()):
        cap = float(capacities.get(inv_id, 0.0) or 0.0)
        monthly = monthly_production.get(inv_id, {})
        annual = float(sum(monthly.values()))

        combined = []
        for mppt, assoc in sorted(associations[inv_id].items()):
            config_id = str(assoc.get("config_id"))
            arr = arrays.get(config_id, {})
            strings_total = arr.get("strings")
            strings_on_mppt = assoc.get("strings")
            i_mpp_total = arr.get("i_mpp_a")
            i_mpp_mppt = i_mpp_total
            if (
                isinstance(i_mpp_total, (int, float))
                and isinstance(strings_total, int)
                and strings_total > 0
            ):
                per_string = i_mpp_total / strings_total
                if isinstance(strings_on_mppt, int) and strings_on_mppt > 0:
                    i_mpp_mppt = round(per_string * strings_on_mppt, 3)
                else:
                    i_mpp_mppt = round(per_string, 3)
            combined.append(
                {
                    "mppt": mppt,
                    "config_id": config_id,
                    "strings": strings_on_mppt,
                    "modules": assoc.get("modules"),
                    "dc_kwp": assoc.get("dc_kwp"),
                    "tilt": arr.get("tilt"),
                    "azimuth": arr.get("azimuth_deg")
                    if arr.get("azimuth_deg") is not None
                    else arr.get("azimuth_compass_deg"),
                    "modules_in_series": arr.get("modules_in_series"),
                    "u_mpp_v": arr.get("u_mpp_v"),
                    "i_mpp_a": i_mpp_mppt,
                }
            )

        inverter_summary[inv_id] = {
            "description": display_name(inv_id),
            "pv_module": module_info,
            "inverter_type": inverter_type_for(inv_id),
            "capacity_kwp": cap,
            "annual_production_kwh": annual,
            "specific_production_kwh_per_kwp": round(annual / cap, 0)
            if cap > 0
            else 0,
            "monthly_production": monthly,
            "associations": associations[inv_id],
            "combined_configuration": combined,
        }

    total_capacity_kwp = sum(capacities.values()) if capacities else 0.0
    total_annual_kwh = (
        sum(e_grid_by_month.values()) if e_grid_by_month else 0.0
    )

    output = {
        "metadata": {
            "version": "v3",
            "total_arrays": len(arrays),
            "total_expanded_combinations": len(expanded),
            "total_inverters": len(associations),
            "total_system_capacity_kwp": total_capacity_kwp,
            "total_annual_production_kwh": total_annual_kwh,
        },
        "pv_module": module_info,
        "inverter": inverter_info,
        "inverter_types": inverter_types,
        "array_configurations": array_configurations,
        "associations": associations,
        "inverter_summary": inverter_summary,
        "system_monthly_production": e_grid_by_month,
        "system_monthly_globhor": globhor_by_month,
        "orientations": orientations,
        "array_losses": _rename_array_id_to_config_id(array_losses),
    }

    report = _text_report(
        n_arrays=len(arrays),
        n_expanded=len(expanded),
        capacities=capacities,
        n_sections=doc.get("n_sections") or 0,
        monthly_production=monthly_production,
        array_losses=array_losses,
        display_name=display_name,
    )
    return json.dumps(output, indent=2, ensure_ascii=False), report


def _text_report(
    *, n_arrays, n_expanded, capacities, n_sections, monthly_production,
    array_losses, display_name,
) -> str:
    """Analysis text replica (:1648-1675 + :1374-1392)."""
    out = []
    out.append("PVsyst PDF Analysis Report (V3)\n")
    out.append("=" * 60 + "\n\n")
    out.append("SUMMARY\n" + "-" * 20 + "\n")
    out.append(f"Total Arrays Found: {n_arrays}\n")
    out.append(f"Total Expanded Combinations: {n_expanded}\n")
    out.append(f"Total Inverters: {len(capacities)}\n")
    out.append(f"Sections Identified: {n_sections}\n\n")

    if monthly_production:
        out.append("MONTHLY PRODUCTION SUMMARY\n" + "-" * 35 + "\n")
        for inverter in sorted(monthly_production.keys()):
            cap = float(capacities.get(inverter, 0.0) or 0.0)
            annual = sum(monthly_production[inverter].values())
            spec = (annual / cap) if cap > 0 else 0.0
            out.append(
                f"{display_name(inverter)}: {cap:.1f} kWp, "
                f"{annual:,.0f} kWh/year ({spec:.0f} kWh/kWp)\n"
            )
        out.append("\n")

    if array_losses:
        out.append("ARRAY LOSSES\n" + "-" * 15 + "\n")
        for key, value in array_losses.items():
            out.append(f"{key.replace('_', ' ').title()}:\n")
            if isinstance(value, dict):
                for sub_key, sub_value in value.items():
                    out.append(
                        f"  {sub_key.replace('_', ' ').title()}: {sub_value}\n"
                    )
            elif isinstance(value, list):
                for item in value:
                    if isinstance(item, dict):
                        for sub_key, sub_value in item.items():
                            out.append(
                                f"  {sub_key.replace('_', ' ').title()}: {sub_value}\n"
                            )
                        out.append("\n")
                    else:
                        out.append(f"  {item}\n")
            else:
                out.append(f"  {value}\n")
            out.append("\n")
    return "".join(out)
