"""Array-losses parsing semantics (reference L1-L7, :1170-1372).

Runs per document inside the assembly UDF on the Array Losses section
slice.  A native column-expression variant for analytics lives in
``text/losses.py``; this replica exists for byte-identity, including the
reference's quirks:

- the five sub-section markers split a line state machine; lines before
  the first marker are dropped; repeated markers keep first position /
  last lines (dict assignment on close)
- DC wiring parses the *whole* section joined with spaces; its
  Loss-Fraction list positionally zips values captured from *other*
  sub-sections (:1331-1341) — replicated as-is
- the IAM profile keys are ints (json coerces to strings)
"""

from __future__ import annotations

import re

_MONTHS3 = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
            "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

_MARKERS = [
    (re.compile(r"Array Soiling Losses", re.IGNORECASE), "soiling_losses"),
    (re.compile(r"Thermal Loss factor", re.IGNORECASE), "thermal_losses"),
    (re.compile(r"Module mismatch losses", re.IGNORECASE), "module_mismatch_losses"),
    (re.compile(r"IAM loss factor", re.IGNORECASE), "iam_losses"),
    (re.compile(r"AC wiring losses", re.IGNORECASE), "ac_wiring_losses"),
]


def _soiling(lines):
    data = {}
    for line in lines:
        if "Average loss Fraction" in line:
            m = re.search(r"Average loss Fraction\s+([\d.]+)%", line)
            if m:
                data["average_loss_fraction_percent"] = float(m.group(1))
        elif re.search(r"\d+\.\d+%", line):
            parts = line.split()
            if len(parts) >= 12:
                data["monthly_percentages"] = {
                    _MONTHS3[i]: float(parts[i].rstrip("%")) for i in range(12)
                }
    return data


def _thermal(lines):
    data = {}
    for line in lines:
        if "Loss Fraction" in line and "Module temperature" not in line:
            m = re.search(r"Loss Fraction\s+(-?[\d.]+)%", line)
            if m:
                data["loss_fraction_percent"] = float(m.group(1))
        elif "Uc (const)" in line:
            m = re.search(r"Uc \(const\)\s+([\d.]+)", line)
            if m:
                data["uc_const_w_per_m2_k"] = float(m.group(1))
        elif "Uv (wind)" in line:
            m = re.search(r"Uv \(wind\)\s+([\d.]+)", line)
            if m:
                data["uv_wind_w_per_m2_k_per_ms"] = float(m.group(1))
    return data


def _mismatch(lines):
    data = {}
    for line in lines:
        if "Loss Fraction" in line:
            m = re.search(r"Loss Fraction\s+([\d.]+)%", line)
            if m:
                data["loss_fraction_percent"] = float(m.group(1))
    return data


def _iam(lines):
    data = {}
    for line in lines:
        line = line.strip()
        if not line:
            continue
        if "DC wiring losses" in line or "Array #" in line:
            break
        if "Incidence effect (IAM):" in line:
            m = re.search(r"Incidence effect \(IAM\):\s+(.+)", line)
            if m:
                data["incidence_effect"] = m.group(1).strip()
        elif re.search(r"\d+\.\d+", line) and not any(
            c in line for c in ["°", "mΩ", "%"]
        ):
            parts = line.split()
            if all(p.replace(".", "").replace("-", "").isdigit() for p in parts):
                factors = [float(p) for p in parts]
                angles = [0, 20, 30, 40, 50, 60, 70, 80, 90]
                data["iam_profile"] = dict(zip(angles, factors))
    return data


def _dc_wiring(lines):
    data = {"arrays": []}
    full_text = " ".join(lines)
    if "Global wiring resistance" in full_text:
        m = re.search(
            r"Global wiring resistance\s+([\d.]+)mΩ\s+Loss Fraction\s+([\d.]+)%",
            full_text,
        )
        if m:
            data["global_wiring_resistance_mohm"] = float(m.group(1))
            data["global_loss_fraction_percent"] = float(m.group(2))

    notations = [
        (int(m.group(1)), m.group(2).strip())
        for m in re.finditer(r"Array #(\d+)\s*-\s*(.+?)(?=Array #|\s*Global|$)", full_text)
    ]
    res_list = re.findall(r"Global array res\.\s*([\d.]+)mΩ", full_text)
    loss_list = re.findall(r"Loss Fraction\s+([\d.]+)%", full_text)
    if notations and len(res_list) >= len(notations) and len(loss_list) >= len(notations):
        for (array_id, notation), res, loss in zip(
            notations, res_list[: len(notations)], loss_list[: len(notations)]
        ):
            data["arrays"].append(
                {
                    "array_id": array_id,
                    "notation": notation,
                    "global_array_resistance_mohm": float(res),
                    "loss_fraction_percent": float(loss),
                }
            )
    return data


def parse_array_losses(content: str) -> dict:
    parsed: dict = {}
    lines = content.splitlines()

    sections: dict = {"array_losses": lines}
    current = None
    current_lines: list = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        for rx, name in _MARKERS:
            if rx.search(line):
                if current:
                    sections[current] = current_lines
                current = name
                current_lines = [line]
                break
        else:
            current_lines.append(line)
    if current:
        sections[current] = current_lines

    if "array_losses" in sections:
        parsed["dc_wiring_losses"] = _dc_wiring(sections["array_losses"])

    for sec, sec_lines in sections.items():
        if sec == "soiling_losses":
            parsed["soiling_losses"] = _soiling(sec_lines)
        elif sec == "thermal_losses":
            parsed["thermal_losses"] = _thermal(sec_lines)
        elif sec == "module_mismatch_losses":
            parsed["module_mismatch_losses"] = _mismatch(sec_lines)
        elif sec == "iam_losses":
            parsed["iam_losses"] = _iam(sec_lines)
        elif sec == "ac_wiring_losses":
            parsed["ac_wiring_losses"] = _ac_wiring(sec_lines)
    return parsed


def _ac_wiring(lines):
    data = {}
    for line in lines:
        if "Loss Fraction" in line:
            m = re.search(r"Loss Fraction\s+([\d.]+)%", line)
            if m:
                data["loss_fraction_percent"] = float(m.group(1))
        elif "Inverter voltage" in line:
            m = re.search(r"Inverter voltage\s+([\d.]+)Vac", line)
            if m:
                data["inverter_voltage_vac"] = float(m.group(1))
        elif "Wire section" in line:
            m = re.search(r"Wire section\s+(.+)", line)
            if m:
                data["wire_section"] = m.group(1).strip()
        elif "Wires length" in line:
            m = re.search(r"Wires length\s+([\d.]+)m", line)
            if m:
                data["wires_length_m"] = float(m.group(1))
    return data
