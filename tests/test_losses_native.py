"""Differential test: native loss_columns (text/losses.py, the
analytics-mode L1-L7 decomposition) vs the byte-identity Python parser
(output/losses.py) on fixture losses sections."""

from __future__ import annotations

import re


def test_native_losses_match_python_parser(spark, fixture_docs):
    from pvsyst_pdf_parser_spark.output.losses import parse_array_losses
    from pvsyst_pdf_parser_spark.text.losses import loss_columns

    rows, truths = [], {}
    for d in fixture_docs:
        if not d.spec.losses:
            continue
        text = "\n".join(d.pages)
        m = re.search(r"Array losses", text, re.IGNORECASE)
        if not m:
            continue
        content = text[m.start():].strip()
        rows.append((d.url, content))
        truths[d.url] = parse_array_losses(content)
    assert rows

    df = spark.createDataFrame(rows, "url string, losses_content string")
    out = {r["url"]: r.asDict() for r in loss_columns(df).collect()}

    for url, t in truths.items():
        o = out[url]
        soil = t.get("soiling_losses", {})
        thermal = t.get("thermal_losses", {})
        iam = t.get("iam_losses", {})
        ac = t.get("ac_wiring_losses", {})
        dc = t.get("dc_wiring_losses", {})
        assert o["soiling_avg_loss_pct"] == soil.get("average_loss_fraction_percent")
        assert o["soiling_monthly_pct"] == soil.get("monthly_percentages")
        assert o["thermal_loss_pct"] == thermal.get("loss_fraction_percent")
        assert o["thermal_uc_const"] == thermal.get("uc_const_w_per_m2_k")
        assert o["thermal_uv_wind"] == thermal.get("uv_wind_w_per_m2_k_per_ms")
        assert o["mismatch_loss_pct"] == t.get("module_mismatch_losses", {}).get(
            "loss_fraction_percent"
        )
        assert o["iam_incidence_effect"] == iam.get("incidence_effect")
        assert o["iam_profile"] == iam.get("iam_profile")
        assert o["ac_loss_pct"] == ac.get("loss_fraction_percent")
        assert o["ac_inverter_vac"] == ac.get("inverter_voltage_vac")
        assert o["ac_wire_section"] == ac.get("wire_section")
        assert o["ac_wires_length_m"] == ac.get("wires_length_m")
        assert o["dc_global_resistance_mohm"] == dc.get(
            "global_wiring_resistance_mohm"
        )
        got_arrays = [
            (a["config_id"], a["notation"], a["global_array_resistance_mohm"],
             a["loss_fraction_percent"])
            for a in (o["dc_per_array"] or [])
        ]
        want_arrays = [
            (a["array_id"], a["notation"], a["global_array_resistance_mohm"],
             a["loss_fraction_percent"])
            for a in dc.get("arrays", [])
        ]
        assert got_arrays == want_arrays
