#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule (N → 4N
executors proxied by local[8] vs local[32] on identical input).

Runs the extraction pipeline in fresh subprocesses (one JVM per
master), reports throughput at both levels and efficiency =
(T32/T8)/4, plus the single-process reference-parser floor.
Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); pages_path = sys.argv[2]; reps = int(sys.argv[3])
from pvsyst_pdf_parser_spark.session import get_spark
from pvsyst_pdf_parser_spark.pipeline import extract_documents
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  extra_conf={{"spark.ui.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(pages_path)
# warm-up pass compiles the plan so the measured passes are execution
extract_documents(pages.limit(8), num_partitions=cpus).count()
# min of N reps: the sandbox host is noisy (neighbor load); min is the
# least-contended estimate of the job's true cost
best = None
for _ in range(reps):
    spark.catalog.clearCache()
    t0 = time.time()
    n = extract_documents(pages, num_partitions=cpus * 2).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cpus": cpus, "docs": n, "sec": best,
                   "docs_per_sec": n / best}}))
"""


def run_level(cpus: int, pages_path: str, reps: int = 3) -> dict:
    script = _CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), pages_path, str(reps)],
        capture_output=True, text=True, timeout=2800,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"child local[{cpus}] failed rc={out.returncode}")
    print(f"local[{cpus}]: {out.stdout.strip().splitlines()[-1]}", file=sys.stderr)
    return json.loads(out.stdout.strip().splitlines()[-1])


def reference_floor(n_docs: int = 40) -> dict:
    """Single-process reference parser throughput (sanity floor)."""
    sys.path.insert(0, REPO)
    from fixtures.gen import make_docs
    from fixtures.refharness import run_reference

    import tempfile

    docs = [d for d in make_docs(n_docs) if d.spec.kind == "pdf"]
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        for i, d in enumerate(docs):
            run_reference(d.pages, td, f"doc_{i:05d}")
        dt = time.time() - t0
    return {"docs": len(docs), "sec": dt, "docs_per_sec": len(docs) / dt}


def main() -> None:
    import tempfile

    sys.path.insert(0, REPO)
    from fixtures.gen import write_pages_dataset

    n_docs = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "240000"))
    pages_path = os.environ.get("SPARK_GRAFT_PAGES_DIR")
    if not pages_path:
        tmp = tempfile.mkdtemp(prefix="scaling_pages_")
        pages_path = write_pages_dataset(n_docs, os.path.join(tmp, "pages"))
    print(f"corpus: {pages_path}", file=sys.stderr)

    low = run_level(8, pages_path)
    high = run_level(32, pages_path)
    ref = reference_floor()
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / 4.0
    result = {
        "n_docs": n_docs,
        "local8": low,
        "local32": high,
        "scaling_efficiency": round(eff, 3),
        "reference_single_process": ref,
    }
    print(json.dumps(result, indent=2))

    md = f"""# BENCH — measured baseline (two-parallelism scaling evidence)

North-rule criterion: ≥0.8 throughput scaling efficiency from N to 4N
executors, evidenced in this sandbox by the same extraction job at
local[8] vs local[32] on identical input (BASELINE.md protocol).

Input: {n_docs} deterministic mixed PDF/HTML/text docs with long-tail
page-count skew (fixtures.gen.make_docs(skew=True)); pipeline =
pvsyst_pdf_parser_spark.pipeline.extract_documents (decode → extract →
assemble → canonical JSON), measured after a warm-up pass.

| config | docs | wall sec | docs/sec |
|---|---|---|---|
| local[8]  | {low["docs"]} | {low["sec"]:.2f} | {low["docs_per_sec"]:.2f} |
| local[32] | {high["docs"]} | {high["sec"]:.2f} | {high["docs_per_sec"]:.2f} |
| reference parser, single CPython process | {ref["docs"]} | {ref["sec"]:.2f} | {ref["docs_per_sec"]:.2f} |

**Scaling efficiency (T32/T8)/4 = {eff:.3f}** (gate: ≥ 0.8)

Single-process reference floor: the Spark pipeline at local[8] should
beat docs/sec × ~core-count minus constant overhead; see the table.

Regenerate: `python scripts/scaling_bench.py`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
