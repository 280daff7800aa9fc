#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus extraction throughput on a generated
skewed pages table.  Prints ONE JSON line:

  {"metric": "total_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1,
   "extraction_docs_per_sec": R, ...}

Scaling (local[8] vs local[32]) is measured by scripts/scaling_bench.py
→ BENCH/BASELINE.md (one JVM can't switch master mid-process).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q1_pricing_summary",
    "broadcast_join_revenue",
    "window_lead_gaps",
    "sessionize",
    "gap_fill_rank",
    "asof_nearest_view",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_capped",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_multiband_topk",
    "ann_ivf_topk",
    "salted_hot_key_agg",
    "text_token_count",
    "text_quality_score",
    "text_lang_id_multi",
    "text_quality_v2",
    "multimodal_metadata",
    "multimodal_frame_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 600 docs measured ~50 docs/s while 20k docs measure ~1000 docs/s on
    # the same code: at tiny corpus sizes the number is Spark fixed cost
    # (codegen, stage scheduling), not the engine.  6000 docs amortizes
    # the fixed cost into noise while keeping the bench under ~20 s.
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "6000"))
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from pvsyst_pdf_parser_spark.session import get_spark

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    timings: dict[str, float] = {}
    t_total = time.time()

    # warm the JVM/codegen path once so per-query numbers reflect
    # execution, not first-job startup
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    for name in HEADLINE:
        t0 = time.time()
        n = len(qs[name](spark, sf_dir).collect())
        timings[name] = round(time.time() - t0, 3)
        _ = n

    # extraction throughput on a deterministic skewed pages table
    from fixtures.gen import make_docs, write_pages_parquet
    from pvsyst_pdf_parser_spark.pipeline import extract_documents

    docs = make_docs(n_docs, skew=True)
    with tempfile.TemporaryDirectory() as td:
        pq_path = os.path.join(td, "pages.parquet")
        write_pages_parquet(docs, pq_path)
        pages = spark.read.parquet(pq_path)
        t0 = time.time()
        n_out = extract_documents(pages, num_partitions=cpus * 3).count()
        extract_sec = time.time() - t0

    result = {
        "metric": "total_sec",
        "value": round(time.time() - t_total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "extraction_docs": n_out,
        "extraction_sec": round(extract_sec, 3),
        "extraction_docs_per_sec": round(n_out / extract_sec, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
