"""Train the hashed-BoW quality model deterministically and freeze it
to fixtures/quality_model.json (the single source of truth both the
Spark query and the DuckDB oracle embed as literals — the same
contract as fixtures/ivf_trained_centroids.json).

Usage: python scripts/train_quality.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pvsyst_pdf_parser_spark.session import get_spark
    from pvsyst_pdf_parser_spark.training.qualitymodel import (
        N_BUCKETS,
        quality_model_report,
        train_quality_model,
    )

    spark = get_spark(
        "train-quality", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights, bias = train_quality_model(docs)

    rep = quality_model_report(docs, weights, bias).collect()
    n = sum(r["n_docs"] for r in rep)
    agree = sum(r["n_agree"] for r in rep)
    print(f"trained on {sf_dir}: agreement {agree}/{n} = {agree / n:.3f}")

    out = os.path.join(REPO, "fixtures", "quality_model.json")
    with open(out, "w") as f:
        json.dump(
            {
                "n_buckets": N_BUCKETS,
                "weights": weights,
                "bias": bias,
                "trained_on": os.path.basename(os.path.normpath(sf_dir)),
            },
            f,
        )
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
