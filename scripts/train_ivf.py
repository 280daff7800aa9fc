#!/usr/bin/env python
"""Train the IVF coarse quantizer once and FREEZE the centroids.

K-means training is a Spark job whose float results depend on
aggregation order, so the trained centroids cannot be re-derived
bit-identically inside a SQL oracle.  Instead this script trains on
the sf0.01 embeddings table (deterministic seeded Lloyd —
simsearch.train_ivf_centroids), and writes the centroids to
fixtures/ivf_trained_centroids.json.  That JSON is the single source
of truth: the `ann_ivf_trained_recall` query embeds the SAME repr'd
float literals in both the Spark plan (numpy matmul closure) and the
DuckDB oracle SQL, exactly like the deterministic hash anchors — which
is also how trained centroids reach a real cluster (model parameters
broadcast as literals, retrained offline per corpus).

Regenerate after changing the training code or corpus:
  python scripts/train_ivf.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "fixtures", "ivf_trained_centroids.json")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pvsyst_pdf_parser_spark.session import get_spark
    from pvsyst_pdf_parser_spark.training.simsearch import (
        N_CELLS,
        train_ivf_centroids,
    )

    spark = get_spark(
        "train-ivf", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(emb, dim=64, n_cells=N_CELLS, n_iter=3)
    with open(OUT, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "dim": 64,
                "n_cells": N_CELLS,
                "n_iter": 3,
                "centroids": cents,
            },
            f,
        )
        f.write("\n")
    print(f"wrote {OUT}: {len(cents)} cells x {len(cents[0])} dims")


if __name__ == "__main__":
    main()
