"""Freeze the BPE merge table: train bpe_train_merges at sf0.01 and
commit the result to fixtures/bpe_merges.json — the single source of
truth both the Spark encoder (closure literals) and the DuckDB oracle
(chained literal replaces) embed, the same contract as the trained IVF
centroids fixture.

Usage: python scripts/train_bpe.py [n_merges]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from pvsyst_pdf_parser_spark.session import get_spark
    from pvsyst_pdf_parser_spark.training.bpe import bpe_train_merges

    spark = get_spark(
        "train-bpe", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = bpe_train_merges(docs, n_merges=n_merges).collect()
    merges = [[r["a"], r["b"]] for r in sorted(rows, key=lambda r: r["step"])]
    out = {
        "sf_dir": "/root/testdata/sf0.01",
        "n_merges": n_merges,
        "merges": merges,
        "pair_counts": [int(r["pair_count"]) for r in
                        sorted(rows, key=lambda r: r["step"])],
    }
    path = os.path.join(REPO, "fixtures", "bpe_merges.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {merges}")


if __name__ == "__main__":
    main()
