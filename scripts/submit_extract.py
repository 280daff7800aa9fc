#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (north-rule
deployment shape).

    spark-submit --master <cluster> \
        --py-files "$(python -c 'from pvsyst_pdf_parser_spark.packaging \
                     import build_package_zip; print(build_package_zip())')" \
        scripts/submit_extract.py \
        --input /path/to/pages_parquet_or_table --output /sink/dir \
        [--table my_catalog.db.extractions] [--run-id r1] \
        [--num-partitions 4096] [--pack-by-bytes]

``--input`` is a parquet path by default; ``--input-table`` reads a
catalog table instead (the Iceberg pages table on a real cluster).
Output goes through the resumable ResultSink — bucketed results,
per-bucket manifest lineage, error quarantine — so re-submitting the
same job after a failure completes the remainder without duplicates.
The final line on stdout is one JSON dict of run stats.

On local[] the module import works from the repo checkout; under
cluster deploy the --py-files zip makes executors self-contained — the
job itself imports lazily so the zip is the only distribution channel
needed.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages parquet path (or table name with --input-table)")
    p.add_argument("--input-table", action="store_true", help="treat --input as a catalog table name")
    p.add_argument("--output", required=True, help="sink directory (parquet mode)")
    p.add_argument("--table", help="catalog-qualified Iceberg base table for the sink")
    p.add_argument("--run-id", help="manifest run id (default: timestamp)")
    p.add_argument("--num-partitions", type=int, help="decode partitions (default: input split count)")
    p.add_argument("--pack-by-bytes", action="store_true", help="size-aware decode packing for byte-skewed corpora")
    args = p.parse_args(argv)

    from pvsyst_pdf_parser_spark.session import get_spark

    # master="" → respect spark-submit's --master / cluster deploy mode
    spark = get_spark("pvsyst-extract-submit", master="")

    from pvsyst_pdf_parser_spark.scale import resumable_extract

    pages = (
        spark.read.table(args.input)
        if args.input_table
        else spark.read.parquet(args.input)
    )
    if args.pack_by_bytes and not args.num_partitions:
        p.error("--pack-by-bytes requires --num-partitions")

    out = resumable_extract(
        spark,
        pages,
        args.output,
        run_id=args.run_id,
        num_partitions=args.num_partitions,
        table=args.table,
        pack_by_bytes=args.pack_by_bytes,
    )
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
