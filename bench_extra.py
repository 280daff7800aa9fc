#!/usr/bin/env python
"""Per-query isolation bench (guide §1): time named queries() entries
exactly the way bench.py does (collect(), min-of-N reps, operator
persists shared across reps of ONE query, released between queries) and
optionally capture .explain("formatted") into plans/<tag>/<q>_<suffix>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain TAG SUFFIX] q1 q2 ...

Prints one JSON line {"queries": {...min sec...}, "sf_dir": ...}.
bench.py stays the frozen driver artifact; this file only feeds
OPTIMIZATION_r06.md evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", nargs=2, metavar=("TAG", "SUFFIX"), default=None,
                    help="write plans/<TAG>/<query>_<SUFFIX>.txt")
    ap.add_argument("--noop", action="store_true",
                    help="use noop sink instead of collect()")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pvsyst_pdf_parser_spark.session import get_spark

    spark = get_spark(
        "bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from pvsyst_pdf_parser_spark.training.cache import release_persisted

    qs = entry.queries()
    # JVM/codegen warmup, as bench.py does
    spark.read.parquet(f"{args.sf}/nation.parquet").count()

    timings: dict[str, float] = {}
    timings_all: dict[str, list[float]] = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if args.explain:
            tag, suffix = args.explain
            d = os.path.join(REPO, "plans", tag)
            os.makedirs(d, exist_ok=True)
            df = qs[name](spark, args.sf)
            with open(os.path.join(d, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            release_persisted()
        rep_times = []
        for _ in range(args.reps):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            rep_times.append(round(time.time() - t0, 3))
        if rep_times:  # --reps 0 = explain-only capture
            timings[name] = min(rep_times)
            timings_all[name] = rep_times
        release_persisted()
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": timings, "all": timings_all,
                      "sf_dir": args.sf, "cpus": cpus}))


if __name__ == "__main__":
    main()
