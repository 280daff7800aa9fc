"""Driver-mimic: run every queries() entry and its DuckDB oracle at a
given SF dir, compare row count + sorted-column value multisets.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return Counter(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pvsyst_pdf_parser_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false"})

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error {exc}")
            n_bad += 1
            continue
        finally:
            # drain operator-scoped persists so 90+ queries don't
            # accumulate cached blocks across the whole run (bench.py
            # does the same)
            from pvsyst_pdf_parser_spark.training.cache import (
                release_persisted,
            )

            release_persisted()
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(sql)
            d_cols = res.columns
            d_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {str(exc)[:300]}")
            n_bad += 1
            continue
        ok = True
        msgs = []
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if ok:
            a = normalize(s_rows, s_cols)
            b = normalize(d_rows, d_cols)
            if a != b:
                ok = False
                diff_a = list((a - b).items())[:3]
                diff_b = list((b - a).items())[:3]
                msgs.append(f"values spark-only={diff_a} duck-only={diff_b}")
        if ok:
            n_ok += 1
            print(f"OK   {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
        else:
            n_bad += 1
            print(f"FAIL {name}: {'; '.join(msgs)}")
    print(f"\n{n_ok} ok, {n_bad} bad")


if __name__ == "__main__":
    main()
