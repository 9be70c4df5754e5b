#!/usr/bin/env python
"""Run the DuckDB-oracle comparison over catalog entries from the CLI.

The local twin of the driver's correctness gate: every named query (or
the whole catalog) runs on Spark AND its oracle SQL on DuckDB over the
same parquet tables, comparing rows / columns / values.

    python tools/check_oracle.py                      # full catalog @ sf0.01
    python tools/check_oracle.py q_tpch_q2 q_map_funcs
    python tools/check_oracle.py --sf /root/testdata/sf0.001 q_agg_pricing

Exit code 1 if anything fails — usable as a pre-commit gate.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="catalog names (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="testdata dir")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession like the external driver "
        "(catches runtime-conf bugs the tuned factory would mask)",
    )
    args = ap.parse_args()

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from production_ready_ds_spark.session import get_spark

        spark = get_spark()

    from production_ready_ds_spark.oracle import run_compare
    from production_ready_ds_spark.queries import catalog

    cat = catalog()
    names = args.names or list(cat)
    unknown = [n for n in names if n not in cat]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    fails = 0
    for n in names:
        r = run_compare(spark, n, args.sf)
        status = "PASS" if r.ok else "FAIL"
        fails += 0 if r.ok else 1
        detail = "" if r.ok else f"  {r.detail[:160]}"
        print(f"{status} {n} spark={r.spark_rows} oracle={r.oracle_rows}{detail}")
    print(f"{len(names) - fails}/{len(names)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
