#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/<tag>/.

    python tools/capture_plans.py --tag r11 --suffix before [names...]

Default name set: every bench-tagged catalog query. Output:
plans/<tag>/<name>_<suffix>.txt at the repo root. NOTE: building some
catalog queries executes eager-checkpoint / tier-agg jobs, so this
runs real Spark work — use a quiet box.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from production_ready_ds_spark.queries import catalog
    from production_ready_ds_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("capture-plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    cat = catalog()
    names = args.names or sorted(n for n, q in cat.items() if q.bench)
    outdir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = cat[name].fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} lines -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
