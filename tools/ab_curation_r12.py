#!/usr/bin/env python
"""Interleaved same-session A/B for the round-12 curation-chain
restructure (window exact stage, panel checkpoint, union anti-joins,
single tagged stage join, no edge distinct).

A = the round-11 `_chain_decisions` (extracted verbatim from git HEAD
into /tmp/curation_r11_chain.py, module-level @query entries stripped);
B = the tree's current q_curation_ingest. One tuned session, ABAB,
min-of-3 per cell, noop sink.

    python tools/ab_curation_r12.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    from production_ready_ds_spark.session import configure, register_udf_modules

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        configure(SparkSession.builder.appName("ab-curation").master(f"local[{cpus}]"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_udf_modules()

    # old chain, loaded under the queries package so relative imports
    # resolve (the @query registrations were cut from the file)
    spec = importlib.util.spec_from_file_location(
        "production_ready_ds_spark.queries._curation_r11",
        "/tmp/curation_r11_chain.py",
    )
    old_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_mod)

    from production_ready_ds_spark.queries import catalog

    cat = catalog()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    variants = {
        "A_r11": lambda: old_mod._chain_decisions(spark, sf),
        "B_r12": lambda: cat["q_curation_ingest"].fn(spark, sf),
    }

    def run(fn) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    for fn in variants.values():  # warm both paths
        fn().write.mode("overwrite").format("noop").save()

    out: dict = {"loadavg_start": os.getloadavg()[0]}
    for rep in range(2):
        for tag, fn in variants.items():
            out.setdefault(tag, []).append(run(fn))
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
