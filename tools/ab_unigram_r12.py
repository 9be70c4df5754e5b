#!/usr/bin/env python
"""Interleaved same-session A/B for widening the unigram Viterbi
count passes (round-11 verdict item 5).

A = tree code (the count pass consumes the checkpointed word dict at
its cached width — ONE partition at sf0.1, so the three Arrow/Python
Viterbi passes serialize on one core; round-12 job profile: 148 /
150 / 627 ms single-task jobs).
B = spread() applied to the pass INPUT only (an extra round-robin
exchange per pass that fans the Python work across cores; the word
checkpoint itself stays compact, unlike the round-11 experiment that
pinned the checkpoint wide and measured a loss).

    python tools/ab_unigram_r12.py
"""

from __future__ import annotations

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
        configure(SparkSession.builder.appName("ab-unigram").master(f"local[{cpus}]"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_udf_modules()

    from production_ready_ds_spark.queries import unigram
    from production_ready_ds_spark.tables import spread

    orig_pass = unigram._count_pass

    def wide_pass(words, logp, chars):
        return orig_pass(spread(words), logp, chars)

    from production_ready_ds_spark.queries import catalog

    cat = catalog()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = "q_unigram_train"

    def run() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cat[name].fn(spark, sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    cat[name].fn(spark, sf).write.mode("overwrite").format("noop").save()  # warm

    out: dict = {"loadavg_start": os.getloadavg()[0]}
    for rep in range(2):
        for tag, impl in (("A_narrow", orig_pass), ("B_spread", wide_pass)):
            unigram._count_pass = impl
            out.setdefault(tag, []).append(run())
    unigram._count_pass = orig_pass
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
