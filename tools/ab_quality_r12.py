#!/usr/bin/env python
"""Interleaved same-session A/B for the round-12 bigram pc fix.

A = round-11 shape (eager compact_checkpoint on the bigram pair
counts); B = round-12 shape (lazy localCheckpoint — the tree's code).
One tuned session, ABAB order, min-of-3 per cell, noop sink.

    python tools/ab_quality_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from production_ready_ds_spark.session import configure, register_udf_modules

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        configure(SparkSession.builder.appName("ab-quality").master(f"local[{cpus}]"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_udf_modules()

    from production_ready_ds_spark.queries import llm
    from production_ready_ds_spark.queries.llm import doc_bigrams, tokens_expr
    from pyspark.sql.functions import broadcast

    new_bigram_model = llm.bigram_model

    def old_bigram_model(train_docs):
        # round-11 shape, verbatim: eager compacted pc checkpoint
        from production_ready_ds_spark.tables import compact_checkpoint

        bg = doc_bigrams(train_docs)
        pc = compact_checkpoint(
            bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        )
        uc = pc.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
        vocab = train_docs.select(
            F.explode(tokens_expr(F.col("text"))).alias("tok")
        ).agg(F.countDistinct("tok").alias("v"))
        return pc.join(uc, "w1").crossJoin(broadcast(vocab))

    from production_ready_ds_spark.queries import catalog

    cat = catalog()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = ["q_quality_perplexity", "q_quality_classifier"]

    def run(name: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cat[name].fn(spark, sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # warmup both paths once
    for name in names:
        cat[name].fn(spark, sf).write.mode("overwrite").format("noop").save()

    out: dict = {"loadavg_start": os.getloadavg()[0]}
    for rep in range(2):
        for tag, impl in (("A_eager", old_bigram_model), ("B_lazy", new_bigram_model)):
            llm.bigram_model = impl
            for name in names:
                out.setdefault(f"{tag}:{name}", []).append(run(name))
    llm.bigram_model = new_bigram_model
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
