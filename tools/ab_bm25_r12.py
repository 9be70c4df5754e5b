#!/usr/bin/env python
"""Interleaved same-session A/B for the O(1)-in-terms BM25 expression
tree (round-11 verdict item 6 — search-family planning cost).

A = round-11 bm25_rank (per-term tf filter expressions + summed score
subtrees — verbatim copy below); B = tree code (one transform / one
aggregate). Queries: q_search_mlt (25-term profile — the planning-
cost flagship), q_search_bm25 (3 terms), q_search_stemmed (3 stems).

    python tools/ab_bm25_r12.py
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
        configure(SparkSession.builder.appName("ab-bm25").master(f"local[{cpus}]"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_udf_modules()

    from production_ready_ds_spark.queries import llm
    from production_ready_ds_spark.queries.llm import ranked_topk

    new_rank = llm.bm25_rank

    def old_rank(toks, terms, *, k=20, k1=llm.BM25_K1, b=llm.BM25_B,
                 exclude_ids=(), eligible=None):
        terms = tuple(dict.fromkeys(terms))

        def tf_expr(term):
            return F.size(F.filter(F.col("ts"), lambda w: w == F.lit(term)))

        per_doc = toks.select(
            "doc_id",
            F.size("ts").alias("dl"),
            *[tf_expr(term).alias(f"tf{i}") for i, term in enumerate(terms)],
        )
        stats = per_doc.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("sumdl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("int")).alias(f"df{i}")
                for i in range(len(terms))
            ],
        )
        scored = per_doc.join(F.broadcast(stats))
        avgdl = F.col("sumdl") * 1.0 / F.col("n")

        def term_score(i):
            idf_i = F.floor(
                F.log(1 + (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5))
                * 10000
                + F.lit(0.5)
            )
            w_i = F.floor(
                F.col(f"tf{i}") * F.lit(k1 + 1)
                / (F.col(f"tf{i}") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * (F.col("dl") / avgdl)))
                * 10000
                + F.lit(0.5)
            )
            return F.when(F.col(f"tf{i}") == 0, F.lit(0)).otherwise(idf_i * w_i)

        score = sum(term_score(i) for i in range(len(terms)))
        hits = sum((F.col(f"tf{i}") > 0).cast("int") for i in range(len(terms)))
        final = scored.select(
            "doc_id",
            score.cast("long").alias("score_scaled"),
            hits.cast("long").alias("n_terms_hit"),
        ).filter(F.col("score_scaled") > 0)
        if exclude_ids:
            final = final.filter(~F.col("doc_id").isin([int(i) for i in exclude_ids]))
        if eligible is not None:
            final = final.join(eligible, "doc_id", "left_semi")
        return ranked_topk(final, [F.desc("score_scaled"), F.asc("doc_id")], k=k)

    from production_ready_ds_spark.queries import catalog

    cat = catalog()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = ["q_search_mlt", "q_search_bm25", "q_search_stemmed"]

    def run(name):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cat[name].fn(spark, sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    for name in names:
        cat[name].fn(spark, sf).write.mode("overwrite").format("noop").save()

    out: dict = {"loadavg_start": os.getloadavg()[0]}
    for rep in range(2):
        for tag, impl in (("A_perterm", old_rank), ("B_array", new_rank)):
            llm.bm25_rank = impl
            for name in names:
                out.setdefault(f"{tag}:{name}", []).append(run(name))
    llm.bm25_rank = new_rank
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
