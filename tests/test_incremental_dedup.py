"""Incremental MinHash dedup against a persistent signature store
(operators/dedup.py incremental_minhash_dedup): signatures computed
once per document ever; batches dedup against corpus + themselves;
re-delivery is a no-op (the reference's O2 incremental-completeness
semantics applied to dedup state).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_bands,
)

BODY = "the shared body of a fairly long document about distributed query engines"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_two_batch_flow_finds_cross_batch_dups(spark, tmp_path):
    store = str(tmp_path / "sigs")
    b1 = _docs(
        spark,
        [
            (1, BODY + " first"),
            (2, BODY + " second"),  # near-dup of 1
            (3, "totally different text on an unrelated subject entirely here"),
        ],
    )
    p1 = incremental_minhash_dedup(b1, store)
    got1 = {(r.doc_a, r.doc_b) for r in p1.collect()}
    assert (1, 2) in got1
    assert all(3 not in p for p in got1)

    # batch 2: one near-dup of a CORPUS doc, one genuinely new doc
    b2 = _docs(
        spark,
        [
            (10, BODY + " tenth"),
            (11, "another completely novel document with fresh content words"),
        ],
    )
    p2 = incremental_minhash_dedup(b2, store)
    got2 = {(r.doc_a, r.doc_b) for r in p2.collect()}
    assert (1, 10) in got2 and (2, 10) in got2, got2
    assert all(11 not in p for p in got2)
    # batch-2 pairs never re-report corpus-internal pairs
    assert (1, 2) not in got2

    # store now indexes all five docs, one signature row-set per doc
    stored = spark.read.parquet(store)
    assert {r.doc_id for r in stored.select("doc_id").distinct().collect()} == {1, 2, 3, 10, 11}


def test_redelivery_is_noop(spark, tmp_path):
    store = str(tmp_path / "sigs")
    b1 = _docs(spark, [(1, BODY + " first"), (2, BODY + " second")])
    incremental_minhash_dedup(b1, store)
    n_rows = spark.read.parquet(store).count()
    again = incremental_minhash_dedup(b1, store)
    assert again.count() == 0, "re-delivered batch must produce no pairs"
    assert spark.read.parquet(store).count() == n_rows, "store must not grow"


def test_incremental_matches_batch_result(spark, tmp_path):
    """Feeding the corpus in two batches must find the same pair set as
    one self-join over everything (order-insensitive equivalence of the
    incremental and batch paths)."""
    from production_ready_ds_spark.operators.dedup import minhash_candidates

    rows = [(i, BODY + f" tail{i % 3}") for i in range(8)]
    all_docs = _docs(spark, rows)
    batch_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidates(minhash_bands(all_docs)).collect()
    }
    store = str(tmp_path / "sigs")
    inc = set()
    for lo, hi in [(0, 4), (4, 8)]:
        part = _docs(spark, rows[lo:hi])
        inc |= {
            (r.doc_a, r.doc_b)
            for r in incremental_minhash_dedup(part, store).collect()
        }
    assert inc == batch_pairs
