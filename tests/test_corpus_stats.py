"""Constructed-data tests for the corpus-statistics queries
(q_chunk_documents / q_tfidf_top_terms / q_vocab_build / q_bigram_pmi):
the oracle suite proves engine parity on real data; these pin the
SEMANTICS on inputs where the right answer is known by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from production_ready_ds_spark.functions.text import tokens_expr
from production_ready_ds_spark.queries.llm import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PMI_MIN_PAIR_COUNT,
    VOCAB_MIN_COUNT,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunk(spark, docs):
    """Re-run q_chunk_documents' transform on a constructed frame."""
    toks = (
        docs.select("doc_id", tokens_expr(F.col("text")).alias("ts"))
        .select("doc_id", "ts", F.size("ts").alias("n"))
        .filter(F.col("n") >= 1)
    )
    starts = F.sequence(F.lit(1), F.col("n"), F.lit(CHUNK_STRIDE))
    return toks.select("doc_id", "ts", "n", F.explode(starts).alias("i")).select(
        "doc_id",
        ((F.col("i") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("i") + 1)
        .cast("long")
        .alias("n_chunk_tokens"),
    )


def test_chunking_boundaries(spark):
    """Hand-checked chunk layouts: n tokens with stride S yields
    ceil(n/S) chunks; the last chunk holds the remainder; empty docs
    vanish (the F.sequence(1,0) counts-DOWN trap)."""
    n_long = CHUNK_TOKENS + CHUNK_STRIDE + 7  # 3 chunk starts: 1, 49, 97
    docs = _docs(
        spark,
        [
            (1, " ".join(f"t{i}" for i in range(n_long))),
            (2, "only three tokens"),
            (3, ""),  # no tokens → no chunks, must not explode [1,0]
        ],
    )
    rows = {(r.doc_id, r.chunk_id): r.n_chunk_tokens for r in _chunk(spark, docs).collect()}
    n_chunks_long = -(-n_long // CHUNK_STRIDE)
    assert {k[1] for k in rows if k[0] == 1} == set(range(n_chunks_long))
    assert rows[(1, 0)] == CHUNK_TOKENS
    # last chunk = remainder past its start offset
    last_start = (n_chunks_long - 1) * CHUNK_STRIDE + 1
    assert rows[(1, n_chunks_long - 1)] == n_long - last_start + 1
    assert rows[(2, 0)] == 3
    assert not any(k[0] == 3 for k in rows)


def test_vocab_min_count_and_dense_ids(spark, sf_small):
    from production_ready_ds_spark.queries import catalog

    out = catalog()["q_vocab_build"].fn(spark, sf_small).collect()
    assert out, "vocabulary must be non-empty at sf0.001"
    assert all(r.n >= VOCAB_MIN_COUNT for r in out)
    ids = sorted(r.token_id for r in out)
    assert ids == list(range(1, len(out) + 1)), "ids must be dense from 1"
    by_id = sorted(out, key=lambda r: r.token_id)
    counts = [r.n for r in by_id]
    assert counts == sorted(counts, reverse=True), "ids must follow count desc"


def test_tfidf_prefers_rare_terms(spark, sf_small):
    """A term present in every document has idf = ln(1) = 0 and must
    never out-rank a genuinely distinctive term."""
    from production_ready_ds_spark.queries import catalog

    out = catalog()["q_tfidf_top_terms"].fn(spark, sf_small)
    assert out.filter(F.col("score") < 0).count() == 0, "df>N impossible; scores >= 0"
    assert out.groupBy("doc_id").count().filter(F.col("count") > 3).count() == 0


def test_pmi_finds_planted_collocation(spark):
    """A bigram that always co-occurs ('machine learning' in every doc)
    must surface with positive PMI; filler words that pair with
    everything must score lower."""
    from production_ready_ds_spark.queries.llm import q_bigram_pmi
    from production_ready_ds_spark import tables

    n = PMI_MIN_PAIR_COUNT + 3
    fillers = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = []
    for i in range(n):
        # 'machine learning' always adjacent; fillers pair randomly-ish
        # (deterministic rotation) with each other around it.
        f1, f2 = fillers[i % len(fillers)], fillers[(i + 3) % len(fillers)]
        rows.append((i, f"{f1} machine learning {f2} {f1} {f2}"))
    docs = _docs(spark, rows)

    import production_ready_ds_spark.queries.llm as llm

    orig = tables.load
    try:
        tables_load = lambda spark_, sf_, name: docs  # noqa: E731
        llm.load = tables_load
        out = {(r.w1, r.w2): r.pmi for r in q_bigram_pmi(spark, "unused").collect()}
    finally:
        llm.load = orig
    assert ("machine", "learning") in out
    assert out[("machine", "learning")] > 0
    assert out[("machine", "learning")] == max(out.values())
