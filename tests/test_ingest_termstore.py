"""Batch-ingest text-index DAG (pipelines/ingest_termstore.py):
incremental builds must equal a one-shot index INTEGER-for-integer
(BM25 and phrase), re-runs must be no-ops, recomputes must not
duplicate postings, and the post-ingest search must stay an
O(query terms) inverted-list read."""

from __future__ import annotations

import os
import shutil

from production_ready_ds_spark.operators.termstore import TermStore
from production_ready_ds_spark.pipelines.ingest_termstore import BATCH_SIZE, IndexBatch
from production_ready_ds_spark.tables import load
from production_ready_ds_spark.workflow import build


def _results(df):
    return [tuple(r) for r in df.collect()]


def _dag_store(spark, sf_small, root) -> TermStore:
    src = os.path.join(sf_small, "documents.parquet")
    # sf0.001 documents hold doc_ids 0..499 -> exactly 2 BATCH_SIZE=250 batches
    report = build([IndexBatch(data_root=root, source_path=src, batch=1)])
    assert len(report["ran"]) == 2 and not report["blocked"]
    return TermStore(os.path.join(root, "text_index", "term_store"))


def test_incremental_dag_equals_one_shot_build(spark, sf_small, tmp_path):
    store = _dag_store(spark, sf_small, str(tmp_path / "out"))
    assert len(store.segments()) == 2

    one = TermStore(str(tmp_path / "one"))
    assert one.append(load(spark, sf_small, "documents"), id_min=0, id_max=10**9)

    assert store.stats() == one.stats()
    for terms in [("spark", "query", "vector"), ("join",), ("table", "hash")]:
        assert _results(store.search(spark, terms, k=15)) == _results(
            one.search(spark, terms, k=15)
        ), terms
    assert _results(store.search_phrase(spark, ("table", "hash"), k=15)) == _results(
        one.search_phrase(spark, ("table", "hash"), k=15)
    )


def test_rerun_is_noop_and_recompute_never_duplicates(spark, sf_small, tmp_path):
    root = str(tmp_path / "out")
    store = _dag_store(spark, sf_small, root)
    segs_before = len(store.segments())
    stats_before = store.stats()
    src = os.path.join(sf_small, "documents.parquet")

    # complete DAG -> nothing recomputes
    report2 = build([IndexBatch(data_root=root, source_path=src, batch=1)])
    assert report2["ran"] == []

    # delete batch 1's receipt: ONLY that task re-runs, and the guarded
    # append must not duplicate its postings or double-count stats
    shutil.rmtree(os.path.join(root, "text_index", "receipt=1"))
    report3 = build([IndexBatch(data_root=root, source_path=src, batch=1)])
    assert len(report3["ran"]) == 1
    assert len(store.segments()) == segs_before
    assert store.stats() == stats_before

    # receipts record the per-batch document stats the manifest gained
    receipts = spark.read.parquet(
        os.path.join(root, "text_index", "receipt=0"),
        os.path.join(root, "text_index", "receipt=1"),
    )
    agg = receipts.groupBy().sum("n_docs", "sum_dl").first()
    assert (agg[0], agg[1]) == stats_before


def test_post_ingest_search_reads_only_query_terms(spark, sf_small, tmp_path):
    """The DAG-built (multi-segment) store must still serve queries as
    the pushed-In(term) inverted-list read — O(query terms) postings,
    not a postings-table scan."""
    from production_ready_ds_spark.plans.audit import pushed_filters

    store = _dag_store(spark, sf_small, str(tmp_path / "out"))
    post = store.read_postings(spark, ["spark", "vector"])
    pushed = " ".join(pushed_filters(post))
    assert "term" in pushed and "In(" in pushed, pushed
    got = {r.term for r in post.select("term").distinct().collect()}
    assert got <= {"spark", "vector"}
