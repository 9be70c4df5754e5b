"""Batch-ingest perceptual dedup DAG (pipelines/ingest_phash.py):
incremental ≡ one-shot equivalence against the oracle-verified
q_dedup_image pair family, deterministic recompute after target
deletion, and idempotent fingerprint append — the ingest-triad
evidence form (lexical / semantic / perceptual) applied to the dHash
store."""

from __future__ import annotations

import shutil

from production_ready_ds_spark.operators.sigstore import SignatureStore
from production_ready_ds_spark.pipelines.ingest_phash import (
    PHASH_BATCH_SIZE,
    PerceptualDedupBatch,
)
from production_ready_ds_spark.workflow import build

SF = "/root/testdata/sf0.001"


def _src(spark):
    return f"{SF}/documents.parquet"


def _accepted(spark, root, batch):
    return {
        r.doc_id
        for r in spark.read.parquet(f"{root}/ingest/pbatch={batch}")
        .select("doc_id")
        .collect()
    }


def test_incremental_equals_one_shot(spark, tmp_path):
    """Two-batch ingest must reproduce the EXACT kept set of the
    one-shot rule (a doc is dropped iff it is the max id of any
    Hamming <= radius pair — q_dedup_image's pair family with the
    min-id-wins decision) — the perceptual family's min-id canonical
    survives across batch boundaries."""
    from production_ready_ds_spark.operators.dedup import hamming_candidates
    from production_ready_ds_spark.queries.multimodal import _image_fingerprints

    root = str(tmp_path / "out")
    report = build(
        [PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=1)]
    )
    assert len(report["ran"]) == 2  # batch 0 pulled in as a dependency

    inc_kept = _accepted(spark, root, 0) | _accepted(spark, root, 1)

    docs = spark.read.parquet(_src(spark))
    assert docs.count() == 2 * PHASH_BATCH_SIZE, "fixture assumes 2 batches"
    pairs = hamming_candidates(_image_fingerprints(spark, SF))
    dropped = {r.doc_b for r in pairs.select("doc_b").distinct().collect()}
    one_shot = {r.doc_id for r in docs.select("doc_id").collect()} - dropped
    assert inc_kept == one_shot
    assert dropped, "fixture must contain perceptual near-dup families"

    # the store holds the WHOLE corpus's fingerprints (dropped docs
    # included — the any-smaller-id evidence rule), 8 band rows per doc
    store = SignatureStore(
        f"{root}/ingest/phash_store",
        family="dhash-128/luma-999/8x16le-v1",
    )
    seg_paths = [
        f"{root}/ingest/phash_store/seg={s['seg']}" for s in store.segments()
    ]
    assert spark.read.parquet(*seg_paths).count() == 8 * 2 * PHASH_BATCH_SIZE


def test_recompute_after_target_delete_is_identical(spark, tmp_path):
    root = str(tmp_path / "out")
    build([PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    before = _accepted(spark, root, 1)
    store = SignatureStore(
        f"{root}/ingest/phash_store",
        family="dhash-128/luma-999/8x16le-v1",
    )
    n_segs = len(store.segments())
    shutil.rmtree(f"{root}/ingest/pbatch=1")
    report = build(
        [PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=1)]
    )
    assert len(report["ran"]) == 1, "only the deleted batch recomputes"
    assert _accepted(spark, root, 1) == before, "recompute must be deterministic"
    assert len(store.segments()) == n_segs, (
        "guarded append must not duplicate the batch segment"
    )


def test_second_build_is_a_no_op(spark, tmp_path):
    root = str(tmp_path / "out")
    build([PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    report = build(
        [PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=1)]
    )
    assert report["ran"] == []
