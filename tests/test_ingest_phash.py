"""Batch-ingest perceptual dedup DAG (pipelines/ingest_phash.py):
incremental ≡ one-shot equivalence against the oracle-verified
q_dedup_image/video/audio pair families, deterministic recompute
after target deletion, and idempotent fingerprint append — the
ingest-triad evidence form (lexical / semantic / perceptual) applied
to the banded fingerprint stores, one per modality."""

from __future__ import annotations

import shutil

import pytest

from production_ready_ds_spark.operators.sigstore import SignatureStore
from production_ready_ds_spark.pipelines.ingest_phash import (
    PHASH_BATCH_SIZE,
    PerceptualDedupBatch,
    _modality_fingerprints,
)
from production_ready_ds_spark.workflow import build

SF = "/root/testdata/sf0.001"


def _src(spark):
    return f"{SF}/documents.parquet"


def _accepted(spark, root, modality, batch):
    return {
        r.doc_id
        for r in spark.read.parquet(f"{root}/ingest/{modality}-pbatch={batch}")
        .select("doc_id")
        .collect()
    }


@pytest.mark.parametrize("modality", ["image", "video", "audio"])
def test_incremental_equals_one_shot(spark, tmp_path, modality):
    """Two-batch ingest must reproduce the EXACT kept set of the
    one-shot rule (a doc is dropped iff it is the max id of any
    Hamming <= radius pair — the q_dedup_<modality> pair family with
    the min-id-wins decision) — the perceptual family's min-id
    canonical survives across batch boundaries, for every modality."""
    from production_ready_ds_spark.operators.dedup import hamming_candidates
    from production_ready_ds_spark.tables import load

    root = str(tmp_path / "out")
    report = build(
        [
            PerceptualDedupBatch(
                data_root=root, source_path=_src(spark), batch=1, modality=modality
            )
        ]
    )
    assert len(report["ran"]) == 2  # batch 0 pulled in as a dependency

    inc_kept = _accepted(spark, root, modality, 0) | _accepted(
        spark, root, modality, 1
    )

    docs = spark.read.parquet(_src(spark))
    assert docs.count() == 2 * PHASH_BATCH_SIZE, "fixture assumes 2 batches"
    fingerprint, family = _modality_fingerprints(modality)
    pairs = hamming_candidates(fingerprint(load(spark, SF, "documents")))
    dropped = {r.doc_b for r in pairs.select("doc_b").distinct().collect()}
    one_shot = {r.doc_id for r in docs.select("doc_id").collect()} - dropped
    assert inc_kept == one_shot
    assert dropped, "fixture must contain perceptual near-dup families"

    # the store holds the WHOLE corpus's fingerprints (dropped docs
    # included — the any-smaller-id evidence rule), 8 band rows per
    # doc, under the modality's own family tag
    store = SignatureStore(f"{root}/ingest/phash_store-{modality}", family=family)
    seg_paths = [
        f"{root}/ingest/phash_store-{modality}/seg={s['seg']}"
        for s in store.segments()
    ]
    assert spark.read.parquet(*seg_paths).count() == 8 * 2 * PHASH_BATCH_SIZE


def test_recompute_after_target_delete_is_identical(spark, tmp_path):
    from production_ready_ds_spark.operators.dedup import DHASH_FAMILY

    root = str(tmp_path / "out")
    build([PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    before = _accepted(spark, root, "image", 1)
    store = SignatureStore(f"{root}/ingest/phash_store-image", family=DHASH_FAMILY)
    n_segs = len(store.segments())
    shutil.rmtree(f"{root}/ingest/image-pbatch=1")
    report = build(
        [PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=1)]
    )
    assert len(report["ran"]) == 1, "only the deleted batch recomputes"
    assert _accepted(spark, root, "image", 1) == before, (
        "recompute must be deterministic"
    )
    assert len(store.segments()) == n_segs, (
        "guarded append must not duplicate the batch segment"
    )


def test_second_build_is_a_no_op_and_modalities_do_not_alias(spark, tmp_path):
    root = str(tmp_path / "out")
    build([PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=0)])
    report = build(
        [PerceptualDedupBatch(data_root=root, source_path=_src(spark), batch=0)]
    )
    assert report["ran"] == []
    # a different modality is a different target AND a different store
    report = build(
        [
            PerceptualDedupBatch(
                data_root=root, source_path=_src(spark), batch=0, modality="audio"
            )
        ]
    )
    assert len(report["ran"]) == 1, "modality must be part of the target identity"


def test_unknown_modality_fails_loudly():
    with pytest.raises(ValueError, match="unknown perceptual modality"):
        _modality_fingerprints("text")
