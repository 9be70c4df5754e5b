"""Batch-ingest semantic dedup DAG (pipelines/ingest_semdedup.py):
incremental ≡ one-shot equivalence against the oracle-verified
_semantic_decisions kernel, deterministic recompute after target
deletion (despite the already-appended IVF index), and idempotent
append — the sigstore evidence form applied to the embedding twin.
"""

from __future__ import annotations

import shutil

from production_ready_ds_spark.operators.ivfstore import IVFStore
from production_ready_ds_spark.pipelines.ingest_semdedup import (
    VEC_BATCH_SIZE,
    SemDedupBatch,
)
from production_ready_ds_spark.workflow import build

SF = "/root/testdata/sf0.001"


def _src(spark):
    return f"{SF}/embeddings.parquet"


def _accepted(spark, root, batch):
    return {
        r.vec_id
        for r in spark.read.parquet(f"{root}/ingest/vecbatch={batch}")
        .select("vec_id")
        .collect()
    }


def test_incremental_equals_one_shot(spark, tmp_path):
    """Running the corpus through per-batch ingest must reproduce the
    EXACT kept set of the one-shot SemDeDup decision kernel evaluated
    on the full corpus under the same stored quantizer — the min-id
    canonical survives across batch boundaries, and dropped vectors
    kept in the index preserve the any-smaller-id evidence rule."""
    from production_ready_ds_spark.queries.llm import _semantic_decisions

    root = str(tmp_path / "out")
    report = build([SemDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    assert len(report["ran"]) == 2  # batch 0 pulled in as a dependency

    inc_kept = _accepted(spark, root, 0) | _accepted(spark, root, 1)

    store = IVFStore(f"{root}/ingest/ivf_store")
    full = spark.read.parquet(_src(spark)).select("vec_id", "embedding")
    assert full.count() == 2 * VEC_BATCH_SIZE, "fixture assumes exactly 2 batches"
    assigned = store.assign(full).withColumnRenamed("list_id", "bucket")
    one_shot = {
        r.vec_id for r in _semantic_decisions(assigned).filter("kept").collect()
    }
    assert inc_kept == one_shot
    # the index holds the WHOLE corpus (dropped vectors included — the
    # dedup evidence), while the accepted targets hold the kept subset
    seg_paths = [
        f"{root}/ingest/ivf_store/seg={s['seg']}" for s in store.segments()
    ]
    assert spark.read.parquet(*seg_paths).count() == 2 * VEC_BATCH_SIZE


def test_recompute_after_target_delete_is_identical(spark, tmp_path):
    root = str(tmp_path / "out")
    build([SemDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    before = _accepted(spark, root, 1)
    store = IVFStore(f"{root}/ingest/ivf_store")
    n_segs = len(store.segments())
    shutil.rmtree(f"{root}/ingest/vecbatch=1")
    report = build([SemDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    assert len(report["ran"]) == 1, "only the deleted batch recomputes"
    assert _accepted(spark, root, 1) == before, "recompute must be deterministic"
    assert len(IVFStore(f"{root}/ingest/ivf_store").segments()) == n_segs, (
        "guarded append must not duplicate the batch segment"
    )


def test_second_build_is_a_no_op(spark, tmp_path):
    root = str(tmp_path / "out")
    build([SemDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    report = build([SemDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    assert report["ran"] == []


def test_ingest_on_pq_store_carries_codes_every_batch(spark, tmp_path):
    """The continuous-ingest shape on an IVFADC store: pre-train the
    quantizer AND the residual PQ codebooks up front (the production
    sample-train), then run the per-batch DAG — every appended segment
    must carry non-null codes (the caller-assigned encode path), the
    dedup decisions must be identical to the codeless store's, and the
    composed search must serve from the ingested index exactly (full
    probe + full refine ≡ float search)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "pq")
    plain_root = str(tmp_path / "plain")
    full = spark.read.parquet(_src(spark)).select("vec_id", "embedding")
    store = IVFStore(f"{root}/ingest/ivf_store")
    store.train(full)
    store.train_pq(full, residual=True)
    build([SemDedupBatch(data_root=root, source_path=_src(spark), batch=1)])
    build([SemDedupBatch(data_root=plain_root, source_path=_src(spark), batch=1)])

    seg_paths = [
        f"{root}/ingest/ivf_store/seg={s['seg']}" for s in store.segments()
    ]
    seg = spark.read.parquet(*seg_paths)
    assert "codes" in seg.columns
    assert seg.filter(F.col("codes").isNull()).count() == 0
    assert seg.count() == 2 * VEC_BATCH_SIZE

    # codes are dedup-decision-neutral (only the index layout changed):
    # NOTE the plain store trains on batch 0 only (the DAG bootstrap)
    # while this store trained on the full corpus, so kept sets can
    # differ by quantizer — compare against a one-shot under THIS
    # store's quantizer instead
    from production_ready_ds_spark.queries.llm import _semantic_decisions

    assigned = store.assign(full).withColumnRenamed("list_id", "bucket")
    one_shot = {
        r.vec_id for r in _semantic_decisions(assigned).filter("kept").collect()
    }
    inc_kept = _accepted(spark, root, 0) | _accepted(spark, root, 1)
    assert inc_kept == one_shot

    probes = full.filter(F.col("vec_id") < 3)
    k = len(store.centroids())
    n = full.count()
    composed = sorted(
        (r.probe_id, r.neighbor_id, r.cos_sim)
        for r in store.search_adc(
            probes, top_k=3, nprobe=k, refine=(n + 2) // 3
        ).collect()
    )
    exact = sorted(
        (r.probe_id, r.neighbor_id, r.cos_sim)
        for r in store.search(probes, top_k=3, nprobe=k).collect()
    )
    assert composed == exact


def test_sampled_bootstrap_training_keeps_the_equivalence(spark, tmp_path):
    """Round-10: the max_train_rows knob threads through the DAG (the
    requires() chain must propagate it, or batch 0 built as a
    dependency trains full) and the incremental ≡ one-shot contract
    holds under a SAMPLE-TRAINED quantizer too — decisions only need
    the STORED centroids to be shared between the batch path and the
    one-shot kernel, not any particular training recipe."""
    from production_ready_ds_spark.queries.llm import _semantic_decisions

    root = str(tmp_path / "out")
    task = SemDedupBatch(
        data_root=root, source_path=_src(spark), batch=1, max_train_rows=128
    )
    assert int(task.requires()[0].max_train_rows) == 128, (
        "requires() must propagate the training knob to earlier batches"
    )
    build([task])

    def accepted(batch):
        return {
            r.vec_id
            for r in spark.read.parquet(f"{root}/ingest-mtr128/vecbatch={batch}")
            .select("vec_id")
            .collect()
        }

    inc_kept = accepted(0) | accepted(1)
    store = IVFStore(f"{root}/ingest-mtr128/ivf_store")
    full = spark.read.parquet(_src(spark)).select("vec_id", "embedding")
    assigned = store.assign(full).withColumnRenamed("list_id", "bucket")
    one_shot = {
        r.vec_id for r in _semantic_decisions(assigned).filter("kept").collect()
    }
    assert inc_kept == one_shot
