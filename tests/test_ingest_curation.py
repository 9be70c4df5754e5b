"""The composed curation-ingest DAG (pipelines/ingest_curation.py):
incremental ≡ one-shot equivalence across the WHOLE exact → lexical →
perceptual → semantic chain plus the keep-best canonical view
(against the hash-gated q_curation_ingest decisions), deterministic
recompute after target deletion, chained fingerprint-once store
contents, and the exact stage's store-backed cross-batch rejection."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from production_ready_ds_spark.pipelines.ingest_curation import (
    CurationCanonicals,
    CurationIngestBatch,
)
from production_ready_ds_spark.workflow import build

SF = "/root/testdata/sf0.001"


def _dag_kwargs(root):
    return dict(
        data_root=root,
        source_path=f"{SF}/documents.parquet",
        embeddings_path=f"{SF}/embeddings.parquet",
    )


def _kept(spark, root, batches=(0, 1)):
    out = set()
    for b in batches:
        out |= {
            r.doc_id
            for r in spark.read.parquet(
                f"{root}/curation_ingest/image/accepted-batch={b}"
            )
            .select("doc_id")
            .collect()
        }
    return out


def test_incremental_equals_one_shot_composed(spark, tmp_path):
    """Two-batch composed ingest must reproduce the one-shot
    q_curation_ingest decisions EXACTLY: the accepted-target union is
    its stage='kept' set, and the canonical view carries the same
    family labels and keep-best winners — across every stage of the
    chain at once."""
    from production_ready_ds_spark.queries.curation_ingest import (
        _chain_decisions,
    )

    root = str(tmp_path / "out")
    report = build([CurationCanonicals(n_batches=2, **_dag_kwargs(root))])
    assert len(report["ran"]) == 3  # batches 0,1 + the view

    one = _chain_decisions(spark, SF).collect()
    stages = {r.stage for r in one}
    # the sf0.001 corpus must exercise at least the three detector
    # stages (it carries no byte-identical copies; the exact stage is
    # pinned by test_exact_stage_rejects_across_batches)
    assert {"lexical", "perceptual", "semantic", "kept"} <= stages

    assert _kept(spark, root) == {r.doc_id for r in one if r.stage == "kept"}
    canon = {
        (r.doc_id, r.family_id, r.keep_best)
        for r in spark.read.parquet(
            f"{root}/curation_ingest/image/canonicals-n=2"
        ).collect()
    }
    assert canon == {(r.doc_id, r.family_id, r.keep_best) for r in one}
    # keep-best differs from min-id somewhere (the view is not a
    # relabeling of the survivor set — some family's best member is
    # not its min id)
    kept = {r.doc_id for r in one if r.stage == "kept"}
    best = {r.doc_id for r in one if r.keep_best}
    assert best != kept


def test_recompute_after_delete_is_identical(spark, tmp_path):
    """Deleting the last batch target and the view, then re-running,
    must reproduce identical decisions even though every store was
    already appended (range-derived earlier corpus + idempotent
    appends)."""
    root = str(tmp_path / "out")
    build([CurationCanonicals(n_batches=2, **_dag_kwargs(root))])
    before_kept = _kept(spark, root)
    before_canon = {
        tuple(r)
        for r in spark.read.parquet(
            f"{root}/curation_ingest/image/canonicals-n=2"
        ).collect()
    }
    shutil.rmtree(f"{root}/curation_ingest/image/accepted-batch=1")
    shutil.rmtree(f"{root}/curation_ingest/image/canonicals-n=2")
    report = build([CurationCanonicals(n_batches=2, **_dag_kwargs(root))])
    assert len(report["ran"]) == 2  # only the deleted suffix recomputes
    assert _kept(spark, root) == before_kept
    after_canon = {
        tuple(r)
        for r in spark.read.parquet(
            f"{root}/curation_ingest/image/canonicals-n=2"
        ).collect()
    }
    assert after_canon == before_canon


def test_chained_stores_hold_only_stage_survivors(spark, tmp_path):
    """The chaining efficiency contract, verified on the stores: the
    lexical store holds signatures ONLY for exact survivors, and the
    perceptual store holds fingerprints ONLY for lexical survivors —
    a rejected doc never pays the next stage's kernel."""
    from production_ready_ds_spark.operators.dedup import (
        DHASH_FAMILY,
        EXACT_FAMILY,
    )
    from production_ready_ds_spark.operators.sigstore import SignatureStore
    from production_ready_ds_spark.queries.curation_ingest import (
        _chain_decisions,
    )

    root = str(tmp_path / "out")
    build([CurationIngestBatch(batch=1, **_dag_kwargs(root))])
    one = {r.doc_id: r.stage for r in _chain_decisions(spark, SF).collect()}

    def store_ids(name, family):
        store = SignatureStore(
            f"{root}/curation_ingest/image/{name}", family=family
        )
        paths = [
            f"{root}/curation_ingest/image/{name}/seg={s['seg']}"
            for s in store.segments()
        ]
        return {
            r.doc_id
            for r in spark.read.parquet(*paths).select("doc_id").collect()
        }

    from production_ready_ds_spark.operators.dedup import MINHASH_FAMILY

    exact_ids = store_ids("exact_store", EXACT_FAMILY)
    lex_ids = store_ids("sig_store", MINHASH_FAMILY)
    ph_ids = store_ids("phash_store", DHASH_FAMILY)

    assert exact_ids == set(one)  # every doc pays the md5 stage
    assert lex_ids == {d for d, s in one.items() if s != "exact"}
    assert ph_ids == {
        d for d, s in one.items() if s not in ("exact", "lexical")
    }
    # and the semantic store holds exactly the perceptual survivors
    # that have an embedding
    sem_paths = []
    import json
    import os

    sem_root = f"{root}/curation_ingest/image/sem_store"
    with open(os.path.join(sem_root, "_ivf_manifest.json")) as fh:
        for s in json.load(fh)["segments"]:
            sem_paths.append(os.path.join(sem_root, f"seg={s['seg']}"))
    sem_ids = {
        r.vec_id
        for r in spark.read.parquet(*sem_paths).select("vec_id").collect()
    }
    emb_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id")
        .collect()
    }
    assert sem_ids == {
        d
        for d, s in one.items()
        if s not in ("exact", "lexical", "perceptual") and d in emb_ids
    }


def test_exact_stage_rejects_across_batches(spark, tmp_path):
    """Byte-identical copies must be rejected by the md5 stage — the
    testdata corpus carries none, so a synthetic two-batch source
    pins the cross-batch exact rule (a later batch's copy of an
    earlier batch's text is rejected by ONE md5 bucket probe) and the
    star-edge shape (doc_a = the group's minimum)."""
    from production_ready_ds_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    store = str(tmp_path / "exact_store")
    b0 = spark.createDataFrame(
        [(0, "alpha text"), (1, "beta text"), (2, "alpha text")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text"), (12, "gamma text")],
        "doc_id long, text string",
    )
    p0 = {
        (r.doc_a, r.doc_b)
        for r in incremental_exact_dedup(b0, store, earlier_below=0).collect()
    }
    assert p0 == {(0, 2)}
    p1 = {
        (r.doc_a, r.doc_b)
        for r in incremental_exact_dedup(b1, store, earlier_below=10).collect()
    }
    # 10 duplicates batch-0's id 0 (cross-batch, via the store);
    # 12 duplicates 11 within the batch; star edges point at minima
    assert p1 == {(0, 10), (11, 12)}
    # recompute determinism: re-running batch 1 against the already-
    # appended store reproduces identical edges (range-derived earlier
    # corpus + idempotent append)
    p1_again = {
        (r.doc_a, r.doc_b)
        for r in incremental_exact_dedup(b1, store, earlier_below=10).collect()
    }
    assert p1_again == p1


def test_canonicals_spine_covers_only_ingested_range(spark, tmp_path):
    """Round-11 review #1: the canonical view must cover ONLY the
    ingested id range — a source file slicing future batches must not
    leak never-deduped docs into the published canonicals."""
    root = str(tmp_path / "out")
    kw = _dag_kwargs(root)
    build([CurationCanonicals(n_batches=1, **kw)])
    view = spark.read.parquet(
        f"{root}/curation_ingest/image/canonicals-n=1"
    )
    ids = {r.doc_id for r in view.select("doc_id").collect()}
    assert ids and max(ids) < 250  # batch_size default = 250
    n_src = (
        spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    assert n_src > 250  # the source really does cover future batches


def test_all_duplicates_batch_takes_the_short_circuit(spark, tmp_path):
    """Round-11 review #2/#4: a batch whose docs are ALL exact
    duplicates of earlier docs empties s1 — the lexical stage must
    short-circuit (no unpruned store scan), the store must refuse the
    empty segment, and the batch's accepted target is empty while the
    exact edges still land in the ledger."""
    import pyspark.sql.functions as F  # noqa: F811

    from production_ready_ds_spark.operators.sigstore import SignatureStore

    src = str(tmp_path / "src")
    emb = str(tmp_path / "emb")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    b0 = docs.filter(F.col("doc_id") < 250)
    # batch 1 = byte-identical copies of batch 0's first 250 texts
    b1 = b0.withColumn("doc_id", F.col("doc_id") + 250)
    b0.unionByName(b1).write.parquet(src)
    spark.read.parquet(f"{SF}/embeddings.parquet").write.parquet(emb)

    root = str(tmp_path / "out")
    build(
        [
            CurationIngestBatch(
                data_root=root,
                source_path=src,
                embeddings_path=emb,
                batch=1,
            )
        ]
    )
    accepted1 = spark.read.parquet(
        f"{root}/curation_ingest/image/accepted-batch=1"
    )
    assert accepted1.count() == 0
    # the lexical store holds ONLY batch-0 signatures (the empty
    # batch-1 segment was refused inside SignatureStore.append)
    store = SignatureStore(f"{root}/curation_ingest/image/sig_store")
    assert [
        (s["id_min"], s["id_max"]) for s in store.segments()
    ] == [(0, 249)]
    # the exact edges reached the ledger: every batch-1 doc points at
    # its batch-0 original
    edges = spark.read.parquet(
        f"{root}/curation_ingest/image/edges/batch=1"
    )
    got = {(r.doc_a, r.doc_b) for r in edges.collect()}
    assert got == {(i, i + 250) for i in range(250)}


def test_incremental_equals_one_shot_video_and_audio(
    spark, tmp_path, monkeypatch
):
    """The composed DAG's perceptual stage is modality-parametrized —
    the video and audio chains must reproduce their one-shot decisions
    exactly, like the image chain (same operators, different
    fingerprint kernel).

    On THIS corpus the three modalities' raw-tier pair sets coincide
    (the synth generators share the doc_id-family layout), so decision
    equality alone cannot catch a chain that silently resolves the
    image kernel for every modality (round-11 review finding). The
    kernel WIRING is therefore pinned directly: both the DAG and the
    one-shot twin must invoke the named modality kernel and never the
    image kernel, via spies on the module globals the kernel table
    resolves at call time."""
    from production_ready_ds_spark.queries import multimodal as mm
    from production_ready_ds_spark.queries.curation_ingest import (
        _chain_decisions,
    )

    # premise made explicit: the KERNELS are genuinely different
    # computations on this corpus even though the derived pair sets
    # coincide — fingerprint values must differ per modality.
    from production_ready_ds_spark.tables import load

    probe = load(spark, SF, "documents").select("doc_id").limit(20)
    img_fp = {tuple(r) for r in mm.image_fingerprints_for(probe).collect()}
    for kernel in (mm.video_fingerprints_for, mm.audio_fingerprints_for):
        assert {tuple(r) for r in kernel(probe).collect()} != img_fp

    for modality in ("video", "audio"):
        calls = []
        named = getattr(mm, f"{modality}_fingerprints_for")

        def spy_named(ids, _named=named, _m=modality):
            calls.append(_m)
            return _named(ids)

        def spy_image(ids):
            raise AssertionError(
                f"image kernel resolved for modality={modality!r}"
            )

        monkeypatch.setattr(mm, f"{modality}_fingerprints_for", spy_named)
        monkeypatch.setattr(mm, "image_fingerprints_for", spy_image)
        root = str(tmp_path / f"out_{modality}")
        build(
            [
                CurationCanonicals(
                    n_batches=2, modality=modality, **_dag_kwargs(root)
                )
            ]
        )
        one = _chain_decisions(spark, SF, modality=modality).collect()
        # the DAG's two batches AND the one-shot twin each resolved the
        # named kernel (plan-build time, so recorded even pre-collect)
        assert len(calls) >= 3, (modality, calls)
        monkeypatch.undo()
        inc_kept = set()
        for b in (0, 1):
            inc_kept |= {
                r.doc_id
                for r in spark.read.parquet(
                    f"{root}/curation_ingest/{modality}/accepted-batch={b}"
                )
                .select("doc_id")
                .collect()
            }
        assert inc_kept == {r.doc_id for r in one if r.stage == "kept"}, modality
        assert any(r.stage == "perceptual" for r in one), modality
        canon = {
            (r.doc_id, r.family_id, r.keep_best)
            for r in spark.read.parquet(
                f"{root}/curation_ingest/{modality}/canonicals-n=2"
            ).collect()
        }
        assert canon == {
            (r.doc_id, r.family_id, r.keep_best) for r in one
        }, modality


def test_incremental_survives_store_compaction(spark, tmp_path):
    """With 10 small batches the per-store LSM fold FIRES mid-ingest
    (fanout 8 — round-11 store-maintenance wiring): decisions must
    stay identical to the one-shot chain, and the lexical store must
    actually end folded (fewer segments than batches), proving the
    compaction-aware read contract (merged segments keep covering id
    ranges; straddle filters apply id_below) under the composed DAG
    rather than only in unit tests."""
    from production_ready_ds_spark.operators.sigstore import SignatureStore
    from production_ready_ds_spark.queries.curation_ingest import (
        _chain_decisions,
    )

    root = str(tmp_path / "out")
    build(
        [
            CurationCanonicals(
                n_batches=10, batch_size=50, **_dag_kwargs(root)
            )
        ]
    )
    one = {r.doc_id for r in _chain_decisions(spark, SF).collect() if r.stage == "kept"}
    inc = _kept(spark, root, batches=range(10))
    assert inc == one

    store = SignatureStore(f"{root}/curation_ingest/image/sig_store")
    segs = store.segments()
    assert len(segs) < 10, [s["seg"] for s in segs]
    assert any(int(s.get("level", 0)) > 0 for s in segs), segs
    # observed row counts survive the fold (density-decision inputs)
    assert all(s.get("rows") is not None for s in segs), segs
