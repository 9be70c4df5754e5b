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


# --- incremental PERCEPTUAL dedup (banded bit-fingerprints) -------------


def _fp_rows(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, " + ", ".join(f"b{k} long" for k in range(8))
    )


def _group_fp(g, flip=()):
    """Deterministic 8x16-bit fingerprint for group g; `flip` lists
    (band, bit) positions to perturb."""
    fp = [((g * 2654435761 + k * 40503) % 2147483647) % 65536 for k in range(8)]
    for band, bit in flip:
        fp[band] ^= 1 << bit
    return fp


def test_incremental_hamming_matches_batch_and_is_idempotent(spark, tmp_path):
    from production_ready_ds_spark.operators.dedup import (
        hamming_candidates,
        incremental_hamming_dedup,
    )

    rows = []
    for g in range(30):
        rows.append((4 * g, *_group_fp(g)))
        rows.append((4 * g + 1, *_group_fp(g, flip=[(0, 3)])))
        rows.append((4 * g + 2, *_group_fp(g, flip=[(5, 7), (5, 9)])))
        rows.append((4 * g + 3, *_group_fp(g, flip=[(2, 1)])))
    full = _fp_rows(spark, rows)
    want = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_candidates(full, radius=7).collect()
    }
    assert len(want) == 30 * 6, "every group of 4 must fully pair"

    store = str(tmp_path / "fp")
    b1 = _fp_rows(spark, [r for r in rows if r[0] < 60])
    b2 = _fp_rows(spark, [r for r in rows if r[0] >= 60])
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in incremental_hamming_dedup(b1, store).collect()
    }
    got |= {
        (r.doc_a, r.doc_b, r.hamming)
        for r in incremental_hamming_dedup(b2, store).collect()
    }
    assert got == want, "2-batch incremental must equal the one-shot batch pairs"

    # idempotent re-delivery: no new pairs, no new segment
    from production_ready_ds_spark.operators.sigstore import SignatureStore
    from production_ready_ds_spark.operators.dedup import DHASH_FAMILY

    n_segs = len(SignatureStore(store, family=DHASH_FAMILY).segments())
    again = incremental_hamming_dedup(b1, store).collect()
    assert again == []
    assert len(SignatureStore(store, family=DHASH_FAMILY).segments()) == n_segs


def test_incremental_hamming_prunes_store_reads(spark, tmp_path):
    """The corpus side of the candidate join must carry the batch's
    bucket keys as a pushed In(key) predicate — per-batch store IO is
    O(batch), not O(corpus)."""
    from production_ready_ds_spark.operators.dedup import incremental_hamming_dedup

    store = str(tmp_path / "fp")
    b1 = _fp_rows(spark, [(i, *_group_fp(i)) for i in range(40)])
    incremental_hamming_dedup(b1, store)
    # a second batch with one near-dup of group 7
    b2 = _fp_rows(spark, [(100, *_group_fp(7, flip=[(1, 2)]))])
    pairs = incremental_hamming_dedup(b2, store)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got == {(7, 100): 1}


def test_fingerprint_store_family_guard(spark, tmp_path):
    """A dHash store must refuse to serve a MinHash-family manifest and
    vice versa — incomparable signature integers."""
    import pytest as _pytest

    from production_ready_ds_spark.operators.dedup import (
        DHASH_FAMILY,
        incremental_hamming_dedup,
    )
    from production_ready_ds_spark.operators.sigstore import SignatureStore

    store = str(tmp_path / "fp")
    incremental_hamming_dedup(_fp_rows(spark, [(1, *_group_fp(1))]), store)
    assert SignatureStore(store, family=DHASH_FAMILY).segments()
    with _pytest.raises(ValueError, match="family"):
        SignatureStore(store).segments()  # default = MinHash family


def test_incremental_hamming_dedupes_within_batch(spark, tmp_path):
    """At-least-once delivery can duplicate an id WITHIN one batch: the
    duplicate must collapse before pairing and appending — no repeated
    pair rows, and the store holds exactly 8 band rows per doc."""
    from production_ready_ds_spark.operators.dedup import (
        DHASH_FAMILY,
        incremental_hamming_dedup,
    )
    from production_ready_ds_spark.operators.sigstore import SignatureStore

    store = str(tmp_path / "fp")
    rows = [(0, *_group_fp(3)), (1, *_group_fp(3, flip=[(0, 2)]))]
    batch = _fp_rows(spark, rows + rows)  # every row delivered twice
    pairs = incremental_hamming_dedup(batch, store).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in pairs] == [(0, 1, 1)]
    stored = spark.read.parquet(store)
    assert stored.count() == 2 * 8


def test_incremental_hamming_family_knob_separates_modalities(spark, tmp_path):
    """An audio-envelope store (ENVELOPE_FAMILY) must refuse a default
    dHash read and vice versa — both are (id, b0..b7) banded rows, so
    without the tag a pipeline could silently score image dHashes
    against audio envelopes; with it the mistake is an error."""
    import pytest as _pytest

    from production_ready_ds_spark.operators.dedup import (
        ENVELOPE_FAMILY,
        incremental_hamming_dedup,
    )

    store = str(tmp_path / "env")
    b1 = _fp_rows(spark, [(i, *_group_fp(i)) for i in range(8)])
    out = incremental_hamming_dedup(b1, store, family=ENVELOPE_FAMILY)
    assert out.collect() == []  # first batch, no prior corpus
    with _pytest.raises(ValueError, match="family"):
        incremental_hamming_dedup(b1, store)  # default dHash tag
    # same family keeps working and stays idempotent
    again = incremental_hamming_dedup(b1, store, family=ENVELOPE_FAMILY)
    assert again.collect() == []
