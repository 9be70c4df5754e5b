"""Streaming near-dup candidates (streaming/dedup.py): the stateful
ingest-dedup keep-rule must reproduce the batch minhash_candidates pair
set across micro-batches, signatures must be bit-identical to the batch
hash chain, and bucket state must respect the rank cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.operators.dedup import (
    minhash_bands,
    minhash_candidates,
)
from production_ready_ds_spark.streaming.dedup import (
    banded_signatures,
    streaming_minhash_candidates,
)

BODY = "the shared body of a fairly long document about distributed query engines"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus_rows():
    rows = []
    # family A spans both micro-batches; family B is batch-2-local
    rows += [(i, BODY + f" tail{i % 2}") for i in range(6)]
    rows += [(6, "an entirely unrelated document on another topic with novel words")]
    rows += [(10 + i, BODY + " tail0") for i in range(3)]  # joins family A
    rows += [(20, "fresh second batch content nothing shares"), (21, "fresh second batch content nothing shares")]
    return rows


def test_expression_signatures_match_batch_chain(spark):
    """The map-only signature expressions must be bit-identical to the
    explode+groupBy chain in minhash_bands (same xxhash64 composition)."""
    d = _docs(spark, _corpus_rows())
    batch = {
        (r.doc_id, r.band): tuple(r[f"mh{i}"] for i in range(16))
        for r in minhash_bands(d, materialize=False).collect()
    }
    stream_form = {
        (r.doc_id, r.band): tuple(r[f"mh{i}"] for i in range(16))
        for r in banded_signatures(d).collect()
    }
    assert stream_form == batch


def test_streaming_candidates_equal_batch(spark, tmp_path):
    """Two in-id-order micro-batches through the stateful operator must
    emit exactly the batch self-join's pair set (after the documented
    cross-band distinct)."""
    rows = _corpus_rows()
    d = _docs(spark, rows)
    want = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_candidates(minhash_bands(d)).collect()
    }
    assert want, "corpus must contain near-dup pairs"

    src = str(tmp_path / "docs_split")
    lo = _docs(spark, [r for r in rows if r[0] < 10])
    hi = _docs(spark, [r for r in rows if r[0] >= 10])
    lo.coalesce(1).write.parquet(src)
    hi.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(d.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        streaming_minhash_candidates(stream)
        .writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.lastProgress["batchId"] >= 1, "expected >= 2 micro-batches"
    got = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in spark.table("t_sdedup").distinct().collect()
    }
    assert got == want


def test_streaming_redelivery_is_noop(spark, tmp_path):
    """Delivering the same file twice must not re-emit pairs or corrupt
    state (doc ids already in the bucket are skipped)."""
    rows = [(0, BODY + " first"), (1, BODY + " second")]
    src = str(tmp_path / "docs_redeliver")
    _docs(spark, rows).coalesce(1).write.parquet(src)
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_minhash_candidates(stream)
        .writeStream.format("memory")
        .queryName("t_sdedup2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = spark.table("t_sdedup2").collect()
    per_band = (
        spark.table("t_sdedup2").groupBy("doc_a", "doc_b").count().collect()
    )
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 1)}
    assert all(r["count"] <= 4 for r in per_band), "re-delivery must not re-emit"


def test_streaming_bucket_state_respects_cap(spark, tmp_path):
    """A duplicate family larger than the cap: every doc still pairs
    with the cap lowest ids (linear work), emitted doc_a stays within
    the cap set — the oversized-bucket guard semantics, held in state."""
    from production_ready_ds_spark.operators.dedup import OVERSIZED_BUCKET_CAP

    n = OVERSIZED_BUCKET_CAP + 15
    rows = [(i, "an identical template page repeated verbatim everywhere") for i in range(n)]
    src = str(tmp_path / "docs_fam")
    _docs(spark, rows).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        streaming_minhash_candidates(stream)
        .writeStream.format("memory")
        .queryName("t_sdedup3")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("t_sdedup3").distinct().collect()
    assert len(got) <= n * OVERSIZED_BUCKET_CAP
    assert {r.doc_a for r in got} <= set(range(OVERSIZED_BUCKET_CAP))
    # every doc beyond the cap is still detected (has an edge)
    seen = {r.doc_b for r in got} | {r.doc_a for r in got}
    assert seen == set(range(n))


def _fp_rows_for(spark, ids):
    """Fingerprint a doc_id list through the SAME fused kernel the
    batch query runs (synth → resize → dHash)."""
    from production_ready_ds_spark.queries.multimodal import (
        image_fingerprints_for,
    )

    return image_fingerprints_for(
        spark.createDataFrame([(i,) for i in ids], "doc_id long")
    )


def test_streaming_hamming_candidates_equal_batch(spark, tmp_path):
    """The perceptual stateful operator across two in-id-order
    micro-batches must emit exactly the batch hamming_candidates pair
    set (after the documented cross-band distinct) — pairs spanning
    the batch boundary included."""
    from production_ready_ds_spark.operators.dedup import hamming_candidates
    from production_ready_ds_spark.streaming.dedup import (
        streaming_hamming_candidates,
    )

    ids = list(range(40))  # 10 synth groups of 4 near-identical variants
    want = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_candidates(_fp_rows_for(spark, ids)).collect()
    }
    assert want, "synth corpus must contain perceptual families"
    # family groups are ids (4g..4g+3): the batch split at 22 puts
    # group 5 astride the boundary -> cross-batch pairs exercised
    src = str(tmp_path / "fp_split")
    _fp_rows_for(spark, ids[:22]).coalesce(1).write.parquet(src)
    _fp_rows_for(spark, ids[22:]).coalesce(1).write.mode("append").parquet(src)

    fp_schema = "doc_id long, " + ", ".join(f"b{k} long" for k in range(8))
    stream = (
        spark.readStream.schema(fp_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_hamming_candidates(stream)
        .writeStream.format("memory")
        .queryName("t_shdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.lastProgress["batchId"] >= 1, "expected >= 2 micro-batches"
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in spark.table("t_shdedup").distinct().collect()
    }
    assert got == want


def test_streaming_hamming_redelivery_is_noop(spark, tmp_path):
    """Delivering the same fingerprint file twice must not re-emit
    pairs (hwm + membership skip), matching the minhash twin."""
    from production_ready_ds_spark.streaming.dedup import (
        streaming_hamming_candidates,
    )

    src = str(tmp_path / "fp_redeliver")
    _fp_rows_for(spark, [0, 1]).coalesce(1).write.parquet(src)
    _fp_rows_for(spark, [0, 1]).coalesce(1).write.mode("append").parquet(src)
    fp_schema = "doc_id long, " + ", ".join(f"b{k} long" for k in range(8))
    stream = (
        spark.readStream.schema(fp_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_hamming_candidates(stream)
        .writeStream.format("memory")
        .queryName("t_shdedup2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = spark.table("t_shdedup2").collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(0, 1)}
    per_band = spark.table("t_shdedup2").groupBy("doc_a", "doc_b").count().collect()
    assert all(r["count"] <= 8 for r in per_band), "re-delivery must not re-emit"


def _run_fp_stream(spark, src, name):
    from production_ready_ds_spark.streaming.dedup import (
        streaming_hamming_candidates,
    )

    fp_schema = "doc_id long, " + ", ".join(f"b{k} long" for k in range(8))
    stream = (
        spark.readStream.schema(fp_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_hamming_candidates(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r.doc_a, r.doc_b, r.hamming)
        for r in spark.table(name).distinct().collect()
    }


def test_streaming_hamming_raw_tier_on_superband_corpus(spark, tmp_path):
    """Round-11 ADVICE item 1 pinned: on a corpus whose MEASURED
    entropy tier resolves to super-bands, the stream (which always
    blocks on raw 16-bit bands) must still equal batch
    hamming_candidates FORCED to the raw tier — while the
    measured-tier batch result DIVERGES (uncapped, raw is a strict
    superset within the radius; with hot buckets the per-tier cap
    moves pairs in both directions), which is exactly why the
    q_stream_dedup_* oracles pin sb = 1 instead of assuming the tiers
    agree."""
    from production_ready_ds_spark.operators.dedup import hamming_candidates

    # low-entropy fingerprints: every band key drawn from {0, 1}, so
    # sum of per-band distinct keys = 16 << n_docs -> super-band tier.
    # Pairs at Hamming <= 7 exist that flip bits in 4+ DISTINCT base
    # bands (one bit in each of bands 0..3 vs doc 0) -> raw blocking
    # keeps them, super-band blocking can lose ones flipping in all 4
    # super-bands.
    rows = []
    for i in range(40):
        # doc i flips band (i % 8) to key 1; doc 0's near-family
        rows.append(tuple([i] + [1 if k == (i % 8) else 0 for k in range(8)]))
    # and one doc at distance 4 from doc 8's all-zero-except-band0:
    rows.append(tuple([100, 1, 1, 1, 1, 0, 0, 0, 0]))
    schema = "doc_id long, " + ", ".join(f"b{k} long" for k in range(8))
    fp = spark.createDataFrame(rows, schema)

    raw = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_candidates(fp, mean_bucket_limit=10**9).collect()
    }
    measured = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_candidates(fp).collect()
    }
    assert measured != raw, (
        "corpus must exercise the tier divergence the raw-pin guards"
    )
    assert raw, "corpus must contain radius pairs"

    src = str(tmp_path / "fp_lowent")
    ordered = sorted(rows)
    spark.createDataFrame(ordered[:20], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(ordered[20:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = _run_fp_stream(spark, src, "t_shdedup_raw")
    assert got == raw


def test_stream_dedup_oracles_pin_raw_tier():
    """The streaming perceptual twins must declare the raw-tier oracle
    (sb pinned to 1), never the measured-tier batch oracle."""
    from production_ready_ds_spark.queries import catalog
    from production_ready_ds_spark.queries.multimodal import (
        _TIER_PARAMS_MEASURED,
        _TIER_PARAMS_RAW,
    )

    cat = catalog()
    for name in (
        "q_stream_dedup_image",
        "q_stream_dedup_video",
        "q_stream_dedup_audio",
    ):
        sql = cat[name].sql
        assert _TIER_PARAMS_RAW in sql, name
        assert _TIER_PARAMS_MEASURED not in sql, name


def test_streaming_video_audio_equal_batch(spark, tmp_path):
    """q_stream_dedup_video / q_stream_dedup_audio: the modality-blind
    stateful operator over the video and audio fingerprint kernels
    must equal batch hamming_candidates at raw tier across
    micro-batches (the image twin's equivalence, per modality)."""
    from production_ready_ds_spark.operators.dedup import hamming_candidates
    from production_ready_ds_spark.queries.multimodal import (
        audio_fingerprints_for,
        video_fingerprints_for,
    )

    ids = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    for tag, fp_for in (("vid", video_fingerprints_for), ("aud", audio_fingerprints_for)):
        fp = fp_for(ids).localCheckpoint(eager=True)
        want = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in hamming_candidates(fp, mean_bucket_limit=10**9).collect()
        }
        assert want, f"{tag}: synth corpus must contain perceptual families"
        src = str(tmp_path / f"fp_{tag}")
        lo = fp.filter(F.col("doc_id") < 13)
        hi = fp.filter(F.col("doc_id") >= 13)
        lo.coalesce(1).write.parquet(src)
        hi.coalesce(1).write.mode("append").parquet(src)
        got = _run_fp_stream(spark, src, f"t_sh_{tag}")
        assert got == want
