"""Multimodal catalog queries over the operators.multimodal plumbing.

q_multimodal_meta (JVM-side payload metadata) lives in llm.py with a
full oracle; the two here exercise the Python-kernel stages. The frame
sampler IS oracle-checkable (frame count/size arithmetic is pure math
DuckDB can replicate); the feature extractor is rows-only (byte
entropy in SQL would be its own project).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_payload, extract_features, sample_frames
from ..tables import load
from . import query


@query("q_multimodal_features", category="llm-multimodal", sql=None)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → feature extraction via the stubbed decoder kernel
    (deterministic byte statistics standing in for image/audio decode —
    codecs are unavailable here; the mapInPandas plumbing is real)."""
    d = attach_payload(load(spark, sf_dir, "documents"))
    return extract_features(d).select(
        "doc_id", "n_bytes", F.round("mean_byte", 4).alias("mean_byte"),
        F.round("byte_entropy", 4).alias("byte_entropy"),
    )


@query(
    "q_multimodal_frames",
    category="llm-multimodal",
    sql="""
    WITH f AS (
      SELECT doc_id, octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE ((n + 63) // 64 + 3) // 4 END AS BIGINT) AS n_frames,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE LEAST(64, n - (((((n + 63) // 64 + 3) // 4) - 1) * 4 * 64)) END AS BIGINT)
             AS last_frame_bytes
    FROM f WHERE n > 0
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' payloads (every 4th 64-byte chunk):
    per-doc frame count + last sampled frame size. The Python kernel
    explodes frames; the oracle re-derives the counts arithmetically —
    proving the UDTF batch shape produces exactly the declared rows."""
    d = attach_payload(load(spark, sf_dir, "documents"))
    frames = sample_frames(d, chunk_size=64, stride=4)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max_by("frame_bytes", "frame_idx").cast("long").alias("last_frame_bytes"),
    )


# --- audio: synthesized PCM payloads with a closed-form oracle ---------
#
# Square-wave synthesis parameters, all pure functions of doc_id so the
# oracle can re-derive every feature arithmetically:
AUDIO_SR = 8000
_N_SAMPLES = "800 + (doc_id % 5) * 80"  # 0.1 s .. 0.14 s
_AMP = "1000 + (doc_id % 7) * 500"  # peak amplitude
_HALF = "8 + (doc_id % 13)"  # samples per half-cycle


@query(
    "q_audio_features",
    category="llm-multimodal",
    bench=True,
    sql=f"""
    WITH p AS (
      SELECT doc_id,
             {_N_SAMPLES} AS n,
             {_AMP} AS a,
             {_HALF} AS half
      FROM documents
    )
    SELECT doc_id,
           {AUDIO_SR} AS sr,
           CAST(n AS BIGINT) AS n_samples,
           ROUND(n / {AUDIO_SR}.0, 4) AS duration_s,
           ROUND(CAST(a AS DOUBLE), 4) AS rms,
           ROUND(((n - 1) // half) * 1.0 / (n - 1), 6) AS zcr,
           CAST(a AS INT) AS peak
    FROM p
    """,
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, hash-verified: each document synthesizes a
    deterministic square-wave PCM payload (amplitude / length / period
    are pure functions of doc_id), the payload round-trips through the
    binary layout (magic + sample-rate header + int16 samples), and
    PCMAudioDecoder extracts duration / RMS / zero-crossing-rate / peak
    from the DECODED sample buffer — while the DuckDB oracle re-derives
    the same features in closed form (square wave: rms = amplitude
    exactly, zero crossings = (n-1) div half-period). A value mismatch
    anywhere in synth → struct-pack → Arrow batch → numpy decode →
    feature math fails the hash, making this the strongest evidence the
    multimodal plumbing is real, not a stub. All arithmetic is integer
    or exact-in-double (amplitude² ≤ 1.6e7 → sqrt of a perfect square),
    so no libm drift crosses the rounding grid.

    Scale shape: synthesis + decode are ONE mapInPandas pass (map-side,
    no shuffle, bounded batches); real audio arrives as stored payload
    bytes instead and the decode stage is unchanged — swap the synth
    for a parquet binary column, the classic multimodal ingest."""
    from ..operators.multimodal import PCMAudioDecoder, extract_features

    ids = load(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 800 + (doc_id % 5) * 80
                a = 1000 + (doc_id % 7) * 500
                half = 8 + (doc_id % 13)
                i = np.arange(n)
                samples = np.where((i // half) % 2 == 0, a, -a).astype("<i2")
                payloads.append(PCMAudioDecoder.encode(AUDIO_SR, samples))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    waves = ids.mapInPandas(synth, schema="doc_id long, payload binary")
    feats = extract_features(waves, PCMAudioDecoder())
    return feats.select(
        "doc_id",
        "sr",
        "n_samples",
        F.round("duration_s", 4).alias("duration_s"),
        F.round("rms", 4).alias("rms"),
        F.round("zcr", 6).alias("zcr"),
        "peak",
    )
