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
