"""Multimodal column operators: opaque binary payloads + typed metadata.

The data model for image/audio/video at 100 TB: one ``binary`` payload
column plus scalar metadata columns (modality, byte size, content
hash), processed by Arrow-batched ``mapInPandas`` stages. Decode /
resize / frame-sample run per batch with bounded memory; partitioning
is by content hash so payload sizes spread evenly.

The actual media codecs are NOT available in this environment, so the
decode kernel is stubbed: ``decode_features`` computes deterministic
byte-level statistics standing in for a real decoder, and
``decode_image`` raises NotImplementedError by contract. The Spark-side
plumbing — schemas, batch iteration, partitioning, UDF signatures — is
real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema produced by attach_payload
PAYLOAD_COLUMNS = ("payload", "modality", "n_bytes", "content_md5")

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, byte_entropy double, "
    "head_bytes array<int>"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_md5 string"


def attach_payload(df: DataFrame, content_col: str = "text", modality: str = "text") -> DataFrame:
    """Wrap a content column as an opaque binary payload with typed
    metadata — the ingestion step of a multimodal pipeline (for real
    media the payload arrives as bytes already; UTF-8 text bytes stand
    in here)."""
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "modality", F.lit(modality)
    ).withColumn("n_bytes", F.octet_length(F.col(content_col)).cast("long")).withColumn(
        "content_md5", F.md5(payload)
    )


def repartition_by_content(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Spread payloads by content hash so a few huge files can't skew
    one task (the standard multimodal-shuffle discipline)."""
    return (
        df.repartition(num_partitions, F.col("content_md5"))
        if num_partitions
        else df.repartition(F.col("content_md5"))
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by contract
    """STUB: real image decode requires PIL/opencv, not installed in
    this environment. The mapInPandas stages below call
    ``decode_features`` (deterministic byte statistics) instead."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "decode_features provides the deterministic stand-in"
    )


def decode_features_batches(it):
    """mapInPandas kernel: payload → fixed-shape feature row.

    Deterministic fake 'decoder': byte mean, byte entropy, first-4-byte
    sample — the same batch shape a real decoder+featurizer would have
    (one output row per payload, bounded per-batch memory)."""
    import math

    import pandas as pd

    def feats(buf: bytes):
        if buf is None or len(buf) == 0:
            return 0, 0.0, 0.0, []
        counts: dict[int, int] = {}
        for b in buf:
            counts[b] = counts.get(b, 0) + 1
        n = len(buf)
        entropy = -sum((c / n) * math.log2(c / n) for c in counts.values())
        return n, sum(buf) / n, entropy, [int(b) for b in buf[:4]]

    for pdf in it:
        rows = [feats(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [r[0] for r in rows],
                "mean_byte": [round(r[1], 4) for r in rows],
                "byte_entropy": [round(r[2], 4) for r in rows],
                "head_bytes": [r[3] for r in rows],
            }
        )


def extract_features(df: DataFrame) -> DataFrame:
    """payload table → feature table via Arrow-batched mapInPandas."""
    return df.select("doc_id", "payload").mapInPandas(
        decode_features_batches, schema=FEATURE_SCHEMA
    )


def sample_frames_batches(chunk_size: int = 64, stride: int = 4):
    """mapInPandas kernel factory: 'video' payload → every stride-th
    chunk_size-byte chunk as a 'frame' row (the frame-sampling batch
    shape; a real pipeline swaps the chunker for a codec's keyframe
    iterator)."""

    def run(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                if buf is None:
                    continue
                frames = [buf[o : o + chunk_size] for o in range(0, len(buf), chunk_size)]
                for idx, frame in enumerate(frames[::stride]):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return run


def sample_frames(df: DataFrame, chunk_size: int = 64, stride: int = 4) -> DataFrame:
    """payload table → exploded frame table (UDTF shape: 1 row → N rows)."""
    return df.select("doc_id", "payload").mapInPandas(
        sample_frames_batches(chunk_size, stride), schema=FRAME_SCHEMA
    )
