"""Batch-ingest PERCEPTUAL dedup DAG: per-batch image near-dup
decisions against an accumulating fingerprint store — completing the
incremental-ingest triad (lexical = :mod:`ingest_dedup` via MinHash
signatures, semantic = :mod:`ingest_semdedup` via the IVF vector
index, perceptual = this, via banded dHash fingerprints in the SAME
manifest-backed SignatureStore layout under the DHASH family tag).

Same contract as both twins:

- **fingerprint once, ever**: a batch's images run the fused synth →
  resize → dHash kernel (queries/multimodal.image_fingerprints_for —
  byte-identical to the one-shot q_dedup_image path) exactly once;
  the store grows by the batch's 8 banded rows per doc.
- **per-batch work is O(batch)**: the store side of the band-bucket
  candidate join is manifest-selected and pruned to the batch's
  bucket keys by a pushed ``In(key, ...)`` parquet filter over
  range-clustered segments (operators/dedup.incremental_hamming_dedup
  with ``earlier_below`` — the range-deterministic form).
- **recompute determinism**: "earlier corpus" is derived from the
  batch id RANGE (``doc_id < lo``), never from store content, so
  deleting a batch target and re-running reproduces identical
  decisions even though the fingerprints were already appended (the
  append is idempotent under skip_if_range_indexed).
- **crash ordering**: fingerprints are indexed BEFORE the accepted
  target is published — a crash between the writes leaves an
  incomplete task that recomputes deterministically, never a
  complete-looking target whose fingerprints missed the store.
- **min-id canonical across batches**: a batch doc is rejected iff it
  is the MAX id of any Hamming ≤ radius pair — earlier-batch ids are
  always smaller by the range batching, so the lowest id of every
  perceptual family survives, matching q_dedup_image_clusters'
  keep-decision.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.dedup import DHASH_FAMILY, incremental_hamming_dedup
from ..workflow import Parameter, ParquetTarget, SparkTask

PHASH_BATCH_SIZE = 250  # doc_ids per batch: batch b = [b*SIZE, (b+1)*SIZE)


class PerceptualDedupBatch(SparkTask):
    """Accept the perceptually-novel documents of one ingest batch."""

    data_root = Parameter()
    source_path = Parameter()  # parquet of (doc_id, ...)
    batch = Parameter(default=0)

    def requires(self):
        b = int(self.batch)
        if b == 0:
            return []
        return [
            PerceptualDedupBatch(
                data_root=self.data_root, source_path=self.source_path, batch=b - 1
            )
        ]

    def output(self):
        return ParquetTarget(
            os.path.join(str(self.data_root), "ingest", f"pbatch={int(self.batch)}")
        )

    def _store(self) -> str:
        return os.path.join(str(self.data_root), "ingest", "phash_store")

    def main(self, spark) -> None:
        from ..queries.multimodal import image_fingerprints_for

        b = int(self.batch)
        lo, hi = b * PHASH_BATCH_SIZE, (b + 1) * PHASH_BATCH_SIZE
        docs = spark.read.parquet(str(self.source_path))
        batch_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))

        fp = image_fingerprints_for(batch_docs)
        # range-deterministic pairs + guarded append, one call — the
        # operator indexes the batch BEFORE we publish the target below
        pairs = incremental_hamming_dedup(
            fp, self._store(), family=DHASH_FAMILY, earlier_below=lo
        )
        rejects = (
            pairs.select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
        accepted = batch_docs.join(rejects, "doc_id", "left_anti")
        accepted.write.mode("overwrite").parquet(self.output().path)
