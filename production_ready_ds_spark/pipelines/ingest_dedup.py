"""Batch-ingest dedup DAG: per-batch near-dup filtering against an
accumulating signature store.

The reference's daily pipeline fetches one day, cleans it, and writes a
per-day target (reference `01_classification_pipeline.py:28-48,203-207`,
backfill semantics `run_pipeline.sh:6-11`). This DAG applies the same
incremental-target pattern to corpus DEDUP: each batch of documents is
checked against everything indexed before it (and itself), accepted
survivors land in a per-batch target, and the MinHash signature store
grows by exactly the new batch — signatures are computed once per
document, ever (operators/dedup.py minhash_bands/minhash_candidates).

Recompute safety: the keep-decision derives the "earlier corpus" from
the batch RANGE (ids below the batch's lower bound), not from what
happens to be in the store — so deleting a batch's output and re-running
reproduces the identical accepted set even though the store was already
appended (append itself is guarded by an anti-join on indexed ids, so
re-runs never duplicate signatures).

100 TB shape: per batch, work is the batch's shingles plus one
band-bucket join against the store; nothing re-reads, re-shingles, or
re-hashes the corpus. Store growth is ~(N_hashes+2)·8 B per doc per
band.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.dedup import minhash_bands, minhash_candidates
from ..workflow import Parameter, ParquetTarget, SparkTask

BATCH_SIZE = 250  # doc_ids per ingest batch: batch b = [b*SIZE, (b+1)*SIZE)


class DedupBatch(SparkTask):
    """Accept the non-duplicate documents of one ingest batch.

    A batch document is rejected when it near-duplicates (band-bucket
    collision + est_jaccard ≥ threshold) either an earlier-batch
    document or a lower-id document of its own batch — so the lowest id
    of every duplicate family is the canonical survivor across batches,
    matching the exact-dedup keep-min rule (q_dedup_exact)."""

    data_root = Parameter()
    source_path = Parameter()  # parquet of (doc_id, text, ...)
    batch = Parameter(default=0)

    def requires(self):
        b = int(self.batch)
        if b == 0:
            return []
        return [
            DedupBatch(
                data_root=self.data_root, source_path=self.source_path, batch=b - 1
            )
        ]

    def output(self):
        return ParquetTarget(
            os.path.join(str(self.data_root), "ingest", f"batch={int(self.batch)}")
        )

    def _store(self) -> str:
        return os.path.join(str(self.data_root), "ingest", "sig_store")

    def main(self, spark) -> None:
        b = int(self.batch)
        lo, hi = b * BATCH_SIZE, (b + 1) * BATCH_SIZE
        docs = spark.read.parquet(str(self.source_path))
        batch_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))

        fresh = minhash_bands(batch_docs)
        store_path = self._store()
        have_store = os.path.isdir(store_path) and any(
            f.endswith(".parquet") for f in os.listdir(store_path)
        )
        if have_store:
            # earlier corpus = ids strictly below this batch's range —
            # derived from the RANGE so recomputes are deterministic
            # even though this batch's own signatures may already sit
            # in the store from a previous (deleted-output) run.
            earlier = spark.read.parquet(store_path).filter(F.col("doc_id") < lo)
            right = fresh.unionByName(earlier)
        else:
            right = fresh
        pairs = minhash_candidates(fresh, right)
        rejects = pairs.select(F.col("doc_b").alias("doc_id")).distinct().filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        accepted = batch_docs.join(rejects, "doc_id", "left_anti")
        accepted.write.mode("overwrite").parquet(self.output().path)

        # guarded append: never duplicate signatures on recompute
        if have_store:
            known = spark.read.parquet(store_path).select("doc_id").distinct()
            fresh = fresh.join(known, "doc_id", "left_anti")
            fresh = fresh.localCheckpoint(eager=True)  # read store before appending to it
        fresh.write.mode("append").parquet(store_path)
