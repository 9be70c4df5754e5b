"""End-to-end training-corpus build: the full path from raw documents
to sharded, training-ready data as ONE incremental DAG.

    curation (score → filter → dedup-exact → dedup-near, curation.py)
      → Decontaminate → QualityFilter → MixCorpus → PackCorpus
      → ShardCorpus

This is the composition the catalog queries exist for: each stage
CALLS the same helper the oracle-checked operator uses
(traindata.contamination_scores / mix_kept_expr / pack_assignments —
one definition, so pipeline and oracle-verified query cannot diverge)
applied to the PREVIOUS stage's materialized output, under the
reference's incremental-target semantics (O1/O2: resume after the last
complete stage, delete one target and only the suffix recomputes —
reference `00_training_pipeline.py:26-27,65-66`).

Scale shape per stage: decontamination broadcasts the benchmark
shingle set and streams the corpus map-side; mixing is a map-only
deterministic hash draw; packing is one shuffle on the shard key +
per-partition window; sharding moves each doc once to its final shard
file. Nothing rescans an earlier stage's input, so a 100 TB build
touches each byte a constant number of times.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..queries.traindata import (
    PROBE_MOD,
    contamination_scores,
    mix_kept_expr,
    pack_assignments,
)
from ..tables import load
from ..workflow import Parameter, ParquetTarget, SparkTask
from .curation import DedupNear

#: drop a training doc when ≥ this fraction of its shingles appear in
#: the benchmark set (policy knob; the operator emits the full score)
CONTAMINATION_MAX = 0.5
N_SHARDS = 8


def _stage_dir(root: str, stage: str) -> str:
    return os.path.join(str(root), "corpus", stage)


class Decontaminate(SparkTask):
    """Drop benchmark docs and benchmark-contaminated docs.

    The held-out suite (doc_id % PROBE_MOD == 0, as in q_decontaminate)
    is excluded outright — eval data must never be trained on — and a
    surviving doc is dropped when ≥ CONTAMINATION_MAX of its 3-gram
    shingles appear in the suite. The probe shingle set broadcasts;
    the curated corpus streams through map-side. Docs too short to
    shingle carry no contamination evidence and are kept."""

    data_root = Parameter()
    sf_dir = Parameter()

    def requires(self):
        return DedupNear(data_root=self.data_root, sf_dir=self.sf_dir)

    def output(self):
        return ParquetTarget(_stage_dir(self.data_root, "decontaminated"))

    def main(self, spark):
        docs = spark.read.parquet(self.requires().output().path)
        is_probe = F.pmod(F.col("doc_id"), F.lit(PROBE_MOD)) == 0
        # the benchmark suite is defined over the RAW table: a probe doc
        # dropped by curation still contaminates training text
        probe_docs = load(spark, str(self.sf_dir), "documents").filter(is_probe)
        corpus = docs.filter(~is_probe)
        contaminated = (
            contamination_scores(corpus, probe_docs)
            .filter(F.col("contamination") >= CONTAMINATION_MAX)
            .select("doc_id")
        )
        corpus.join(contaminated, "doc_id", "left_anti").write.mode(
            "overwrite"
        ).parquet(self.output().path)


class QualityFilter(SparkTask):
    """Quality gate over the decontaminated corpus, two methods behind
    one Parameter:

    - ``method='perplexity'`` (default): score every surviving doc
      under the corpus-trained bigram LM via the SAME shared helpers
      the oracle-checked q_quality_perplexity uses (doc_bigrams /
      bigram_model / perplexity_terms / perplexity_report — one
      definition) and drop the worst-scoring decile. The cutoff is
      the EXACT 90th percentile of avg_nll_scaled (deterministic
      integer scores → deterministic cutoff → reproducible
      backfills); docs too short to produce a bigram carry no
      evidence and are kept, the same keep-on-no-evidence stance as
      Decontaminate. One vocabulary-sized model build + one
      corpus-wide scoring join per run.
    - ``method='classifier'``: the trained-model gate
      (q_quality_classifier / llm.quality_classifier_scores — one
      definition): logistic regression on hashed token counts, weak
      labels from the Gopher→perplexity teacher ladder, drop docs the
      model scores below 0.5. Featurize+score are map-only; training
      is per-training-row (sample-trainable at scale); a degenerate
      (one-class) teacher keeps everything — no evidence, no drop.
    - ``method='readability'``: the Flesch gate
      (q_quality_readability / llm.readability_scores — one
      definition): drop docs whose snapped reading-ease lands in the
      'difficult' band (< 30.00) — a FIXED interpretable threshold,
      not a corpus percentile, so the gate's behavior doesn't shift
      with the batch mix; map-only, zero extra shuffles; zero-word
      docs carry no evidence and are kept."""

    data_root = Parameter()
    sf_dir = Parameter()
    method = Parameter(default="perplexity")

    def requires(self):
        return Decontaminate(data_root=self.data_root, sf_dir=self.sf_dir)

    def output(self):
        # default method keeps the original stage dir; variants get
        # their own target so switching methods recomputes the suffix
        stage = "quality" if self.method == "perplexity" else f"quality-{self.method}"
        return ParquetTarget(_stage_dir(self.data_root, stage))

    def main(self, spark):
        docs = spark.read.parquet(self.requires().output().path)
        if self.method == "classifier":
            from ..queries.llm import quality_classifier_scores

            bad = quality_classifier_scores(docs).filter(~F.col("keep")).select(
                "doc_id"
            )
        elif self.method == "readability":
            from ..queries.llm import readability_scores

            bad = readability_scores(docs).filter(
                F.col("band") == "difficult"
            ).select("doc_id")
        elif self.method == "perplexity":
            from ..queries.llm import (
                bigram_model,
                doc_bigrams,
                perplexity_report,
                perplexity_terms,
            )

            # shuffle_hash: never let the exploded bigram side's
            # file-size underestimate broadcast it (llm.py rule)
            scores = perplexity_report(
                perplexity_terms(
                    doc_bigrams(docs), bigram_model(docs).hint("shuffle_hash")
                )
            ).localCheckpoint(eager=True)
            cutoff = scores.agg(
                F.expr("percentile(avg_nll_scaled, 0.9)").alias("c")
            ).first()["c"]
            bad = scores.filter(F.col("avg_nll_scaled") > cutoff).select("doc_id")
        else:
            raise ValueError(f"unknown QualityFilter method {self.method!r}")
        docs.join(bad, "doc_id", "left_anti").write.mode("overwrite").parquet(
            self.output().path
        )


class MixCorpus(SparkTask):
    """Deterministic mixture sampling (q_mix_domains): keep a doc iff
    its md5(doc_id) hex prefix clears the language's threshold — a
    reproducible uniform draw, so backfills re-make identical
    decisions. Map-only."""

    data_root = Parameter()
    sf_dir = Parameter()

    def requires(self):
        return QualityFilter(data_root=self.data_root, sf_dir=self.sf_dir)

    def output(self):
        return ParquetTarget(_stage_dir(self.data_root, "mixed"))

    def main(self, spark):
        docs = spark.read.parquet(self.requires().output().path)
        docs.filter(mix_kept_expr()).write.mode("overwrite").parquet(
            self.output().path
        )


class PackCorpus(SparkTask):
    """Sequence packing (q_pack_sequences): per language, concatenate
    docs in stable doc_id order and assign each to the SEQ_BUDGET-token
    sequence its first token falls in. One shuffle on the pack key +
    a per-partition window."""

    data_root = Parameter()
    sf_dir = Parameter()

    def requires(self):
        return MixCorpus(data_root=self.data_root, sf_dir=self.sf_dir)

    def output(self):
        return ParquetTarget(_stage_dir(self.data_root, "packed"))

    def main(self, spark):
        from ..functions.text import tokens_expr

        docs = spark.read.parquet(self.requires().output().path)
        t = docs.select(
            "doc_id", "lang", F.size(tokens_expr(F.col("text"))).alias("n")
        )
        pack_assignments(t).select("doc_id", "lang", "seq_id", "n").write.mode(
            "overwrite"
        ).parquet(self.output().path)


class ShardCorpus(SparkTask):
    """Final training shards: whole sequences hash to one of N_SHARDS
    partitions (shard = xxhash64(lang, seq_id) mod N — splitting a
    sequence across shards would break the packer's contract), text
    joined back from the mixed corpus, written partitioned by shard.
    Each doc moves exactly once; shard files are the data-loader's
    input units and their count bounds read parallelism."""

    data_root = Parameter()
    sf_dir = Parameter()

    def requires(self):
        return [
            PackCorpus(data_root=self.data_root, sf_dir=self.sf_dir),
            MixCorpus(data_root=self.data_root, sf_dir=self.sf_dir),
        ]

    def output(self):
        return ParquetTarget(_stage_dir(self.data_root, "shards"))

    def main(self, spark):
        packed_t, mixed_t = (t.output().path for t in self.requires())
        assignment = spark.read.parquet(packed_t)
        docs = spark.read.parquet(mixed_t).select("doc_id", "text")
        shard = F.pmod(F.xxhash64("lang", "seq_id"), F.lit(N_SHARDS)).cast("int")
        (
            assignment.withColumn("shard", shard)
            .join(docs, "doc_id")
            .select("shard", "lang", "seq_id", "doc_id", "n", "text")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(self.output().path)
        )


def corpus_build_dag(data_root: str, sf_dir: str) -> ShardCorpus:
    """The full raw-documents → training-shards DAG, rooted at its
    final stage."""
    return ShardCorpus(data_root=data_root, sf_dir=sf_dir)
