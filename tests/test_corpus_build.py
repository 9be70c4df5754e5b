"""End-to-end corpus build (pipelines/corpus_build.py): raw documents →
curation → decontamination → mixture → packing → training shards, with
the reference's incremental semantics and fully deterministic output."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.pipelines.corpus_build import (
    CONTAMINATION_MAX,
    N_SHARDS,
    PackCorpus,
    ShardCorpus,
    corpus_build_dag,
)
from production_ready_ds_spark.queries.traindata import PROBE_MOD, SEQ_BUDGET
from production_ready_ds_spark.workflow import build


def _build(spark, root, sf):
    return build([corpus_build_dag(root, sf)])


def test_end_to_end_build_produces_clean_shards(spark, sf_small, tmp_path):
    root = str(tmp_path)
    report = _build(spark, root, sf_small)
    # 4 curation stages upstream of DedupNear + 5 corpus stages (the
    # funnel's report task is a sibling, not a dependency)
    assert len(report["ran"]) == 9, report
    shards = spark.read.parquet(f"{root}/corpus/shards")

    # every probe (benchmark) doc is excluded from training data
    assert shards.filter(F.pmod(F.col("doc_id"), F.lit(PROBE_MOD)) == 0).count() == 0
    # shard ids live in [0, N_SHARDS) and sequences are never split
    assert shards.select("shard").distinct().count() <= N_SHARDS
    split = (
        shards.groupBy("lang", "seq_id")
        .agg(F.countDistinct("shard").alias("k"))
        .filter(F.col("k") > 1)
    )
    assert split.count() == 0, "a packed sequence straddles shards"
    # packing invariant: a sequence holds > SEQ_BUDGET tokens only when
    # a single long doc overflows it (the doc belongs to the sequence
    # its FIRST token falls in)
    seq_sizes = shards.groupBy("lang", "seq_id").agg(
        F.sum("n").alias("tok"), F.count("*").alias("docs")
    )
    bad = seq_sizes.filter(
        (F.col("tok") > 2 * SEQ_BUDGET) & (F.col("docs") > 1)
    ).count()
    assert bad == 0

    # shard content equals the mixed corpus joined to its assignment
    mixed_ids = {r.doc_id for r in spark.read.parquet(f"{root}/corpus/mixed").select("doc_id").collect()}
    shard_ids = {r.doc_id for r in shards.select("doc_id").collect()}
    assert shard_ids == mixed_ids


def test_contaminated_docs_are_dropped(spark, sf_small, tmp_path):
    """Deliberately re-derives the contamination score from first
    principles (shingle + broadcast join) instead of calling
    contamination_scores — an independent check, not a mirror of the
    implementation."""
    root = str(tmp_path)
    _build(spark, root, sf_small)
    from production_ready_ds_spark.operators.dedup import shingled_docs
    from production_ready_ds_spark.tables import load

    probe = (
        shingled_docs(
            load(spark, sf_small, "documents").filter(
                F.pmod(F.col("doc_id"), F.lit(PROBE_MOD)) == 0
            )
        )
        .select("sg")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    kept = spark.read.parquet(f"{root}/corpus/decontaminated")
    scores = (
        shingled_docs(kept)
        .join(F.broadcast(probe), "sg", "left")
        .groupBy("doc_id")
        .agg((F.count("hit") / F.count(F.lit(1))).alias("c"))
    )
    assert scores.filter(F.col("c") >= CONTAMINATION_MAX).count() == 0


def test_suffix_recompute_and_idempotence(spark, sf_small, tmp_path):
    root = str(tmp_path)
    _build(spark, root, sf_small)
    assert _build(spark, root, sf_small)["ran"] == [], "complete DAG reruns nothing"
    # delete the packed stage: only pack + shards recompute
    PackCorpus(data_root=root, sf_dir=sf_small).output().remove()
    ShardCorpus(data_root=root, sf_dir=sf_small).output().remove()
    report = _build(spark, root, sf_small)
    ran = {t.split("(")[0] for t in report["ran"]}
    assert ran == {"PackCorpus", "ShardCorpus"}, report["ran"]


def test_build_is_deterministic_across_roots(spark, sf_small, tmp_path):
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    _build(spark, r1, sf_small)
    _build(spark, r2, sf_small)

    def snapshot(root):
        return {
            (r.doc_id, r.lang, r.seq_id, r.shard)
            for r in spark.read.parquet(f"{root}/corpus/shards")
            .select("doc_id", "lang", "seq_id", "shard")
            .collect()
        }

    assert snapshot(r1) == snapshot(r2)


def test_quality_filter_drops_worst_decile_only(spark, sf_small, tmp_path):
    root = str(tmp_path)
    _build(spark, root, sf_small)
    before = spark.read.parquet(f"{root}/corpus/decontaminated")
    after = spark.read.parquet(f"{root}/corpus/quality")
    n_before, n_after = before.count(), after.count()
    assert n_after < n_before, "the gate must drop something on real data"
    # at most ~10% dropped (short no-bigram docs are kept, so possibly less)
    assert n_after >= 0.89 * n_before, (n_before, n_after)
    # the survivors' ids are a subset — the gate only filters
    kept = {r.doc_id for r in after.select("doc_id").collect()}
    assert kept <= {r.doc_id for r in before.select("doc_id").collect()}


def test_quality_filter_classifier_method(spark, sf_small, tmp_path):
    """The method='classifier' option must run the trained gate over
    the decontaminated corpus (one shared definition with
    q_quality_classifier), write its own stage target, and only ever
    FILTER — survivors are a subset of the input, and the dropped set
    is exactly the model's keep=false decisions."""
    from production_ready_ds_spark.pipelines.corpus_build import QualityFilter
    from production_ready_ds_spark.queries.llm import quality_classifier_scores
    from production_ready_ds_spark.workflow import build

    root = str(tmp_path)
    task = QualityFilter(data_root=root, sf_dir=sf_small, method="classifier")
    build([task])
    before = spark.read.parquet(f"{root}/corpus/decontaminated")
    after = spark.read.parquet(f"{root}/corpus/quality-classifier")
    kept = {r.doc_id for r in after.select("doc_id").collect()}
    src = {r.doc_id for r in before.select("doc_id").collect()}
    assert kept <= src
    want = {
        r.doc_id: r.keep for r in quality_classifier_scores(before).collect()
    }
    assert kept == {d for d, k in want.items() if k}


def test_quality_filter_readability_method(spark, sf_small, tmp_path):
    """The method='readability' option must drop exactly the
    'difficult'-band docs (one shared definition with
    q_quality_readability) and write its own stage target."""
    from production_ready_ds_spark.pipelines.corpus_build import QualityFilter
    from production_ready_ds_spark.queries.llm import readability_scores
    from production_ready_ds_spark.workflow import build

    root = str(tmp_path)
    build([QualityFilter(data_root=root, sf_dir=sf_small, method="readability")])
    before = spark.read.parquet(f"{root}/corpus/decontaminated")
    after = spark.read.parquet(f"{root}/corpus/quality-readability")
    kept = {r.doc_id for r in after.select("doc_id").collect()}
    src = {r.doc_id for r in before.select("doc_id").collect()}
    assert kept <= src
    hard = {
        r.doc_id
        for r in readability_scores(before).filter("band = 'difficult'").collect()
    }
    assert kept == src - hard
