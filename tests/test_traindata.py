"""Semantic tests for the training-data assembly queries
(queries/traindata.py) beyond the parameterized oracle gate: packing
conservation laws, sampler determinism, and decontamination behavior on
a constructed corpus with a known leak."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.queries.traindata import (
    PROBE_MOD,
    SEQ_BUDGET,
    q_decontaminate,
    q_mix_domains,
    q_pack_sequences,
)
from production_ready_ds_spark.functions.text import tokens_expr
from production_ready_ds_spark.tables import load


def test_pack_sequences_conserves_docs_and_tokens(spark, sf_small):
    docs = load(spark, sf_small, "documents")
    total_docs = docs.count()
    total_tokens = docs.select(
        F.sum(F.size(tokens_expr(F.col("text")))).alias("t")
    ).collect()[0]["t"]

    packed = q_pack_sequences(spark, sf_small)
    agg = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("seq_tokens").alias("tokens")
    ).collect()[0]
    assert agg["docs"] == total_docs
    assert agg["tokens"] == total_tokens


def test_pack_sequences_ids_contiguous_per_shard(spark, sf_small):
    packed = q_pack_sequences(spark, sf_small)
    per_shard = packed.groupBy("lang").agg(
        F.min("seq_id").alias("lo"),
        F.max("seq_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    for row in per_shard.collect():
        # concat-and-chunk by start offset never skips a chunk: ids are
        # exactly 0..hi with one row each.
        assert row["lo"] == 0
        assert row["n"] == row["hi"] + 1


def test_pack_sequences_fill(spark, sf_small):
    """Every sequence except the shard's last must span at least the
    budget when its own doc tokens are counted from its start offset —
    equivalently, a new sequence only starts once the running total
    crosses the budget boundary, so seq_tokens ≥ budget - (max doc len)
    is too weak; assert the precise property: cumulative tokens of all
    sequences before the last exceed seq_id * budget."""
    packed = q_pack_sequences(spark, sf_small).orderBy("lang", "seq_id").collect()
    by_lang: dict[str, list] = {}
    for r in packed:
        by_lang.setdefault(r["lang"], []).append(r)
    for rows in by_lang.values():
        cum = 0
        for r in rows[:-1]:
            cum += r["seq_tokens"]
            # the next sequence exists, so the running total must have
            # crossed into its chunk: cum > (seq_id+1) * budget - budget
            assert cum > (r["seq_id"] + 1) * SEQ_BUDGET - SEQ_BUDGET


def test_mix_domains_deterministic_and_weighted(spark, sf_small):
    a = {r["lang"]: r.asDict() for r in q_mix_domains(spark, sf_small).collect()}
    b = {r["lang"]: r.asDict() for r in q_mix_domains(spark, sf_small).collect()}
    assert a == b  # pure function of the data, no RNG state
    for lang, row in a.items():
        assert 0 <= row["n_kept"] <= row["n_total"]
        if lang not in ("en", "zh"):
            assert row["n_kept"] == row["n_total"]  # weight 1.0 → kept whole
    # en is downsampled to ~50 % — binomial bounds generous enough for
    # the small sf but strict enough to catch an inverted comparison.
    en = a["en"]
    assert 0.2 * en["n_total"] <= en["n_kept"] <= 0.8 * en["n_total"]


def test_decontaminate_excludes_probe_docs(spark, sf_small):
    got = q_decontaminate(spark, sf_small)
    assert got.filter(F.pmod(F.col("doc_id"), F.lit(PROBE_MOD)) == 0).count() == 0
    bad = got.filter(
        (F.col("contamination") < 0)
        | (F.col("contamination") > 1)
        | (F.col("n_overlap") > F.col("n_shingles"))
    )
    assert bad.count() == 0


def test_decontaminate_flags_exact_leak(spark, tmp_path):
    """A corpus doc that IS a benchmark doc verbatim must score
    contamination 1.0; an unrelated doc must score 0.0."""
    leak_text = "the quick brown fox jumps over the lazy dog tonight"
    clean_text = "completely unrelated words about spark shuffle partitions"
    rows = [
        (PROBE_MOD, leak_text, "en", "src0", len(leak_text)),  # probe doc
        (1, leak_text, "en", "src0", len(leak_text)),  # verbatim leak
        (2, clean_text, "en", "src0", len(clean_text)),  # clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "docs")
    df.write.parquet(out + "/documents.parquet")
    got = {r["doc_id"]: r["contamination"] for r in q_decontaminate(spark, str(tmp_path / "docs")).collect()}
    assert got[1] == 1.0
    assert got[2] == 0.0


def test_stem_tokens_merges_inflected_forms(spark, tmp_path):
    rows = [
        (1, "running runs ran runner", "en", "src0", 24),
        (2, "the runner was running", "en", "src0", 22),
        (3, "corriendo corre", "es", "src0", 15),  # non-en: excluded
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "docs_stem")
    df.write.parquet(out + "/documents.parquet")

    from production_ready_ds_spark.queries.traindata import q_stem_tokens

    got = {r["stem"]: r["n"] for r in q_stem_tokens(spark, out).collect()}
    # running/runs merge under Snowball ('run'); runner stems to 'runner'
    assert got["run"] == 3
    assert got["runner"] == 2
    assert "corriendo" not in got  # lang filter applied
