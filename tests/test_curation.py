"""End-to-end LLM curation pipeline: funnel invariants + incremental
(Luigi-style) recomputation semantics."""

from __future__ import annotations

import json
import os

from production_ready_ds_spark.pipelines.curation import (
    CurationReport,
    DedupExact,
    DedupNear,
    FilterQuality,
    ScoreDocuments,
    curation_dag,
)
from production_ready_ds_spark.workflow import build


def _counts(spark, root):
    out = {}
    for stage in ("scored", "filtered", "dedup_exact", "dedup_near"):
        out[stage] = spark.read.parquet(os.path.join(root, "curation", stage)).count()
    return out


def test_curation_funnel(spark, sf_small, tmp_path):
    root = str(tmp_path)
    res = build([curation_dag(root, sf_small)])
    assert len(res["ran"]) == 5 and not res["blocked"]

    c = _counts(spark, root)
    # monotone funnel: each stage can only remove documents
    assert c["scored"] >= c["filtered"] >= c["dedup_exact"] >= c["dedup_near"] > 0

    # exact-dedup stage leaves no duplicate content
    dx = spark.read.parquet(os.path.join(root, "curation", "dedup_exact"))
    assert dx.count() == dx.select("text").distinct().count()

    report = json.load(open(os.path.join(root, "curation", "report.json")))
    assert report["n_docs"] == c["dedup_near"]
    assert report["n_tokens"] > 0
    assert set(report["per_lang"]) <= {"en", "de", "es", "fr"}


def test_curation_incremental_resume(spark, sf_small, tmp_path):
    root = str(tmp_path)
    build([curation_dag(root, sf_small)])

    # full rerun: everything is complete, nothing executes
    res2 = build([curation_dag(root, sf_small)])
    assert res2["ran"] == [] and len(res2["skipped"]) == 5

    # drop one mid-stage target -> only the suffix recomputes
    near = DedupNear(data_root=root, sf_dir=sf_small)
    near.output().remove()
    CurationReport(data_root=root, sf_dir=sf_small).output().remove()
    res3 = build([curation_dag(root, sf_small)])
    ran = {t.split("(")[0] for t in res3["ran"]}
    assert ran == {"DedupNear", "CurationReport"}
    assert {t.split("(")[0] for t in res3["skipped"]} == {
        "ScoreDocuments",
        "FilterQuality",
        "DedupExact",
    }


def test_curation_clean_markup_equals_clean_corpus(spark, sf_small, tmp_path):
    """A markup-wrapped corpus run with clean_markup=True must score
    IDENTICALLY to the clean corpus run without it — the strip
    composes as a transparent first step of the funnel (and without
    the flag, markup visibly poisons the signals)."""
    import os

    from pyspark.sql import functions as F

    from production_ready_ds_spark.tables import load

    # wrap every document in an HTML shell (script payload included —
    # the content a naive strip would leak into the quality gates)
    wrapped_dir = str(tmp_path / "wrapped")
    os.makedirs(wrapped_dir)
    load(spark, sf_small, "documents").withColumn(
        "text",
        F.concat(
            F.lit("<html><body><p>"),
            F.col("text"),
            F.lit('</p><script>var x = "<i>spam</i>";</script></body></html>'),
        ),
    ).write.parquet(os.path.join(wrapped_dir, "documents.parquet"))

    clean_root, wrapped_root = str(tmp_path / "a"), str(tmp_path / "b")
    build([ScoreDocuments(data_root=clean_root, sf_dir=sf_small)])
    build(
        [
            ScoreDocuments(
                data_root=wrapped_root, sf_dir=wrapped_dir, clean_markup=True
            )
        ]
    )
    cols = ["doc_id", "text", "quality", "pred_lang", "n_bpe_tokens"]
    a = sorted(
        spark.read.parquet(os.path.join(clean_root, "curation", "scored"))
        .select(*cols).collect()
    )
    b = sorted(
        spark.read.parquet(os.path.join(wrapped_root, "curation", "scored+markup"))
        .select(*cols).collect()
    )
    assert a == b
    # control: without the flag the wrapped corpus scores differently
    control_root = str(tmp_path / "c")
    build([ScoreDocuments(data_root=control_root, sf_dir=wrapped_dir)])
    c = sorted(
        spark.read.parquet(os.path.join(control_root, "curation", "scored"))
        .select(*cols).collect()
    )
    assert c != a


def test_curation_redact_pii_scrubs_before_scoring(spark, sf_small, tmp_path):
    """redact_pii=True must remove every email/URL/IP/phone from the
    scored text (downstream stages never see raw PII), composing
    after the markup strip in the same map pass."""
    import os

    from pyspark.sql import functions as F

    from production_ready_ds_spark.tables import load

    dirty_dir = str(tmp_path / "dirty")
    os.makedirs(dirty_dir)
    load(spark, sf_small, "documents").withColumn(
        "text",
        F.concat(
            F.lit("<p>"),
            F.col("text"),
            F.lit("</p> mail bob@leak.example.com see https://leak.example.com/x"),
        ),
    ).write.parquet(os.path.join(dirty_dir, "documents.parquet"))

    root = str(tmp_path / "out")
    build(
        [
            ScoreDocuments(
                data_root=root, sf_dir=dirty_dir,
                clean_markup=True, redact_pii=True,
            )
        ]
    )
    scored = spark.read.parquet(
        os.path.join(root, "curation", "scored+markup+pii")
    )
    leaked = scored.filter(
        F.col("text").contains("leak.example.com")
    ).count()
    assert leaked == 0
    masked = scored.filter(
        F.col("text").contains("<EMAIL>") & F.col("text").contains("<URL>")
    ).count()
    assert masked == scored.count()
    # markup stripped too: no tags survive into the scored text
    assert scored.filter(F.col("text").contains("<p>")).count() == 0


def test_curation_flag_flip_recomputes_not_reuses(spark, sf_small, tmp_path):
    """Toggling a text-mutating flag against an existing data_root
    must RUN the stage again (flag is part of the target identity),
    never reuse the raw-text output — the silent-stale privacy bug."""
    root = str(tmp_path)
    build([ScoreDocuments(data_root=root, sf_dir=sf_small)])
    res = build(
        [ScoreDocuments(data_root=root, sf_dir=sf_small, redact_pii=True)]
    )
    assert len(res["ran"]) == 1, res
    import os

    assert os.path.isdir(os.path.join(root, "curation", "scored"))
    assert os.path.isdir(os.path.join(root, "curation", "scored+pii"))


def test_curation_normalize_unicode_composes_between_markup_and_pii(
    spark, sf_small, tmp_path
):
    """normalize_unicode=True must compose AFTER the markup strip
    (&nbsp; decodes to the NBSP character, which the space pass then
    folds) and BEFORE PII (the decomposed accent around the email must
    not block redaction context), with its own target-identity
    suffix."""
    import os

    from pyspark.sql import functions as F

    from production_ready_ds_spark.tables import load

    dirty_dir = str(tmp_path / "dirty")
    os.makedirs(dirty_dir)
    load(spark, sf_small, "documents").withColumn(
        "text",
        F.concat(
            F.lit("<p>Café&nbsp;menu</p> mail bob@leak.example.com "),
            F.col("text"),
        ),
    ).write.parquet(os.path.join(dirty_dir, "documents.parquet"))

    root = str(tmp_path / "out")
    build(
        [
            ScoreDocuments(
                data_root=root, sf_dir=dirty_dir,
                clean_markup=True, normalize_unicode=True, redact_pii=True,
            )
        ]
    )
    scored = spark.read.parquet(
        os.path.join(root, "curation", "scored+markup+uni+pii")
    )
    n = scored.count()
    # NFC composed the accent; the entity-decoded NBSP folded to a
    # plain space; PII still redacted after both
    assert scored.filter(F.col("text").contains("Café menu")).count() == n
    assert scored.filter(F.col("text").contains("Café")).count() == 0
    assert scored.filter(F.col("text").contains(" ")).count() == 0
    assert scored.filter(F.col("text").contains("leak.example.com")).count() == 0
    assert scored.filter(F.col("text").contains("<EMAIL>")).count() == n


def test_dedup_near_keep_best_keeps_longest_member(spark, tmp_path):
    """DedupNear(keep_best=True) keeps the most complete family member
    (the q_dedup_keep_best rule) where the default keeps min-id — and
    the two variants write DISTINCT targets (the flag is part of the
    stage identity, so toggling it can never reuse the other's
    output)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from production_ready_ds_spark.pipelines.curation import DedupNear
    from production_ready_ds_spark.workflow import build

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base),
        (1, base + " today with extra words making it the longest copy"),
        (2, "totally unrelated text about catalyst optimizer rules"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    root = str(tmp_path / "out")
    kb = DedupNear(data_root=root, sf_dir=sf, min_quality=0.0, keep_best=True)
    mn = DedupNear(data_root=root, sf_dir=sf, min_quality=0.0)
    build([kb])
    build([mn])
    assert kb.output().path != mn.output().path
    kept_kb = {
        r.doc_id for r in spark.read.parquet(kb.output().path).collect()
    }
    kept_mn = {
        r.doc_id for r in spark.read.parquet(mn.output().path).collect()
    }
    assert kept_kb == {1, 2}, kept_kb  # longest family member wins
    assert kept_mn == {0, 2}, kept_mn  # min-id default unchanged
