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
