"""LLM training-data curation pipeline: the north-star extension ops
composed into one incremental DAG over ``documents``:

    ScoreDocuments → FilterQuality → DedupExact → DedupNear → CurationReport

Each stage is a :class:`SparkTask` materializing a ParquetTarget, so the
funnel is incremental and idempotent exactly like the reference's DAGs
(O1/O2 semantics, reference 00_training_pipeline.py:26-27,65-66): rerun
resumes after the last completed stage; delete one stage's output and
only the suffix recomputes.

Every transform is a pure DataFrame program over the same column
expressions the declared queries use (q_quality_score / q_lang_id /
q_dedup_exact / q_dedup_ngram_jaccard), so the pipeline inherits their
oracle-checked semantics and their 100 TB shapes (linear scans, hash
aggs on uniform keys, shingle-blocked pair join — never O(n²)).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ..functions.text import stopword_ratio, tokens_expr
from ..tables import load
from ..workflow import LocalTarget, Parameter, ParquetTarget, SparkTask


def _variant(clean_markup, normalize_unicode, redact_pii) -> str:
    """Stage-identity suffix for the TEXT-MUTATING flags: a target
    produced from raw text must never satisfy a cleaned run's
    completeness check — without this, toggling clean_markup/
    normalize_unicode/redact_pii against an existing data_root
    silently reuses stale uncleaned output (a privacy bug: the
    "redacted" report would ship raw PII). Numeric knobs
    (min_quality, jaccard_threshold) deliberately stay OUT of the
    path — they tune the funnel rather than change what the text IS;
    callers sweeping them use distinct data_roots (documented
    contract)."""
    return (
        ("+markup" if clean_markup else "")
        + ("+uni" if normalize_unicode else "")
        + ("+pii" if redact_pii else "")
    )


def _stage_dir(root: str, stage: str) -> str:
    return os.path.join(root, "curation", stage)


class ScoreDocuments(SparkTask):
    """Annotate every document with the curation signals: quality score
    (length saturation × (1−stopword ratio)), marker-word language id,
    and BPE-ish token count. One linear scan, no shuffle.

    ``clean_markup=True`` prepends the HTML→text strip
    (functions/markup.py, the q_clean_markup kernel) so a web-scraped
    corpus and an API-clean one run the same downstream funnel;
    ``redact_pii=True`` then applies the text-level PII pass
    (functions/pii.py, the q_pii_redact kernel) — both are extra
    regexp links in the SAME map pass (strip FIRST: tags/entities
    would otherwise split PII spans), and every later stage (gates,
    dedup, report) consumes the cleaned, redacted text."""

    data_root = Parameter()
    sf_dir = Parameter()
    clean_markup = Parameter(default=False)
    normalize_unicode = Parameter(default=False)
    redact_pii = Parameter(default=False)

    def output(self):
        return ParquetTarget(_stage_dir(
            self.data_root,
            "scored" + _variant(self.clean_markup, self.normalize_unicode, self.redact_pii),
        ))

    def main(self, spark):
        from ..queries.llm import _LANG_MARKERS

        d = load(spark, self.sf_dir, "documents")
        if self.clean_markup:
            from ..functions.markup import strip_markup

            d = d.withColumn("text", strip_markup(F.col("text")))
        if self.normalize_unicode:
            from ..functions.unicode_norm import normalize_unicode as _norm

            # AFTER markup (entity decode can emit NBSP — &nbsp; must
            # already be a character before the space-variant pass),
            # BEFORE PII (composed text matches the PII patterns the
            # way decomposed text does not)
            d = d.withColumn("text", _norm(F.col("text")))
        if self.redact_pii:
            from ..functions.pii import redact_pii as _redact

            d = d.withColumn("text", _redact(F.col("text"))[0])
        toks = tokens_expr(F.col("text"))
        n = F.size(toks)
        quality = F.least(n / F.lit(100.0), F.lit(1.0)) * (
            F.lit(1.0) - stopword_ratio(toks)
        )
        distinct_toks = F.array_distinct(toks)
        scores = {
            lang: F.size(F.array_intersect(distinct_toks, F.array(*[F.lit(w) for w in words])))
            for lang, words in _LANG_MARKERS.items()
        }
        pred = (
            F.when(
                (scores["en"] >= scores["de"])
                & (scores["en"] >= scores["es"])
                & (scores["en"] >= scores["fr"]),
                "en",
            )
            .when((scores["de"] >= scores["es"]) & (scores["de"] >= scores["fr"]), "de")
            .when(scores["es"] >= scores["fr"], "es")
            .otherwise("fr")
        )
        bpe = F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        )
        d.select(
            "doc_id",
            "text",
            "lang",
            "source",
            F.round(quality, 4).alias("quality"),
            pred.alias("pred_lang"),
            bpe.cast("long").alias("n_bpe_tokens"),
        ).write.mode("overwrite").parquet(self.output().path)


class FilterQuality(SparkTask):
    """Quality gate: drop documents below ``min_quality``. A pushed-down
    predicate on the scored table — the cheap filter always runs before
    the expensive dedup stages."""

    data_root = Parameter()
    sf_dir = Parameter()
    min_quality = Parameter(default=0.1)
    clean_markup = Parameter(default=False)
    normalize_unicode = Parameter(default=False)
    redact_pii = Parameter(default=False)

    def requires(self):
        return ScoreDocuments(
            data_root=self.data_root,
            sf_dir=self.sf_dir,
            clean_markup=self.clean_markup,
            normalize_unicode=self.normalize_unicode,
            redact_pii=self.redact_pii,
        )

    def output(self):
        return ParquetTarget(_stage_dir(
            self.data_root,
            "filtered" + _variant(self.clean_markup, self.normalize_unicode, self.redact_pii),
        ))

    def main(self, spark):
        scored = spark.read.parquet(self.requires().output().path)
        scored.filter(F.col("quality") >= float(self.min_quality)).write.mode(
            "overwrite"
        ).parquet(self.output().path)


class DedupExact(SparkTask):
    """Exact dedup: keep the min doc_id per content hash (q_dedup_exact
    shape — one hash-groupBy on a uniform 16-byte key)."""

    data_root = Parameter()
    sf_dir = Parameter()
    min_quality = Parameter(default=0.1)
    clean_markup = Parameter(default=False)
    normalize_unicode = Parameter(default=False)
    redact_pii = Parameter(default=False)

    def requires(self):
        return FilterQuality(
            data_root=self.data_root,
            sf_dir=self.sf_dir,
            min_quality=self.min_quality,
            clean_markup=self.clean_markup,
            normalize_unicode=self.normalize_unicode,
            redact_pii=self.redact_pii,
        )

    def output(self):
        return ParquetTarget(_stage_dir(
            self.data_root,
            "dedup_exact" + _variant(self.clean_markup, self.normalize_unicode, self.redact_pii),
        ))

    def main(self, spark):
        docs = spark.read.parquet(self.requires().output().path)
        keep = (
            docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        docs.join(keep, "doc_id", "left_semi").write.mode("overwrite").parquet(
            self.output().path
        )


class DedupNear(SparkTask):
    """Near-dup removal with transitive cluster resolution: 3-gram
    Jaccard pairs (hash-blocked, hot-shingle-capped self join —
    operators/dedup.py jaccard_pairs) → connected components → keep ONE
    canonical doc per duplicate cluster. Per-pair keep-lowest would
    mishandle chains: A~B and B~C could retain both B and C; label
    propagation resolves {A,B,C} to a single keeper.

    ``keep_best`` selects the canonical by QUALITY (max current text
    length, ties to lowest doc_id — the q_dedup_keep_best rule:
    min-id canonicals
    systematically prefer whichever copy was crawled first, often a
    truncated mirror) instead of the default min doc_id. It changes
    WHICH text survives, so like the text-mutating flags it is part of
    the target's identity suffix."""

    data_root = Parameter()
    sf_dir = Parameter()
    min_quality = Parameter(default=0.1)
    jaccard_threshold = Parameter(default=0.5)
    clean_markup = Parameter(default=False)
    normalize_unicode = Parameter(default=False)
    redact_pii = Parameter(default=False)
    keep_best = Parameter(default=False)

    def requires(self):
        return DedupExact(
            data_root=self.data_root,
            sf_dir=self.sf_dir,
            min_quality=self.min_quality,
            clean_markup=self.clean_markup,
            normalize_unicode=self.normalize_unicode,
            redact_pii=self.redact_pii,
        )

    def output(self):
        return ParquetTarget(_stage_dir(
            self.data_root,
            "dedup_near"
            + _variant(self.clean_markup, self.normalize_unicode, self.redact_pii)
            + ("_kb" if self.keep_best else ""),
        ))

    def main(self, spark):
        from pyspark.sql import Window

        from ..operators.dedup import connected_components, jaccard_pairs

        docs = spark.read.parquet(self.requires().output().path)
        pairs = jaccard_pairs(docs, threshold=float(self.jaccard_threshold))
        clusters = connected_components(pairs)
        if self.keep_best:
            # the q_dedup_keep_best winner rule: within each cluster
            # keep the most complete member (max n_chars, ties to the
            # lowest doc_id); one window over the clustered-members
            # frame + the drop anti-join
            # quality key computed from the CURRENT text (upstream
            # cleaning stages rewrite the schema — n_chars from the
            # raw table may be absent or stale here)
            members = clusters.select(
                F.col("node").alias("doc_id"), "cluster_id"
            ).join(
                docs.select("doc_id", F.length("text").alias("_len")), "doc_id"
            )
            w = Window.partitionBy("cluster_id").orderBy(
                F.desc("_len"), F.asc("doc_id")
            )
            drop = (
                members.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") > 1)
                .select("doc_id")
            )
        else:
            # every clustered doc that is NOT its component's minimum
            drop = clusters.filter(F.col("node") != F.col("cluster_id")).select(
                F.col("node").alias("doc_id")
            )
        docs.join(drop, "doc_id", "left_anti").write.mode("overwrite").parquet(
            self.output().path
        )


class CurationReport(SparkTask):
    """Funnel summary: surviving docs + token budget per predicted
    language, written as a small JSON (driver-side only for the ~k-row
    final aggregate — never the data path)."""

    data_root = Parameter()
    sf_dir = Parameter()
    min_quality = Parameter(default=0.1)
    jaccard_threshold = Parameter(default=0.5)
    clean_markup = Parameter(default=False)
    normalize_unicode = Parameter(default=False)
    redact_pii = Parameter(default=False)

    def requires(self):
        return DedupNear(
            data_root=self.data_root,
            sf_dir=self.sf_dir,
            min_quality=self.min_quality,
            jaccard_threshold=self.jaccard_threshold,
            clean_markup=self.clean_markup,
            normalize_unicode=self.normalize_unicode,
            redact_pii=self.redact_pii,
        )

    def output(self):
        v = _variant(self.clean_markup, self.normalize_unicode, self.redact_pii)
        return LocalTarget(
            os.path.join(self.data_root, "curation", f"report{v}.json")
        )

    def main(self, spark):
        final = spark.read.parquet(self.requires().output().path)
        per_lang = (
            final.groupBy("pred_lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_bpe_tokens").alias("n_tokens"),
            )
            .orderBy("pred_lang")
            .collect()
        )
        report = {
            "n_docs": int(sum(r.n_docs for r in per_lang)),
            "n_tokens": int(sum(r.n_tokens for r in per_lang)),
            "per_lang": {r.pred_lang: {"docs": int(r.n_docs), "tokens": int(r.n_tokens)} for r in per_lang},
        }
        with self.output().open("w") as f:
            json.dump(report, f, indent=2, sort_keys=True)


def curation_dag(data_root: str, sf_dir: str, *, min_quality: float = 0.1,
                 jaccard_threshold: float = 0.5,
                 clean_markup: bool = False,
                 normalize_unicode: bool = False,
                 redact_pii: bool = False) -> CurationReport:
    """The full curation DAG rooted at its report task."""
    return CurationReport(
        data_root=data_root,
        sf_dir=sf_dir,
        min_quality=min_quality,
        jaccard_threshold=jaccard_threshold,
        clean_markup=clean_markup,
        normalize_unicode=normalize_unicode,
        redact_pii=redact_pii,
    )
