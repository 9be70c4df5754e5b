"""Training-data assembly operators: sequence packing, deterministic
mixture sampling, and benchmark decontamination.

These are the steps BETWEEN curation (dedup/quality, queries/llm.py)
and the training job: decide the domain mixture, drop documents that
leak evaluation benchmarks, and pack the survivors into fixed-size
training sequences. The reference stops at per-day CSVs of classified
posts (reference `01_classification_pipeline.py:203-207`); a 100 TB
training pipeline needs exactly these three more moves, so they are
first-class catalog queries with DuckDB oracles.

Shared scale theme: every query is one shuffle (or none) — packing
shuffles once on the shard key, mixing is a map-only scan, and
decontamination streams the corpus map-side against the benchmark
shingle set (broadcast join when the probe set fits, Bloom-bitmap
prefilter + survivor-only verify join when it does not — see
q_decontaminate_bloom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..operators.dedup import shingled_docs
from ..tables import load
from . import query
from .llm import _DUCK_SHINGLES, _DUCK_TOKENS

SEQ_BUDGET = 512  # tokens per packed training sequence
PROBE_MOD = 20  # doc_id % PROBE_MOD == 0 → held-out benchmark stand-in


@query(
    "q_pack_sequences",
    category="llm-traindata",
    sql=f"""
    WITH t AS (
      SELECT lang, doc_id, len({_DUCK_TOKENS}) AS n FROM documents
    ),
    c AS (
      SELECT lang, doc_id, n,
             SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT lang,
           CAST(FLOOR((cum - n) * 1.0 / {SEQ_BUDGET}) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS seq_tokens
    FROM c GROUP BY lang, seq_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concat-and-chunk documents into fixed
    {SEQ_BUDGET}-token training sequences, the standard LLM data-loader
    move (docs are concatenated in stable doc_id order and a doc belongs
    to the sequence its first token falls in).

    Packing is per-shard (here the ``lang`` column stands in for the
    shard key): each shard packs independently, so the plan is ONE
    shuffle on the shard key + a per-partition sort — no global
    ordering. At 100 TB you shard by ``pmod(xxhash64(doc_id), N)`` with
    N sized to executors and the same window runs unchanged; parallelism
    scales with N while every sequence stays deterministic."""
    d = load(spark, sf_dir, "documents")
    t = d.select("lang", "doc_id", F.size(tokens_expr(F.col("text"))).alias("n"))
    return (
        pack_assignments(t)
        .groupBy("lang", "seq_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").cast("long").alias("seq_tokens"))
    )


# The ONE Harmonic size-class rule, shared (Python + SQL fragment) by
# q_pack_bestfit and q_pack_bestfit_assign so the capacity report and
# the bin membership can never drift. Docs >= the budget fold into
# class 1 as SINGLETON shelves — whole-doc packing cannot make an
# oversized doc fit, so those shelves inherently exceed the budget
# (split upstream via q_pack_sequences/q_chunk_documents, or
# truncate); every shelf of docs that individually fit can NOT
# overflow (k docs of class k each have n <= budget/k).
_SIZE_CLASS_SQL = f"""CASE WHEN n <= 0 THEN {SEQ_BUDGET}
                  WHEN n >= {SEQ_BUDGET} THEN 1
                  ELSE CAST(FLOOR({SEQ_BUDGET} * 1.0 / n) AS BIGINT) END"""


def size_class_expr(n_col: str = "n"):
    """Harmonic size class of a token-count column (see the comment on
    _SIZE_CLASS_SQL — this is its Spark twin)."""
    return (
        F.when(F.col(n_col) <= 0, F.lit(SEQ_BUDGET))
        .when(F.col(n_col) >= SEQ_BUDGET, F.lit(1))
        .otherwise(F.floor(F.lit(SEQ_BUDGET) / F.col(n_col)))
        .cast("long")
    )


@query(
    "q_pack_bestfit",
    category="llm-traindata",
    bench=True,
    sql=f"""
    WITH t AS (
      SELECT lang, doc_id, len({_DUCK_TOKENS}) AS n FROM documents
    ),
    cls AS (
      SELECT lang, n, {_SIZE_CLASS_SQL} AS size_class
      FROM t
    ),
    grp AS (
      SELECT lang, size_class, COUNT(*) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS class_tokens,
             CAST(CEIL(COUNT(*) * 1.0 / size_class) AS BIGINT) AS n_bins
      FROM cls GROUP BY lang, size_class
    )
    SELECT lang, size_class, n_docs, class_tokens, n_bins,
           CAST(FLOOR(class_tokens * 1000.0 / (n_bins * {SEQ_BUDGET}) + 0.5)
                AS BIGINT) AS fill_permille,
           CAST(SUM(n_bins) OVER (PARTITION BY lang) AS BIGINT) AS lang_bins,
           CAST(CEIL(SUM(class_tokens) OVER (PARTITION BY lang)
                     * 1.0 / {SEQ_BUDGET}) AS BIGINT) AS concat_bins
    FROM grp
    """,
)
def q_pack_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-straddle sequence packing via Harmonic size-class shelves
    (Lee & Lee, JACM 1985): q_pack_sequences splits documents across
    sequence boundaries (fine when training on a flat token stream);
    when documents must stay WHOLE, packing becomes bin packing, and
    the classic sequential first-fit/best-fit-decreasing scan cannot
    run distributed — bin state would thread through every row. The
    Harmonic scheme removes the sequential dependency with a
    closed-form rule: a doc of n tokens gets size class
    k = floor(budget / n) (empty docs fold into the smallest class),
    and within (lang, class) the docs fill shelves of EXACTLY k docs —
    k · n ≤ k · budget/k = budget, so no shelf of documents that
    INDIVIDUALLY fit the budget can overflow, with no scan and no
    driver state. Documents ≥ the budget land in singleton class-1
    shelves that inherently exceed it — whole-doc packing cannot make
    an oversized doc fit; split upstream (q_pack_sequences /
    q_chunk_documents) or truncate, and a class-1 fill_permille above
    1000 is exactly that signal. Per (lang, class) the bin count is
    just ceil(count / k): the whole packing collapses to ONE hash
    aggregate — cheaper than the running-sum window q_pack_sequences
    needs. Guarantee: every non-final shelf of class k is
    > budget·k/(k+1) full (each doc exceeds budget/(k+1)), so waste is
    bounded per class; the output's fill_permille exposes the realized
    fill, and lang_bins vs concat_bins is the price of whole-doc
    packing against the straddling concat baseline (the information a
    data-loader owner needs to choose between the two).
    At 100 TB: map-side class assignment, one map-side-combinable
    aggregate on (lang, class) — a few thousand groups — then window
    totals over those few thousand rows; nothing corpus-sized
    shuffles. Bin MEMBERSHIP, when needed downstream, is the same
    row_number-over-(lang, class) window as pack_assignments, bin =
    floor(rank / k)."""
    d = load(spark, sf_dir, "documents")
    t = d.select("lang", F.size(tokens_expr(F.col("text"))).alias("n"))
    grp = (
        t.withColumn("size_class", size_class_expr())
        .groupBy("lang", "size_class")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("class_tokens"),
            F.ceil(F.count(F.lit(1)) / F.col("size_class")).cast("long").alias("n_bins"),
        )
    )
    wl = Window.partitionBy("lang")
    return grp.select(
        "lang",
        "size_class",
        "n_docs",
        "class_tokens",
        "n_bins",
        F.floor(
            F.col("class_tokens") * 1000.0 / (F.col("n_bins") * SEQ_BUDGET) + 0.5
        ).cast("long").alias("fill_permille"),
        F.sum("n_bins").over(wl).alias("lang_bins"),
        F.ceil(F.sum("class_tokens").over(wl) / F.lit(SEQ_BUDGET))
        .cast("long")
        .alias("concat_bins"),
    )


@query(
    "q_pack_bestfit_assign",
    category="llm-traindata",
    sql=f"""
    WITH t AS (
      SELECT lang, doc_id, len({_DUCK_TOKENS}) AS n FROM documents
    ),
    cls AS (
      SELECT lang, doc_id, n, {_SIZE_CLASS_SQL} AS size_class
      FROM t
    ),
    rk AS (
      SELECT lang, doc_id, n, size_class,
             ROW_NUMBER() OVER (PARTITION BY lang, size_class
                                ORDER BY doc_id) - 1 AS r
      FROM cls
    )
    SELECT lang, doc_id, size_class,
           CAST(r // size_class AS BIGINT) AS bin_id,
           CAST(n AS BIGINT) AS n_tokens
    FROM rk
    """,
)
def q_pack_bestfit_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin MEMBERSHIP for the Harmonic shelf packing — the companion
    q_pack_bestfit's docstring describes: within (lang, size_class),
    docs in stable doc_id order fill shelves of exactly k docs, so
    bin_id = floor(rank / k). This is what a data loader actually
    consumes (doc → bin), where q_pack_bestfit is the capacity report.
    The no-overflow guarantee is structural — k docs of class k each
    have n ≤ budget/k — and pinned by a per-bin token-sum test; the
    one carve-out is documents ≥ the budget themselves (singleton
    class-1 bins that inherently exceed it — see q_pack_bestfit).

    Scale shape: ONE shuffle on (lang, size_class) for the rank window
    (the q_pack_sequences discipline: shard keys make parallelism, the
    window runs per shard), map-only before and after; the row_number
    frame carries (lang, doc_id, n, k) — never text."""
    d = load(spark, sf_dir, "documents")
    t = d.select("lang", "doc_id", F.size(tokens_expr(F.col("text"))).alias("n"))
    w = Window.partitionBy("lang", "size_class").orderBy("doc_id")
    return (
        t.withColumn("size_class", size_class_expr())
        .withColumn("r", F.row_number().over(w) - 1)
        .select(
            "lang",
            "doc_id",
            "size_class",
            F.floor(F.col("r") / F.col("size_class")).cast("long").alias("bin_id"),
            F.col("n").cast("long").alias("n_tokens"),
        )
    )


# Temperature-sampling exponent: target mixture q_l ∝ p_l^alpha with
# alpha = 1/T < 1 (mT5's T ≈ 1.43..5 regime). Realized by SUBSAMPLING
# only (a keep/drop pass cannot upsample): keep rate
# r_l = (n_min / n_l)^(1-alpha), which gives the smallest language
# rate 1 and downsamples the rest toward the tempered mixture.
MIX_ALPHA = 0.7


@query(
    "q_mix_temperature",
    category="llm-traindata",
    sql=f"""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT MIN(n) AS nmin FROM c),
    r AS (
      SELECT lang, n,
             -- exponent embedded at FULL repr precision: a rounded
             -- literal (e.g. :.1f) would hand DuckDB a different
             -- double than Spark's F.lit(1 - MIX_ALPHA) and void the
             -- same-libm-input determinism argument
             CAST(FLOOR(POWER(nmin * 1.0 / n, {1 - MIX_ALPHA!r}) * 65536 + 0.5)
                  AS BIGINT) AS thresh
      FROM c, m
    ),
    d AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
               AS draw
      FROM documents
    )
    SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs, r.thresh,
           CAST(SUM(CASE WHEN d.draw < r.thresh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(FLOOR(SUM(CASE WHEN d.draw < r.thresh THEN 1 ELSE 0 END)
                      * 1000.0 / r.n + 0.5) AS BIGINT) AS kept_permille
    FROM d JOIN r ON d.lang = r.lang
    GROUP BY r.lang, r.n, r.thresh
    """,
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rebalancing (the mT5 / XLM-R
    multilingual recipe, Xue et al. 2021): q_mix_domains hard-codes
    per-language keep rates; this computes them FROM the corpus — the
    target mixture is p_l^alpha renormalized (alpha = {MIX_ALPHA}
    flattens the head), realized by deterministic subsampling with keep
    rate (n_min/n_l)^(1-alpha): the smallest language is kept whole and
    every larger one is downsampled toward the tempered mixture. The
    per-document draw is the same md5-prefix uniform as q_mix_domains
    (reproducible across runs, engines, repartitionings); the threshold
    is snapped to the 16-bit draw grid with floor(r·65536 + 0.5), so
    the ONE libm pow per language sits ~10 orders of magnitude from the
    nearest decision boundary — no per-doc float comparison anywhere.

    Output is the per-language mixture report (counts, integer
    threshold, realized keep rate); the keep DECISION for pipeline use
    is the draw < thresh predicate with thresh broadcast — a map-only
    corpus pass, the q_mix_domains scale shape plus one tiny
    count-aggregate to learn the rates. At 100 TB the rate table is
    |languages| rows: compute once, broadcast everywhere."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    m = c.agg(F.min("n").alias("nmin"))
    r = c.crossJoin(F.broadcast(m)).select(
        "lang",
        "n",
        F.floor(
            F.pow(F.col("nmin") / F.col("n"), F.lit(1 - MIX_ALPHA)) * 65536
            + F.lit(0.5)
        )
        .cast("long")
        .alias("thresh"),
    )
    draw = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
        16,
        10,
    ).cast("long")
    return (
        d.select("doc_id", "lang", draw.alias("draw"))
        .join(F.broadcast(r), "lang")
        .groupBy("lang", "n", "thresh")
        .agg(
            F.sum(F.when(F.col("draw") < F.col("thresh"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "lang",
            F.col("n").cast("long").alias("n_docs"),
            "thresh",
            "n_kept",
            F.floor(F.col("n_kept") * 1000.0 / F.col("n") + F.lit(0.5))
            .cast("long")
            .alias("kept_permille"),
        )
    )


# Per-language keep-thresholds on the first 4 hex chars of md5(doc_id):
# the doc is kept iff its hex prefix sorts below the threshold, i.e. a
# deterministic uniform draw in [0, 1) at 1/65536 granularity that both
# engines compute identically (md5 of the decimal doc_id string).
# en is downsampled to ~50 %, zh to ~80 %, the rest kept whole — the
# classic rebalancing of a web-crawl-dominant language.
_MIX_THRESHOLDS = {"en": "8000", "zh": "cccc"}


def mix_kept_expr(lang_col: str = "lang", id_col: str = "doc_id"):
    """The deterministic mixture-sampling keep decision (q_mix_domains
    semantics) as a reusable Column — the SINGLE definition both the
    catalog query and pipelines/corpus_build.py MixCorpus apply, so the
    oracle-checked draw can never diverge from the pipeline's."""
    hex4 = F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 4)
    return (
        F.when(F.col(lang_col) == "en", hex4 < _MIX_THRESHOLDS["en"])
        .when(F.col(lang_col) == "zh", hex4 < _MIX_THRESHOLDS["zh"])
        .otherwise(F.lit(True))
    )


def pack_assignments(t, *, key_col: str = "lang", id_col: str = "doc_id", n_col: str = "n"):
    """Assign each row to its packed sequence (q_pack_sequences
    semantics): per key, stable-id-order running token sum, a row
    belongs to the sequence its FIRST token falls in. Shared by the
    catalog query and pipelines/corpus_build.py PackCorpus."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum(n_col).over(w))
    seq = F.floor((F.col("cum") - F.col(n_col)) / F.lit(SEQ_BUDGET))
    return c.withColumn("seq_id", seq.cast("long")).drop("cum")


def contamination_scores(corpus_docs, probe_docs):
    """Per-corpus-doc benchmark-shingle overlap (q_decontaminate
    semantics): the probe shingle set broadcasts, the corpus streams
    map-side, one per-doc count aggregation. Shared by the catalog
    query and pipelines/corpus_build.py Decontaminate."""
    probe = (
        shingled_docs(probe_docs).select("sg").distinct().withColumn("hit", F.lit(1))
    )
    joined = shingled_docs(corpus_docs).join(F.broadcast(probe), "sg", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("hit").alias("n_overlap"),
        (F.count("hit") / F.count(F.lit(1))).alias("contamination"),
    )


@query(
    "q_mix_domains",
    category="llm-traindata",
    sql=f"""
    WITH t AS (
      SELECT lang,
             len({_DUCK_TOKENS}) AS n,
             CASE lang
               WHEN 'en' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_MIX_THRESHOLDS["en"]}'
               WHEN 'zh' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_MIX_THRESHOLDS["zh"]}'
               ELSE TRUE
             END AS kept
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE kept) AS n_kept,
           CAST(COALESCE(SUM(n) FILTER (WHERE kept), 0) AS BIGINT) AS tokens_kept
    FROM t GROUP BY lang
    """,
)
def q_mix_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: hit a target per-language mixture
    by hashing each doc id to a uniform draw and keeping it iff the draw
    clears the language's weight — no RNG state, so the sample is
    reproducible across runs, engines, and repartitioning (md5 hex
    prefix compared as a string; thresholds in _MIX_THRESHOLDS).

    Map-only linear scan (the conditional aggregate needs one shuffle of
    5 partial rows): nothing here degrades at 100 TB, and because the
    keep-decision is a pure function of (doc_id, lang), incremental runs
    re-make identical decisions — the property Luigi-style backfills
    (reference `run_pipeline.sh:6-11`) need from a sampler."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(tokens_expr(F.col("text"))).alias("n"),
        mix_kept_expr().alias("kept"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if("kept").alias("n_kept"),
        F.coalesce(F.sum(F.when(F.col("kept"), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("tokens_kept"),
    )


# Shared by q_decontaminate and q_decontaminate_bloom: the bloom stage
# is an exact-preserving prefilter (no false negatives + exact verify of
# survivors), so both queries answer to the identical exact oracle.
_DECON_SQL = f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    probe AS (SELECT DISTINCT sg FROM sh WHERE doc_id % {PROBE_MOD} = 0),
    corpus AS (SELECT doc_id, sg FROM sh WHERE doc_id % {PROBE_MOD} <> 0)
    SELECT c.doc_id,
           COUNT(*) AS n_shingles,
           COUNT(p.sg) AS n_overlap,
           ROUND(COUNT(p.sg) * 1.0 / COUNT(*), 4) AS contamination
    FROM corpus c LEFT JOIN probe p USING (sg)
    GROUP BY c.doc_id
    """


@query(
    "q_decontaminate",
    category="llm-traindata",
    bench=True,
    sql=_DECON_SQL,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction of
    its 3-gram shingles that also appear in a held-out benchmark set
    (docs with ``doc_id % {PROBE_MOD} == 0`` stand in for the eval
    suite). Downstream, docs above a contamination threshold are dropped
    before training; the full per-doc score table is emitted so the
    threshold stays a policy knob, not baked into the operator.

    Scale shape: benchmark suites are tiny next to a 100 TB corpus, so
    the distinct probe-shingle set is BROADCAST and the corpus streams
    through a map-side hash join — no shuffle of corpus shingles at all;
    the only shuffle is the per-doc count aggregation. If the probe side
    ever outgrew broadcast, the same plan degrades gracefully to a
    shuffled equi-join on the shingle hash."""
    d = load(spark, sf_dir, "documents")
    is_probe = F.pmod(F.col("doc_id"), F.lit(PROBE_MOD)) == 0
    return contamination_scores(d.filter(~is_probe), d.filter(is_probe)).select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round("contamination", 4).alias("contamination"),
    )


from ..functions.snowball_sql import snowball_stems_ctes  # noqa: E402

_STEM_TOKENS_SQL = f"""
    WITH t AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS tok
      FROM documents WHERE lang = 'en'
    ),
    counts AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok),
    sbv AS (SELECT tok FROM counts),{snowball_stems_ctes("sbv")}
    SELECT s.stem, CAST(SUM(c.cnt) AS BIGINT) AS n
    FROM counts c JOIN sb_stems s USING (tok)
    GROUP BY s.stem ORDER BY n DESC, stem LIMIT 20
    """


@query("q_stem_tokens", category="llm-text", sql=_STEM_TOKENS_SQL)
def q_stem_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 stemmed token frequencies over English documents — the
    reference's Snowball stem stage (reference
    `00_training_pipeline.py:61,88`) surfaced as a corpus-level catalog
    query. Under the FULL hash gate since round 9: the oracle replays
    the ENTIRE Porter2 algorithm in DuckDB SQL
    (functions/snowball_sql.py — consonant-y marking, R1/R2 region
    indices, all six suffix steps with their region guards and the
    ization/izer R2 collapse), GENERATED from the same constant tables
    the Python stemmer uses, per-distinct-word (vocabulary-bounded,
    the same cost shape as the Arrow-batched Spark kernel). Pinned
    exact against the Python stemmer on every corpus vocabulary plus
    a 18k-word suffix-biased fuzz corpus (tests/test_snowball.py);
    the stemmer itself is verified token-for-token against the
    reference's golden cleaned.csv artifacts
    (tests/test_reference_replay.py).

    Plan: tokenize (JVM) → ONE Arrow-batched pandas UDF stems whole
    token arrays (the only Python touchpoint — per-batch, never
    per-row) → explode → two-level hash agg → top-k. Python cost is
    linear in corpus tokens and parallel across executors; everything
    around the UDF stays in whole-stage codegen."""
    from ..functions.stemmer import stem_tokens_udf

    d = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    stem = stem_tokens_udf()
    toks = d.select(stem(tokens_expr(F.col("text"))).alias("stems"))
    return (
        toks.select(F.explode("stems").alias("stem"))
        .groupBy("stem")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("stem"))
        .limit(20)
    )


N_SHUFFLE_SHARDS = 16
SOURCE_TOKEN_BUDGET = 800


@query(
    "q_shuffle_shards",
    category="llm-traindata",
    sql=f"""
    WITH k AS (
      SELECT doc_id, md5('shuf' || CAST(doc_id AS VARCHAR)) AS skey
      FROM documents
    )
    SELECT doc_id,
           CAST((CAST(('0x' || substr(skey, 1, 8)) AS BIGINT) % {N_SHUFFLE_SHARDS}) AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY CAST(('0x' || substr(skey, 1, 8)) AS BIGINT) % {N_SHUFFLE_SHARDS}
             ORDER BY skey, doc_id) AS BIGINT) AS pos
    FROM k
    ORDER BY shard, pos
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a pseudo-random (shard, position) from a seeded md5 key — the
    "shuffle the corpus before packing epochs" step every training
    pipeline needs, with no RNG state to coordinate (reproducible
    across runs, engines, and repartitioning, like q_mix_domains).

    This IS how a 100 TB shuffle is done: shard assignment is a
    map-only hash (no global sort), and ordering is established only
    WITHIN each shard — the row_number window partitions by shard, so
    no single task ever sees more than corpus/shards rows, and writers
    emit shards independently. A global ORDER BY md5 would funnel the
    corpus through one sort range; sharded order is statistically
    identical for training purposes."""
    d = load(spark, sf_dir, "documents")
    skey = F.md5(F.concat(F.lit("shuf"), F.col("doc_id").cast("string")))
    k = d.select("doc_id", skey.alias("skey"))
    shard = (F.conv(F.substring("skey", 1, 8), 16, 10).cast("long") % N_SHUFFLE_SHARDS).cast("int")
    k = k.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        k.select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


@query(
    "q_source_token_budget",
    category="llm-traindata",
    sql=f"""
    WITH t AS (
      SELECT doc_id, source, len({_DUCK_TOKENS}) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_before AS BIGINT) AS cum_before
    FROM c
    WHERE cum_before < {SOURCE_TOKEN_BUDGET}
    ORDER BY source, doc_id
    """,
)
def q_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget enforcement: keep each source's docs (in
    id order) until the source's running token total crosses the
    budget — the quota-sampling step that stops one over-crawled feed
    from dominating the mixture (the doc that straddles the boundary is
    kept, so every source gets ≥1 doc and ≥budget tokens when it has
    them).

    Scale shape: only (doc_id, source, n_tokens) enters the running-sum
    window — narrow rows, never text — partitioned BY SOURCE. Budget
    enforcement is inherently sequential per source (each keep decision
    depends on the prior cumsum), so a giant source serializes into one
    window partition; when a single source is corpus-scale, pre-filter
    with a per-source count/limit heuristic or split the budget across
    (source, date) subkeys — the window shape stays identical."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .filter(F.col("cum_before") < SOURCE_TOKEN_BUDGET)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("cum_before").cast("long").alias("cum_before"),
        )
        .orderBy("source", "doc_id")
    )


SOURCE_QUOTA = 10  # docs kept per source in the quota sample


@query(
    "q_sample_quota",
    category="llm-traindata",
    sql=f"""
    WITH k AS (
      SELECT doc_id, source,
             md5('quota' || CAST(doc_id AS VARCHAR)) AS skey
      FROM documents
    ),
    r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey, doc_id) AS rn
      FROM k
    )
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= {SOURCE_QUOTA}
    ORDER BY source, rn
    """,
)
def q_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source quota sampling: keep exactly {SOURCE_QUOTA}
    uniformly-chosen docs per source (fewer if the source is smaller) —
    the deterministic equivalent of per-stratum reservoir sampling.
    Where q_mix_domains hits a RATE (Bernoulli, count varies) and
    q_source_token_budget fills a TOKEN budget in id order, this hits
    an exact COUNT chosen uniformly: each doc gets a seeded md5 sort
    key, and the quota is the per-source top-{SOURCE_QUOTA} in key
    order. No RNG state — the same docs are picked on every run,
    engine, and partitioning (the Luigi-backfill reproducibility
    property, reference `run_pipeline.sh:6-11`).

    Scale shape: ONE shuffle on source for the row_number window; at
    100 TB a giant source serializes its window partition, so swap the
    exact rank for a two-pass threshold: histogram the first 2 hex
    chars per source (tiny agg), pick the byte-prefix cutoff that
    brackets the quota, keep `skey < cutoff` map-side, and exact-rank
    only the boundary bucket — same answer, no full-source sort."""
    d = load(spark, sf_dir, "documents")
    skey = F.md5(F.concat(F.lit("quota"), F.col("doc_id").cast("string")).cast("binary"))
    k = d.select("doc_id", "source", skey.alias("skey"))
    w = Window.partitionBy("source").orderBy("skey", "doc_id")
    return (
        k.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= SOURCE_QUOTA)
        .select("doc_id", "source", "rn")
    )


N_CURRICULUM_STAGES = 4


@query(
    "q_curriculum_order",
    category="llm-traindata",
    sql=f"""
    WITH t AS (
      SELECT doc_id, source,
             len({_DUCK_TOKENS}) AS n_tokens,
             len(list_distinct({_DUCK_TOKENS})) AS n_distinct
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source, n_tokens,
             n_distinct * 1.0 / n_tokens AS diversity
      FROM t WHERE n_tokens > 0
    ),
    staged AS (
      SELECT source, n_tokens, diversity,
             NTILE({N_CURRICULUM_STAGES}) OVER (
               PARTITION BY source ORDER BY diversity DESC, doc_id) AS stage
      FROM scored
    )
    SELECT source, CAST(stage AS INT) AS stage, COUNT(*) AS n_docs,
           ROUND(AVG(diversity), 4) AS avg_diversity,
           CAST(SUM(n_tokens) AS BIGINT) AS stage_tokens
    FROM staged GROUP BY source, stage
    ORDER BY source, stage
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: rank each source's documents by lexical
    diversity (distinct/total tokens — an exact integer ratio, so both
    engines order identically) and cut into {N_CURRICULUM_STAGES}
    equal-depth stages, highest-diversity first — the
    "clean data early, tail data late" curriculum schedule, emitted as
    a per-(source, stage) manifest the packing step consumes.

    Scale shape: narrow rows (id, source, two ints) enter ONE window
    shuffled by source; the ntile is per-source so parallelism scales
    with sources. For a corpus-scale single source, the same two-pass
    percentile-cutoff trick as q_sample_quota replaces the global
    rank: stage boundaries from an approx-percentile sketch of the
    diversity score (broadcast), assignment map-side, exact ranking
    only at boundary neighborhoods."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    t = d.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    ).filter(F.col("n_tokens") > 0)
    scored = t.withColumn("diversity", F.col("n_distinct") / F.col("n_tokens"))
    w = Window.partitionBy("source").orderBy(F.desc("diversity"), F.asc("doc_id"))
    staged = scored.withColumn("stage", F.ntile(N_CURRICULUM_STAGES).over(w).cast("int"))
    return (
        staged.groupBy("source", "stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("diversity"), 4).alias("avg_diversity"),
            F.sum("n_tokens").cast("long").alias("stage_tokens"),
        )
        .orderBy("source", "stage")
    )


@query(
    "q_snapshot_diff",
    category="llm-traindata",
    sql="""
    WITH prev AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' legacy' ELSE text END) AS h
      FROM documents WHERE doc_id % 10 <> 3
    ),
    curr AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 13 <> 5
    )
    SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
           CASE WHEN p.doc_id IS NULL THEN 'added'
                WHEN c.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id
    WHERE p.doc_id IS NULL OR c.doc_id IS NULL OR p.h <> c.h
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: classify every document as added / removed
    / changed between two corpus versions — the audit step before
    re-running an incremental curation pipeline on a refreshed dump
    (which docs does the refresh actually touch?). Snapshots are
    derived deterministically from `documents` (the testdata has one
    corpus version): the previous snapshot drops doc_id%10==3 (those
    become 'added'), rewrites text for doc_id%7==0 ('changed'), and the
    current one drops doc_id%13==5 ('removed').

    This is the catalog's FULL OUTER join shape. 100 TB plan: each side
    reduces to (doc_id, md5) MAP-SIDE before the join, so the co-
    partitioned id shuffle moves 24-byte rows — document text never
    shuffles (same narrow-join discipline as the curation funnel), and
    the unchanged majority is filtered immediately after the join.
    MD5 hex is bit-identical across engines, so 'changed' cannot
    disagree with the oracle."""
    d = load(spark, sf_dir, "documents")
    prev = d.filter(F.col("doc_id") % 10 != 3).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" legacy"))
            )
            .otherwise(F.col("text"))
            .cast("binary")
        ).alias("h_prev"),
    )
    curr = d.filter(F.col("doc_id") % 13 != 5).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h_curr")
    )
    j = prev.join(curr, "doc_id", "full_outer")
    return (
        j.withColumn(
            "status",
            F.when(F.col("h_prev").isNull(), F.lit("added"))
            .when(F.col("h_curr").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed")),
        )
        .filter(
            F.col("h_prev").isNull()
            | F.col("h_curr").isNull()
            | (F.col("h_prev") != F.col("h_curr"))
        )
        .select("doc_id", "status")
    )


@query(
    "q_decontaminate_bloom",
    category="llm-traindata",
    sql=_DECON_SQL,
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination, Bloom-filter scale path: identical
    output to q_decontaminate, but NOTHING broadcasts the probe set.
    q_decontaminate's shape assumes the benchmark-shingle set fits in a
    broadcast; a frontier eval suite's shingle set can reach tens of GB,
    past any broadcast threshold. Here the probe set is summarized into
    a corpus-independent Bloom bitmap (operators/sketch.py; m sized to the
    counted probe-key set — an undersized bitmap saturates and lets
    ~40% of the corpus through) and the corpus takes a map-side bitmap
    test delivered as a BROADCAST one-row frame (an in-plan array
    literal re-costs codegen with m — measured 3× wall at m=2^20);
    only the
    survivors — true overlaps plus the designed ~0.1% false-positive
    trickle — reach a SHUFFLED semi join against the probe set for exact
    verification. Corpus-side shuffle volume drops from all shingles to
    ~(hits + fpp·corpus) rows, and the result stays EXACT because Bloom
    has no false negatives and the semi join removes false positives —
    which is why this query answers to the same oracle as
    q_decontaminate.

    Plan shape (pinned in tests/test_sketch.py): bitmap build = one
    map-side-combinable bit_or aggregate, bounded driver collect of
    m/32 words; per-doc totals = one partial-agg shuffle of count rows;
    candidate verify = shuffle-hash semi join (hinted — the point is the
    no-broadcast path) on the prefiltered survivors. The shingle frame
    feeds two consumers (totals pass + candidate pass), so it is
    materialized ONCE via localCheckpoint (measured 3.6× without it —
    re-shingling the corpus dwarfs everything else); at 100 TB that
    materialization is a persisted/staged shingle table, the same
    substitution the jaccard pair stage documents."""
    from ..operators.sketch import bloom_bitmap, bloom_m_for, bloom_prefilter

    from ..tables import spread

    d = load(spark, sf_dir, "documents")
    is_probe = F.pmod(F.col("doc_id"), F.lit(PROBE_MOD)) == 0
    # probe_sg feeds three consumers (count, bitmap build, verify semi
    # join) — materialize the shingle+distinct once, like the corpus side
    probe_sg = (
        shingled_docs(d.filter(is_probe)).select("sg").distinct().localCheckpoint()
    )
    bitmap = bloom_bitmap(probe_sg, "sg", m_bits=bloom_m_for(probe_sg.count()))
    # spread BEFORE the checkpoint: the single-row-group local parquet
    # would otherwise pin the 3-hash membership scan to one core (the
    # checkpointed partitioning is what both consumers inherit)
    sh = spread(shingled_docs(d.filter(~is_probe))).localCheckpoint()
    tot = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        bloom_prefilter(sh, "sg", bitmap)
        .join(probe_sg.hint("shuffle_hash"), "sg", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return tot.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        F.round(
            F.coalesce("n_overlap", F.lit(0)) / F.col("n_shingles"), 4
        ).alias("contamination"),
    )


# Per-language EPOCH factors (how many passes over each source a
# training run makes — the Llama/Gopher-style source-weighting knob
# expressed as repetition): integer part = whole copies, fractional
# part = probability of one extra copy, realized by the same
# md5-prefix 16-bit draw as the mixing family ("ep" salt so the draw
# is independent of the q_mix_domains keep draw). All thresholds are
# EXACT multiples of 65536 (.75, .5, .25), so no float ever crosses
# the oracle.
EPOCH_FACTORS = {"en": 0.75, "de": 2.5, "es": 1.25, "fr": 3.0}  # others: 1.0
_EPOCH_PARTS = {
    lang: (int(f), round((f - int(f)) * 65536))
    for lang, f in EPOCH_FACTORS.items()
}


@query(
    "q_mix_epochs",
    category="llm-traindata",
    sql=f"""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('ep' || CAST(doc_id AS VARCHAR)), 1, 4))
                  AS BIGINT) AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang,
             CASE lang
               {" ".join(
                   f"WHEN '{lang}' THEN {whole}"
                   + (f" + CASE WHEN h < {thr} THEN 1 ELSE 0 END" if thr else "")
                   for lang, (whole, thr) in _EPOCH_PARTS.items()
               )}
               ELSE 1 END AS n_copies
      FROM d
    )
    SELECT doc_id, lang, CAST(u.copy_id AS BIGINT) AS copy_id
    FROM c, UNNEST(range(n_copies)) AS u(copy_id)
    """,
)
def q_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH-based source upsampling — the third member of the mixing
    family: q_mix_domains downsamples by keep-rate, q_mix_temperature
    computes tempered rates from the corpus, and this one REPEATS
    sources (epochs > 1) the way LLM data recipes weight small
    high-quality sources — each document materializes
    floor(f) copies plus one more with probability frac(f), where f is
    its language's epoch factor. The fractional draw is the mixing
    family's deterministic md5-prefix uniform (salted 'ep' so it is
    independent of the q_mix_domains keep draw), so expected copies
    per language = f exactly, reproducible across runs, engines, and
    repartitionings; fractional thresholds are exact multiples of
    1/65536, so the oracle comparison is pure integers. Output is the
    materialized training multiset: (doc_id, lang, copy_id) with
    copy_id 0..n-1 — downstream shuffling/packing treats each copy as
    a row, exactly like a multi-epoch dataloader would.

    Scale shape: MAP-ONLY — one md5 per doc, a when-chain for the copy
    count, and a guarded sequence-explode (empty for n_copies = 0; the
    sequence-counts-DOWN trap is guarded explicitly). At 100 TB the
    explode multiplies bytes by the weighted epoch mean — the actual
    training-set size — and nothing shuffles; a pipeline that prefers
    virtual epochs keeps n_copies as a column and skips the explode."""
    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ep"), F.col("doc_id").cast("string")).cast("binary")),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    n_copies = F.lit(1)
    expr = None
    for lang, (whole, thr) in _EPOCH_PARTS.items():
        copies = F.lit(whole) + (
            F.when(h < thr, 1).otherwise(0) if thr else F.lit(0)
        )
        expr = F.when(F.col("lang") == lang, copies) if expr is None else expr.when(
            F.col("lang") == lang, copies
        )
    n_copies = expr.otherwise(F.lit(1))
    c = d.select("doc_id", "lang", n_copies.alias("n_copies"))
    copies = F.when(
        F.col("n_copies") > 0,
        F.sequence(F.lit(0), F.col("n_copies") - 1),
    ).otherwise(F.array().cast("array<int>"))
    return c.select(
        "doc_id", "lang", F.explode(copies).alias("copy_id")
    ).withColumn("copy_id", F.col("copy_id").cast("long"))
