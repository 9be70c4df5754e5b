"""Estimator-quality tests for the probabilistic dedup family.

The driver's gate checks these queries rows-only (hash seeds are
engine-specific); here their STATISTICAL claims are pinned against the
exact n-gram Jaccard on the same fixed data — everything is
deterministic (fixed seeds, fixed testdata), so the bounds are tight
but stable.
"""

from __future__ import annotations

import pytest

from production_ready_ds_spark.queries import catalog


@pytest.fixture(scope="module")
def cat():
    return catalog()


@pytest.fixture(scope="module")
def exact_pairs(spark, sf_small, cat):
    """Ground truth: exact 3-gram-shingle Jaccard pairs (j >= 0.5)."""
    rows = cat["q_dedup_ngram_jaccard"].fn(spark, sf_small).collect()
    return {(r.doc_a, r.doc_b): r.jaccard for r in rows}


def test_minhash_recalls_high_jaccard_pairs(spark, sf_small, cat, exact_pairs):
    """16-hash/4-band LSH must surface nearly all true near-dup pairs
    (measured: 26/28 at sf0.001; P[band collision] ≈ 0.88 per pair at
    j=0.8, and the est>=0.5 filter removes a couple of edge pairs)."""
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in cat["q_dedup_minhash"].fn(spark, sf_small).collect()
    }
    high = {p for p, j in exact_pairs.items() if j >= 0.8}
    assert high, "fixture data must contain near-dup pairs"
    recall = sum(1 for p in high if p in est) / len(high)
    assert recall >= 0.85, f"minhash recall {recall:.2f} over {len(high)} pairs"


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_small, cat, exact_pairs):
    """Signature agreement / 16 is an unbiased Jaccard estimator with
    std ≈ sqrt(j(1-j)/16) ≈ 0.1; hold every common pair to 2σ."""
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in cat["q_dedup_minhash"].fn(spark, sf_small).collect()
    }
    common = [p for p in est if p in exact_pairs]
    assert common, "no overlap between minhash candidates and exact pairs"
    for p in common:
        assert abs(est[p] - exact_pairs[p]) <= 0.2, (p, est[p], exact_pairs[p])


def test_simhash_separates_near_dups_from_random(spark, sf_small, cat, exact_pairs):
    """Near-dup pairs must sit at small Hamming distance (measured max 6
    of 32 bits) while the corpus-wide expectation for unrelated docs is
    ~9.5 — the property that makes fingerprint bucketing work."""
    sh = {r.doc_id: r.simhash for r in cat["q_dedup_simhash"].fn(spark, sf_small).collect()}

    def ham(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    dists = [ham(sh[a], sh[b]) for (a, b) in exact_pairs]
    assert dists
    assert max(dists) <= 8, f"near-dup pair at hamming {max(dists)}"
    ids = sorted(sh)
    background = [ham(sh[ids[i]], sh[ids[-1 - i]]) for i in range(min(200, len(ids) // 2))]
    assert sum(dists) / len(dists) < sum(background) / len(background), (
        "simhash fails to separate near-dups from background"
    )


def test_stratified_sample_rates(spark, sf_small, cat):
    """Realized per-language sampling rates track the declared
    fractions (binomial 4σ bounds at the stratum sizes in testdata)."""
    from production_ready_ds_spark.tables import load

    totals = {r.lang: r.n for r in load(spark, sf_small, "documents")
              .groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    sampled = {r.lang: r.n_sampled for r in cat["q_sample_stratified"].fn(spark, sf_small).collect()}
    fractions = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25}
    for lang, frac in fractions.items():
        n = totals.get(lang, 0)
        if n < 30:
            continue
        expect = frac * n
        sigma = (n * frac * (1 - frac)) ** 0.5
        got = sampled.get(lang, 0)
        assert abs(got - expect) <= 4 * sigma, (lang, got, expect, sigma)


def test_approx_percentile_tracks_exact(spark, sf_small, cat):
    """q_percentiles_approx now carries GK's rank guarantee as oracle
    booleans; here the raw estimates (recomputed with the same
    expressions) are additionally held within 1% of the exact
    per-group percentile, and every contract boolean must be TRUE."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.tables import load

    contract = cat["q_percentiles_approx"].fn(spark, sf_small).collect()
    assert contract and all(
        r.p50_within_rank_bound and r.p95_within_rank_bound for r in contract
    )
    exact = {r.o_orderstatus: (r.p50, r.p95)
             for r in cat["q_percentiles"].fn(spark, sf_small).collect()}
    approx = {
        r.o_orderstatus: (r.p50, r.p95)
        for r in load(spark, sf_small, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile_approx("o_totalprice", 0.5, 10000), 2).alias("p50"),
            F.round(F.percentile_approx("o_totalprice", 0.95, 10000), 2).alias("p95"),
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            assert abs(a - e) <= 0.01 * max(abs(e), 1.0), (k, e, a)


# ------------------------- operator-level: cap + clustering ----------------


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_cap_bounds_boilerplate_pairs(spark):
    """A boilerplate phrase shared by every doc must not connect
    documents at the real threshold, and candidate-pair volume must be
    bounded by the cap (rank cap: the shingle survives only in its cap
    lowest-id docs), not O(n²)."""
    from production_ready_ds_spark.operators.dedup import jaccard_pairs

    boiler = "this content is provided under the creative commons license terms"
    n, cap = 30, 5
    docs = _mkdocs(
        spark,
        [(i, f"{boiler} unique{i} alpha{i} beta{i} gamma{i} delta{i}") for i in range(n)],
    )
    uncapped = jaccard_pairs(docs, threshold=0.01, df_cap=None).count()
    assert uncapped == n * (n - 1) / 2, "hot shingle should connect every pair uncapped"
    # At the real threshold the shared chrome never connects docs whose
    # actual content differs — even among the cap survivors.
    assert jaccard_pairs(docs, threshold=0.5, df_cap=cap).count() == 0
    # With a permissive threshold, candidates exist only among the cap
    # lowest-id docs: ≤ cap·(cap-1)/2 pairs however large n grows.
    loose = jaccard_pairs(docs, threshold=0.01, df_cap=cap)
    rows = loose.collect()
    assert len(rows) <= cap * (cap - 1) / 2
    assert all(r.doc_a < cap and r.doc_b < cap for r in rows)


def test_rank_cap_keeps_large_duplicate_family_visible(spark):
    """A near-identical template family LARGER than the cap must still
    produce pairs (a pure df>cap drop would strip every shared shingle
    from such a family and hide it completely): the cap lowest-id
    members pair at ~1.0 and cluster to one canonical doc."""
    from production_ready_ds_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
    )

    n, cap = 25, 5
    text = "large template family body repeated across many nearly identical pages"
    docs = _mkdocs(spark, [(i, f"{text} variant{i}") for i in range(n)])
    pairs = jaccard_pairs(docs, threshold=0.5, df_cap=cap)
    rows = pairs.collect()
    assert rows, "family must stay visible under the cap"
    members = {r.doc_a for r in rows} | {r.doc_b for r in rows}
    assert members == set(range(cap)), members
    assert all(r.jaccard >= 0.5 for r in rows)
    clusters = connected_components(pairs)
    assert {r.cluster_id for r in clusters.collect()} == {0}


def test_minhash_oracle_cap_replay_matches_spark_on_hot_buckets(spark, sf_small):
    """Round-8 verdict item 2: on a duplicate family LARGER than the
    oversized-bucket cap, the minhash DuckDB oracle must emit EXACTLY
    minhash_candidates' capped pair set (the ranked-CTE rewrite proven
    in the Hamming tail, now ported into _MINHASH_SQL) — previously the
    oracle emitted ALL within-bucket pairs, a latent driver-hash flip
    the day a driver scale factor ships a > cap family."""
    import os
    import tempfile

    from production_ready_ds_spark.operators.dedup import OVERSIZED_BUCKET_CAP
    from production_ready_ds_spark.oracle import run_compare
    from production_ready_ds_spark.queries import catalog as _cat

    n = OVERSIZED_BUCKET_CAP + 12  # 32 identical docs: one hot bucket per band
    fam = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, fam) for i in range(n)] + [
        (n, "completely different words about spark query engines at scale"),
        (n + 1, "another unrelated document on duckdb window functions"),
    ]
    cat = _cat()
    with tempfile.TemporaryDirectory() as d:
        # duck_connection registers every TABLE_NAMES view eagerly —
        # link the untouched tables from the real sf dir, then overlay
        # the constructed documents corpus
        from production_ready_ds_spark.tables import TABLE_NAMES

        for t in TABLE_NAMES:
            if t != "documents":
                os.symlink(
                    os.path.join(sf_small, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"),
                )
        # single-FILE parquet (pyarrow): DuckDB's read_parquet view
        # cannot glob a Spark-written directory
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows],
                    "lang": ["en"] * len(rows),
                    "source": ["t"] * len(rows),
                    "n_chars": pa.array(
                        [len(r[1]) for r in rows], pa.int64()
                    ),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        r = run_compare(spark, "q_dedup_minhash", d)
        assert r.ok, r.detail
        got = {
            (p.doc_a, p.doc_b)
            for p in cat["q_dedup_minhash"].fn(spark, d).collect()
        }
    # the capped shape: (a, b) survives iff a is one of the bucket's
    # cap lowest ids — NOT the full n·(n-1)/2 quadratic family
    want = {
        (a, b)
        for a in range(OVERSIZED_BUCKET_CAP)
        for b in range(a + 1, n)
    }
    assert got == want
    assert len(got) < n * (n - 1) // 2


def test_capped_jaccard_still_finds_real_near_dups(spark):
    """The cap must not suppress genuine near-duplicates whose shared
    shingles are rare."""
    from production_ready_ds_spark.operators.dedup import jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = _mkdocs(
        spark,
        [
            (1, base),
            (2, base + " today"),  # near-dup of 1
            (3, "completely different words about spark query engines at scale"),
        ],
    )
    pairs = {(r.doc_a, r.doc_b) for r in jaccard_pairs(docs, threshold=0.5, df_cap=5).collect()}
    assert (1, 2) in pairs
    assert all(p[0] != 3 and p[1] != 3 for p in pairs)


import pytest as _pytest


@_pytest.mark.parametrize("driver_threshold", [100_000, 0])
def test_connected_components_resolves_chains(spark, driver_threshold):
    """A~B, B~C, plus an unrelated D~E: one cluster {A,B,C} rooted at
    min id, one {D,E} — the per-pair keep-lowest heuristic would keep
    both B and C here. Both execution paths (driver union-find and the
    distributed label-propagation loop) must agree."""
    from production_ready_ds_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r.node: r.cluster_id
        for r in connected_components(pairs, driver_threshold=driver_threshold).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


@_pytest.mark.parametrize("driver_threshold", [100_000, 0])
def test_connected_components_long_chain_converges(spark, driver_threshold):
    """A 12-node path graph (diameter 11) must still reach fixpoint on
    both execution paths."""
    from production_ready_ds_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    got = {
        r.node: r.cluster_id
        for r in connected_components(pairs, driver_threshold=driver_threshold).collect()
    }
    assert got == {i: 0 for i in range(12)}


def test_connected_components_empty_pairs(spark):
    from production_ready_ds_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_ivf_topk_recall_vs_brute_force(spark, sf_small):
    """Round 9: q_sim_topk_ivf serves the FULL-PROBE anchor (nprobe =
    k — the hash-gate upgrade), so the store-served pair set must
    equal brute force EXACTLY, not just recall ≥ 0.5; partial-probe
    recall keeps its own bounds in tests/test_ivfstore.py."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from production_ready_ds_spark.functions.vectors import cosine_prenormed, norm
    from production_ready_ds_spark.queries.llm import q_sim_topk_ivf
    from production_ready_ds_spark.tables import load

    e = load(spark, sf_small, "embeddings").withColumn("nrm", norm(F.col("embedding")))
    probes = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.col("nrm").alias("pnrm"),
    )
    sims = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_prenormed(
                F.col("pe"), F.col("embedding"), F.col("pnrm"), F.col("nrm")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    brute = set(
        map(
            tuple,
            sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("probe_id", "neighbor_id")
            .collect(),
        )
    )
    ivf = set(
        map(
            tuple,
            q_sim_topk_ivf(spark, sf_small).select("probe_id", "neighbor_id").collect(),
        )
    )
    assert len(ivf) == len(brute) == 30  # 10 probes x top-3
    assert ivf == brute


def test_connected_components_raises_on_nonconvergence(spark):
    """Partial labels must never be returned silently: a chain whose
    diameter exceeds max_iter either raises (on_nonconverge='raise')
    or — the default — recovers through star contraction and still
    produces the EXACT labels."""
    from production_ready_ds_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            chain, max_iter=1, driver_threshold=0, on_nonconverge="raise"
        )
    # default: star-contraction fallback returns the exact fixpoint
    via_star = connected_components(chain, max_iter=1, driver_threshold=0)
    assert {r.node: r.cluster_id for r in via_star.collect()} == {
        i: 0 for i in range(9)
    }
    # same graph converges fine with adequate rounds
    ok = connected_components(chain, max_iter=25, driver_threshold=0)
    assert {r.cluster_id for r in ok.collect()} == {0}


def test_rank_cap_matches_plain_window_exactly(spark):
    """rank_cap (hot-group split + salted two-stage rank) must produce
    exactly the rows of the naive full-frame row_number cap — the perf
    rewrite may not change semantics."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from production_ready_ds_spark.operators.dedup import rank_cap

    rows = [(g, i * 7 % 101) for g in range(10) for i in range(g * 9)]
    df = spark.createDataFrame(
        [(g, v, g * 1000 + v) for (g, v) in rows], "grp int, val int, rid long"
    )
    cap = 5
    naive = (
        df.withColumn("rk", F.row_number().over(Window.partitionBy("grp").orderBy("rid")))
        .filter(F.col("rk") <= cap)
        .drop("rk")
    )
    got = rank_cap(df, ["grp"], "rid", cap, salt_buckets=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    # force every hot group down the salted two-stage MEGA branch too —
    # the size-routing rewrite must leave both paths exact
    got_mega = rank_cap(df, ["grp"], "rid", cap, salt_buckets=4, mega_threshold=1)
    assert sorted(map(tuple, got_mega.collect())) == sorted(map(tuple, naive.collect()))
    # peek=False must also stay exact (static always-plan-mega shape)
    got_static = rank_cap(df, ["grp"], "rid", cap, salt_buckets=4, peek=False)
    assert sorted(map(tuple, got_static.collect())) == sorted(map(tuple, naive.collect()))


def test_rank_cap_peek_skips_idle_mega_stages(spark):
    """When no group crosses mega_threshold, the driver peek must keep
    the salted two-stage branch OUT of the plan entirely (its two idle
    window stages measured ~0.25 s of scheduling overhead at sf0.1);
    with the lazy-safe default (peek=False — the probe is a driver
    action, so it is OPT-IN for materialized inputs only) the guard
    branch must stay planned."""
    from production_ready_ds_spark.operators.dedup import rank_cap
    from production_ready_ds_spark.plans.audit import explain_str

    df = spark.createDataFrame(
        [(g, g * 100 + i) for g in range(5) for i in range(g * 4)],
        "grp int, rid long",
    )
    peeked = rank_cap(df, ["grp"], "rid", 3, peek=True)
    assert "_salt" not in explain_str(peeked), "idle mega branch was planned"
    static = rank_cap(df, ["grp"], "rid", 3)
    assert "_salt" in explain_str(static), "lazy default lost its guard branch"
    mega = rank_cap(df, ["grp"], "rid", 3, mega_threshold=5, peek=True)
    assert "_salt" in explain_str(mega), "real mega group skipped the salted rank"


def test_oversized_lsh_bucket_guard(spark):
    """~1000 identical docs land in the same bucket in every band: the
    guard must bound candidate count at ~n·cap (not n²/2 ≈ 500k) while
    connected components still collapses the family to ONE cluster with
    the lowest id as canonical."""
    from production_ready_ds_spark.operators.dedup import (
        OVERSIZED_BUCKET_CAP,
        connected_components,
        minhash_bands,
        minhash_candidates,
    )

    n = 1000
    body = "an identical template page repeated verbatim across the whole crawl"
    docs = _mkdocs(spark, [(i, body) for i in range(n)] + [(n + 1, "something else entirely unrelated here")])
    pairs = minhash_candidates(minhash_bands(docs))
    rows = pairs.collect()
    # every doc beyond the cap still gets edges to the cap lowest ids
    assert len(rows) <= n * OVERSIZED_BUCKET_CAP
    assert len(rows) >= n - 1, "every family member needs at least one edge"
    assert all(r.doc_a < OVERSIZED_BUCKET_CAP for r in rows), (
        "capped side must contribute only the bucket's lowest ids"
    )
    comps = connected_components(pairs)
    clusters = {r.cluster_id for r in comps.collect()}
    assert clusters == {0}, "family must collapse to one cluster rooted at the lowest id"
    assert not any(r.doc_a == n + 1 or r.doc_b == n + 1 for r in rows)


def test_multiprobe_recall_contains_single_probe(spark, sf_small, cat):
    """Multi-probe must recover a SUPERSET of the single-probe pairs
    (same threshold, same buckets plus hyperplane-margin neighbors) and
    strictly more when boundary pairs exist in the corpus."""
    single = {(r.vec_a, r.vec_b) for r in cat["q_dedup_embedding"].fn(spark, sf_small).collect()}
    multi = {(r.vec_a, r.vec_b) for r in cat["q_dedup_embedding_multiprobe"].fn(spark, sf_small).collect()}
    assert single <= multi
    assert len(multi) > len(single), "test corpus has boundary pairs; none recovered"


def test_bucketed_matmul_pairs_equal_hof_pairs(spark, sf_small, cat):
    """The vectorized per-bucket matmul pair generator (operators/ann.py)
    must produce the IDENTICAL pair set and rounded similarities as the
    pure-JVM zip_with/aggregate plan it replaced in
    q_dedup_embedding_multiprobe — the BLAS-vs-sequential summation
    drift (~1e-15) must vanish under the 4-decimal rounding."""
    import pyspark.sql.functions as F

    from production_ready_ds_spark.functions.vectors import (
        cosine_prenormed,
        norm,
        probe_buckets,
        sign_bucket,
    )
    from production_ready_ds_spark.queries.llm import (
        EMBED_COS_THRESHOLD,
        EMBED_PROBE_EPS,
    )
    from production_ready_ds_spark.tables import load

    e = (
        load(spark, sf_small, "embeddings")
        .withColumn("bucket", sign_bucket(F.col("embedding")))
        .withColumn("nrm", norm(F.col("embedding")))
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.explode(probe_buckets(F.col("embedding"), EMBED_PROBE_EPS)).alias("pb"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    c = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("bucket").alias("bb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    sim = cosine_prenormed(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    hof = set(
        map(
            tuple,
            a.join(c, (F.col("pb") == F.col("bb")) & (F.col("vec_a") != F.col("vec_b")))
            .filter(sim >= EMBED_COS_THRESHOLD)
            .select(
                F.least("vec_a", "vec_b"),
                F.greatest("vec_a", "vec_b"),
                F.round(sim, 4),
            )
            .distinct()
            .collect(),
        )
    )
    matmul = set(
        map(tuple, cat["q_dedup_embedding_multiprobe"].fn(spark, sf_small).collect())
    )
    assert hof == matmul


def test_rank_cap_property_random_frames(spark):
    """Property check over randomized group shapes (sizes straddling the
    cap, duplicate order values across groups, single-row groups): the
    size-routed rank_cap equals the naive window for every draw."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from production_ready_ds_spark.operators.dedup import rank_cap

    rng = random.Random(7)
    for trial in range(3):
        rows = []
        for g in range(rng.randint(1, 12)):
            n = rng.choice([1, 2, 5, 19, 20, 21, 40, 100])
            ids = rng.sample(range(10_000), n)
            rows += [(g, i) for i in ids]
        df = spark.createDataFrame(rows, "grp int, rid long")
        cap = rng.choice([1, 3, 20])
        naive = (
            df.withColumn(
                "rk", F.row_number().over(Window.partitionBy("grp").orderBy("rid"))
            )
            .filter(F.col("rk") <= cap)
            .drop("rk")
        )
        for mega in (100_000, 10, 1):
            got = rank_cap(df, ["grp"], "rid", cap, mega_threshold=mega)
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, naive.collect())
            ), (trial, cap, mega)


def test_segment_dedup_drops_repeated_spans_keeps_first(spark):
    """Constructed corpus: doc 1 and doc 2 share an identical 8-token
    opening segment; doc 2's copy must be dropped (first occurrence by
    (doc_id, seg_idx) wins) while its unique tail survives. Doc 3 is
    100% unique and must keep everything."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.queries import catalog as _cat

    boiler = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = _mkdocs(
        spark,
        [
            (1, boiler + " one two three four five six seven eight"),
            (2, boiler + " nine ten eleven twelve thirteen fourteen fifteen sixteen"),
            (3, "totally fresh words that appear nowhere else at all"),
        ],
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
            "n_chars", F.length("text")
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in _cat()["q_dedup_segments"].fn(spark, d).collect()
        }
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2
    # doc 2: boilerplate segment dropped, unique tail kept
    assert out[2]["n_segments"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["n_kept"] == out[3]["n_segments"]


def test_fuzzy_join_blocks_and_bounds_distance(spark, sf_small, cat):
    """Every emitted pair shares a blocking noun, has 1<=lev<=3, and is
    canonically ordered; an identical-name pair (distance 0) never
    appears."""
    rows = cat["q_join_fuzzy"].fn(spark, sf_small).collect()
    assert rows, "expected some fuzzy matches at sf0.001"
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert 1 <= r["edit_dist"] <= 3
        assert r["name_a"].split(" ")[-1] == r["name_b"].split(" ")[-1]


def test_journey_paths_are_prefixes_of_session_order(spark, sf_small, cat):
    """Paths must be '>'-joined event-type prefixes of length <= 3 and
    ranks must be dense from 1 in (count desc, path asc) order."""
    rows = cat["q_user_journey"].fn(spark, sf_small).collect()
    assert rows and len(rows) <= 10
    ordered = sorted(rows, key=lambda r: (-r["n_sessions"], r["path"]))
    for i, r in enumerate(ordered):
        assert r["rnk"] == i + 1
        assert 1 <= len(r["path"].split(">")) <= 3


def _star_clusters(spark, edges, **kw):
    from production_ready_ds_spark.operators.dedup import connected_components_star

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r.node: r.cluster_id for r in connected_components_star(pairs, **kw).collect()
    }


def test_star_cc_resolves_chains_and_islands(spark):
    got = _star_clusters(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_star_cc_long_chain_logarithmic_rounds(spark):
    """A 64-node path (diameter 63) must converge within the O(log²)
    round budget — far below the diameter the propagation loop would
    need. max_iter=10 would fail for hash-min propagation (63 rounds)
    but is ample for star contraction."""
    got = _star_clusters(spark, [(i, i + 1) for i in range(63)], max_iter=10)
    assert got == {i: 0 for i in range(64)}


def test_star_cc_empty_pairs(spark):
    assert _star_clusters(spark, []) == {}


def test_star_cc_matches_union_find_on_random_graphs(spark):
    """Property check: on seeded random graphs (mixed cliques, chains,
    stars, random edges) star contraction must produce exactly the
    labels driver union-find produces."""
    import random

    from production_ready_ds_spark.operators.dedup import (
        _driver_union_find,
        connected_components_star,
    )
    from pyspark.sql import functions as F

    rng = random.Random(7)
    for trial in range(4):
        n = 40 + trial * 15
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n)
        ]
        edges = [(a, b) for a, b in edges if a != b]  # star drops self-loops
        edges += [(i, i + 1) for i in range(20)]  # embedded chain
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        star = {
            r.node: r.cluster_id for r in connected_components_star(pairs).collect()
        }
        uf_edges = pairs.select(
            F.col("doc_a").alias("s"), F.col("doc_b").alias("d")
        )
        uf = {r.node: r.cluster_id for r in _driver_union_find(uf_edges).collect()}
        assert star == uf, f"trial {trial}: star != union-find"


def test_cdc_chunks_are_shift_resistant(spark, tmp_path):
    """The CDC property fixed-width chunking lacks: PREPENDING text to
    a document must not destroy the shared-chunk match for a passage
    both docs contain, because boundaries re-anchor on content. Build
    doc A = passage, doc B = long unrelated prefix + passage, run the
    chunk pipeline on a parquet dir, and require at least one chunk
    signature shared by both docs (n_docs = 2)."""
    import random

    from production_ready_ds_spark.queries import catalog

    rng = random.Random(3)
    words = [f"w{rng.randrange(5000)}" for _ in range(400)]
    passage = " ".join(words)
    prefix = " ".join(f"p{rng.randrange(5000)}" for _ in range(173))
    df = spark.createDataFrame(
        [
            (1, passage, "en", "a", len(passage)),
            (2, prefix + " " + passage, "en", "b", len(prefix) + len(passage) + 1),
            (3, " ".join(f"z{rng.randrange(5000)}" for _ in range(300)), "en", "c", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "cdc_sf")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    out = catalog()["q_dedup_cdc"].fn(spark, sf_dir).collect()
    shared = [r for r in out if r.n_docs >= 2]
    assert shared, "prepended passage lost every CDC chunk match"
    # the unrelated doc 3 must not produce cross-doc chunks
    assert all(r.n_docs == 2 for r in shared)


def test_star_cc_thousand_node_stress(spark):
    """Distributed-path stress: a 1000-node graph mixing a 200-link
    chain, 10 cliques, and random noise edges must match union-find
    exactly and converge within the log² budget."""
    import random

    from pyspark.sql import functions as F

    from production_ready_ds_spark.operators.dedup import (
        _driver_union_find,
        connected_components_star,
    )

    rng = random.Random(11)
    edges = [(i, i + 1) for i in range(200)]  # long chain
    for c in range(10):  # cliques of 8
        base = 300 + c * 40
        members = [base + j for j in range(8)]
        edges += [(a, b) for a in members for b in members if a < b]
    edges += [
        (rng.randrange(1000), rng.randrange(1000)) for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    star = {r.node: r.cluster_id for r in connected_components_star(pairs).collect()}
    uf_edges = pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
    uf = {r.node: r.cluster_id for r in _driver_union_find(uf_edges).collect()}
    assert star == uf


def test_remove_dup_spans_keeps_canonical_and_cuts_copy(spark, tmp_path):
    """Lee-et-al-style span removal: the canonical (min-id) doc's
    cleaned text must be byte-identical to its original token join
    (nothing removed), the doc that copied the passage must lose
    chunks, and a doc with unique content must pass through unchanged."""
    import hashlib
    import os
    import random
    import re

    from production_ready_ds_spark.queries import catalog

    rng = random.Random(3)
    passage = " ".join(f"w{rng.randrange(5000)}" for _ in range(300))
    prefix = " ".join(f"p{rng.randrange(5000)}" for _ in range(101))
    unique = " ".join(f"z{rng.randrange(5000)}" for _ in range(120))
    df = spark.createDataFrame(
        [
            (1, passage, "en", "a", 1),
            (2, prefix + " " + passage, "en", "b", 1),
            (3, unique, "en", "c", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "spans_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in catalog()["q_remove_dup_spans"].fn(spark, sf_dir).collect()}

    def tok_md5(text):
        toks = [t for t in re.split(r"\W+", text.lower()) if t]
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    assert got[1].n_removed == 0 and got[1].cleaned_md5 == tok_md5(passage)
    assert got[2].n_removed > 0 and got[2].cleaned_md5 != tok_md5(prefix + " " + passage)
    assert got[3].n_removed == 0 and got[3].cleaned_md5 == tok_md5(unique)


def test_compression_ratio_separates_repetitive_from_random(spark, tmp_path):
    """The zlib quality signal must order constructed docs correctly:
    highly repetitive text compresses far below random text, the ratio
    is deterministic across runs, and the catalog entry's deflate
    bounds contract holds on the same docs."""
    import os
    import random

    from production_ready_ds_spark.queries import catalog
    from production_ready_ds_spark.queries.llm import compression_signal

    rng = random.Random(5)
    rep = "spam ham " * 300
    rand = " ".join("".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8)) for _ in range(300))
    df = spark.createDataFrame(
        [(1, rep, "en", "a", len(rep)), (2, rand, "en", "b", len(rand))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "comp_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))

    def ratios():
        from production_ready_ds_spark.tables import load

        sig = compression_signal(load(spark, sf_dir, "documents"))
        return {r.doc_id: r.comp_ratio for r in sig.collect()}

    got = ratios()
    assert got[1] < 0.1 < 0.4 < got[2], got
    assert got == ratios()
    contract = catalog()["q_quality_compress"].fn(spark, sf_dir).collect()
    assert len(contract) == 2 and all(r.ratio_ok for r in contract), contract


def test_compress_bound_holds_on_incompressible_text(spark, tmp_path):
    """The ratio_ok contract uses zlib.h's compressBound, which must
    hold even for maximum-entropy input where deflate expands (the
    naive 5-bytes-per-64KiB stored-block arithmetic does NOT hold
    there — zlib emits stored blocks at ~16 KiB granularity). Feed
    high-entropy unicode soup well past one stored block and a doc at
    the exact 65535 boundary."""
    import os
    import random
    import zlib

    from production_ready_ds_spark.queries import catalog

    rng = random.Random(11)

    def compress_bound(n: int) -> int:
        return n + (n >> 12) + (n >> 14) + (n >> 25) + 13

    # The bound itself, against zlib directly on RAW random bytes —
    # the true worst case, where deflate genuinely EXPANDS (valid
    # UTF-8 text never reaches 8 bits/byte, so the Spark path cannot
    # construct this input; the contract must still be sound for it).
    for n in (0, 1, 100, 16384, 65535, 65536, 200001):
        blob = bytes(rng.randrange(256) for _ in range(n))
        out = len(zlib.compress(blob, 6))
        assert out <= compress_bound(n), (n, out, compress_bound(n))
        if n >= 65535:
            assert out > n, "expected expansion on random bytes"

    # dense codepoint soup: ~2-3 UTF-8 bytes/char, near-max text
    # entropy — the hardest input the Spark path can actually see
    soup = "".join(chr(rng.randrange(0x21, 0x2FA0)) for _ in range(40000))
    edge = "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(65535))
    df = spark.createDataFrame(
        [(1, soup, "en", "a", len(soup)), (2, edge, "en", "b", len(edge))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "comp_hard")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    contract = catalog()["q_quality_compress"].fn(spark, sf_dir).collect()
    assert len(contract) == 2 and all(r.ratio_ok for r in contract), contract


def test_star_cc_selfloop_nodes_get_singleton_labels(spark):
    """Contract parity with connected_components: nodes appearing only
    in reflexive pairs still receive a (node, node) label."""
    got = _star_clusters(spark, [(5, 5), (1, 2), (7, 7), (2, 2)])
    assert got == {5: 5, 7: 7, 1: 1, 2: 1}
    only_selfs = _star_clusters(spark, [(9, 9)])
    assert only_selfs == {9: 9}


def test_remove_dup_spans_identity_on_unique_corpus(spark, tmp_path):
    """Reconstruction invariant: with per-doc-unique vocabularies (no
    cross-doc duplicate chunks anywhere) the rebuild must reproduce
    every document's token join byte-identically — pinning the
    starts/ends/tail slicing arithmetic against off-by-ones across 30
    random doc lengths."""
    import hashlib
    import os
    import random
    import re

    from production_ready_ds_spark.queries import catalog

    rng = random.Random(17)
    rows = []
    for d in range(30):
        n = rng.randrange(3, 120)  # includes tiny docs near the K=3 floor
        text = " ".join(f"d{d}w{rng.randrange(10**6)}" for _ in range(n))
        rows.append((d, text, "en", "s", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "uniq_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in catalog()["q_remove_dup_spans"].fn(spark, sf_dir).collect()}
    for d, text, *_ in rows:
        toks = [t for t in re.split(r"\W+", text.lower()) if t]
        if len(toks) < 3:
            assert d not in got  # below the gram floor, excluded
            continue
        expect = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[d].n_removed == 0, (d, got[d])
        assert got[d].cleaned_md5 == expect, f"doc {d} ({len(toks)} toks) rebuilt wrong"


def _cdc_reference_sigs(text):
    """Independent pure-Python CDC implementation (tokens → md5-prefix
    gram hashes → mod-16 boundaries → per-chunk sig over the joined
    hash ints) — written from the spec, not from the Spark/SQL code,
    so a misconception shared by those two implementations still fails
    here."""
    import hashlib
    import re

    K, DIV, MIN_GRAMS = 3, 16, 4
    toks = [t for t in re.split(r"\W+", text.lower()) if t]
    if len(toks) < K:
        return []
    ghs = []
    for i in range(len(toks) - K + 1):
        h = hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()[:8]
        ghs.append(int(h, 16))
    chunks, cur = [], []
    for gh in ghs:
        cur.append(gh)
        if gh % DIV == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        hashlib.md5(",".join(str(g) for g in c).encode()).hexdigest()
        for c in chunks
        if len(c) >= MIN_GRAMS
    ]


def test_cdc_chunks_match_pure_python_reference(spark, tmp_path):
    """q_dedup_cdc's duplicated-chunk report over a planted-duplicate
    corpus must equal the report computed by the independent Python
    reference — a third implementation the Spark/SQL pair is checked
    against."""
    import os
    import random
    from collections import Counter

    from production_ready_ds_spark.queries import catalog

    rng = random.Random(23)
    passage = " ".join(f"w{rng.randrange(4000)}" for _ in range(180))
    rows = []
    for d in range(12):
        filler = " ".join(f"d{d}x{rng.randrange(4000)}" for _ in range(rng.randrange(30, 90)))
        text = (filler + " " + passage) if d % 3 == 0 else filler
        rows.append((d, text, "en", "s", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "ref_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))

    # reference: per-sig (n_docs, n_occ), filtered to n_docs >= 2
    docs_count: Counter = Counter()
    occ_count: Counter = Counter()
    for d, text, *_ in rows:
        sigs = _cdc_reference_sigs(text)
        occ_count.update(sigs)
        docs_count.update(set(sigs))
    expect = {
        sig: (docs_count[sig], occ_count[sig])
        for sig in docs_count
        if docs_count[sig] >= 2
    }
    got = {
        r.sig: (r.n_docs, r.n_occ)
        for r in catalog()["q_dedup_cdc"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "planted duplicates must produce shared chunks"


def test_cdc_edge_cases_match_reference(spark, tmp_path):
    """Adversarial chunking shapes vs the pure-Python reference: a doc
    of repeated boundary grams ('b30 b30 ...' — every gram hashes ≡ 0
    mod 16, so chunks are all single-gram and consecutive boundaries
    stack), exactly-3-token docs (one gram), 2-token docs (below the
    gram floor), and a doc whose LAST gram is a boundary (empty-tail
    segment handling)."""
    import os

    from production_ready_ds_spark.queries import catalog

    # 'b30' found by search: md5('b30 b30 b30')[:8] as int ≡ 0 mod 16
    rows = [
        (1, " ".join(["b30"] * 40), "en", "s", 1),   # all-boundary grams
        (2, " ".join(["b30"] * 40), "en", "s", 1),   # duplicate of 1
        (3, "alpha beta gamma", "en", "s", 1),        # exactly one gram
        (4, "alpha beta", "en", "s", 1),              # below gram floor
        (5, "w1 w2 w3 w4 w5 b30 b30 b30", "en", "s", 1),  # boundary tail
        (6, "w1 w2 w3 w4 w5 b30 b30 b30", "en", "s", 1),  # duplicate of 5
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "edge_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))

    from collections import Counter

    docs_count: Counter = Counter()
    occ_count: Counter = Counter()
    for d, text, *_ in rows:
        sigs = _cdc_reference_sigs(text)
        occ_count.update(sigs)
        docs_count.update(set(sigs))
    expect = {
        sig: (docs_count[sig], occ_count[sig])
        for sig in docs_count
        if docs_count[sig] >= 2
    }
    got = {
        r.sig: (r.n_docs, r.n_occ)
        for r in catalog()["q_dedup_cdc"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_dedup_semantic_matches_bruteforce(spark, sf_small, cat):
    """q_dedup_semantic's keep/drop decisions must equal a NumPy
    brute-force replay of the SemDeDup rule: within each sign bucket,
    drop iff some smaller-id vector in the bucket has cosine >= tau,
    with dup_of = the smallest such neighbor."""
    import numpy as np

    from production_ready_ds_spark.queries.llm import EMBED_COS_THRESHOLD
    from production_ready_ds_spark.tables import load

    rows = load(spark, sf_small, "embeddings").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    buckets: dict[int, list[int]] = {}
    for vid, v in vecs.items():
        b = sum(1 << i for i in range(4) if v[i] >= 0)
        buckets.setdefault(b, []).append(vid)
    expect = {}
    for b, ids in buckets.items():
        for vid in ids:
            dups = []
            for other in ids:
                if other < vid:
                    a, c = vecs[other], vecs[vid]
                    cos = float(a @ c / (np.linalg.norm(a) * np.linalg.norm(c)))
                    if cos >= EMBED_COS_THRESHOLD:
                        dups.append(other)
            expect[vid] = (b, not dups, min(dups) if dups else None, len(dups))
    got = {
        r.vec_id: (r.bucket, r.kept, r.dup_of, r.n_dups)
        for r in cat["q_dedup_semantic"].fn(spark, sf_small).collect()
    }
    assert got == expect


def test_substring_runs_survive_prefix_shift(spark, tmp_path):
    """A long verbatim copy with a fresh prefix inserted in front must
    surface as a consecutive chunk run at SHIFTED positions (the drift
    case fixed-width chunking loses), and unrelated docs must produce
    no runs."""
    import os
    import random

    rng = random.Random(77)
    span = " ".join(f"copy{rng.randrange(10**6)}" for _ in range(240))
    prefix = " ".join(f"new{rng.randrange(10**6)}" for _ in range(40))
    noise_a = " ".join(f"za{rng.randrange(10**6)}" for _ in range(120))
    noise_b = " ".join(f"zb{rng.randrange(10**6)}" for _ in range(120))
    rows = [
        (1, span, "en", "s", 1),
        (2, prefix + " " + span, "en", "s", 1),
        (3, noise_a, "en", "s", 1),
        (4, noise_b, "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "runs_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    out = catalog()["q_dedup_substring_runs"].fn(spark, sf_dir).collect()
    pair_runs = [r for r in out if (r.doc_a, r.doc_b) == (1, 2)]
    assert pair_runs, "verbatim copy must produce a consecutive chunk run"
    best = max(pair_runs, key=lambda r: r.run_chunks)
    assert best.run_chunks >= 2 and best.run_grams >= 2
    assert best.start_b > best.start_a, "prefix must shift the copy's position"
    others = [r for r in out if {r.doc_a, r.doc_b} & {3, 4}]
    assert not others, f"unrelated docs must not share runs: {others}"


def test_perplexity_separates_fluent_from_gibberish(spark, tmp_path):
    """The bigram-LM scorer must rank documents made of corpus-frequent
    transitions below documents of unique one-off tokens — the property
    that makes it a quality gate."""
    import os
    import random

    rng = random.Random(3)
    common = "the data engine runs the data engine runs " * 6
    rows = [(i, common, "en", "s", 1) for i in range(8)]
    gibberish = " ".join(f"g{rng.randrange(10**9)}" for _ in range(40))
    rows.append((99, gibberish, "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "ppl_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in catalog()["q_quality_perplexity"].fn(spark, sf_dir).collect()}
    assert set(got) == set(range(8)) | {99}
    fluent = max(got[i].avg_nll_scaled for i in range(8))
    assert got[99].avg_nll_scaled > fluent, (got[99], fluent)
    # scaled integers: sum of per-term grid values, exact arithmetic
    for r in got.values():
        assert r.nll_scaled >= 0 and r.n_bigrams > 0


def test_cluster_weighted_sampling_preserves_mass(spark, tmp_path):
    """One canonical row per near-dup family, weight = family size, and
    total weight must equal the corpus size (soft dedup loses no
    mass)."""
    import os

    fam = "identical template page body repeated across mirrored hosts"
    rows = [(i, f"{fam} tail{i}", "en", "s", 1) for i in range(6)]  # one family
    rows += [
        (10, "first unique document about spark planning internals x y z", "en", "s", 1),
        (11, "second unique document entirely different words and topics q r", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "cw_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in
           catalog()["q_sample_cluster_weighted"].fn(spark, sf_dir).collect()}
    assert got[0].family_size == 6 and got[0].n_dropped == 5  # canonical = min id
    assert got[10].family_size == 1 and got[11].family_size == 1
    assert set(got) == {0, 10, 11}
    assert sum(r.family_size for r in got.values()) == len(rows)


def test_triangle_count_degree_ordered_exact(spark):
    """Degree-ordered triangle counting must be exact on constructed
    graphs, including the skewed-hub case the orientation exists for."""
    from production_ready_ds_spark.operators.graph import triangle_count

    def tri(edges):
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return triangle_count(df).first().n_triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert tri(k4) == 4  # K4 has C(4,3) triangles
    star = [(0, i) for i in range(1, 30)]
    assert tri(star) == 0  # hub with no closures
    # hub + two closed rims: exactly the closures are triangles, and
    # the hub (max degree) is never the wedge apex
    assert tri(star + [(1, 2), (3, 4)]) == 2
    chain = [(i, i + 1) for i in range(10)]
    assert tri(chain) == 0
    assert tri(chain + [(0, 2), (5, 7)]) == 2


def test_dedup_semantic_ivf_matches_bruteforce_within_clusters(spark, sf_small, cat):
    """The trained-quantizer SemDeDup must make exactly the brute-force
    decisions WITHIN its own clusters (whatever the trainer produced):
    drop iff a smaller-id same-cluster vector has cosine >= tau."""
    import numpy as np

    from production_ready_ds_spark.queries.llm import EMBED_COS_THRESHOLD
    from production_ready_ds_spark.tables import load

    out = {r.vec_id: r for r in
           cat["q_dedup_semantic_ivf"].fn(spark, sf_small).collect()}
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in load(spark, sf_small, "embeddings").collect()}
    assert set(out) == set(vecs)
    clusters: dict[int, list[int]] = {}
    for vid, r in out.items():
        clusters.setdefault(r.bucket, []).append(vid)
    assert len(clusters) > 1, "trainer must actually partition the space"
    for vid, r in out.items():
        dups = []
        for other in clusters[r.bucket]:
            if other < vid:
                a, c = vecs[other], vecs[vid]
                cos = float(a @ c / (np.linalg.norm(a) * np.linalg.norm(c)))
                if cos >= EMBED_COS_THRESHOLD:
                    dups.append(other)
        assert r.kept == (not dups), (vid, r)
        assert r.dup_of == (min(dups) if dups else None), (vid, r)
        assert r.n_dups == len(dups), (vid, r)


def test_perplexity_survives_short_and_empty_docs(spark, tmp_path):
    """Docs with <2 tokens must yield NO bigram rows — never the
    sequence(1,0)-counts-down element_at crash (review finding): the
    scorer keeps running and short docs simply carry no evidence."""
    import os

    rows = [
        (1, "", "en", "s", 0),                      # empty
        (2, "single", "en", "s", 1),                # one token
        (3, "two tokens here now ok", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "short_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in
           catalog()["q_quality_perplexity"].fn(spark, sf_dir).collect()}
    assert set(got) == {3}, got  # short docs produce no bigrams, no crash
    assert got[3].n_bigrams == 4
    # PMI shares the same guarded bigram definition
    assert catalog()["q_bigram_pmi"].fn(spark, sf_dir).count() >= 0


def test_gopher_rules_each_trigger(spark, tmp_path):
    """Each Gopher rule must fall exactly the document built to violate
    it, and a clean document passes all four."""
    import os

    rows = [
        (1, "the data and engine run with that speed of light", "en", "s", 1),  # clean
        (2, "the and of x", "en", "s", 1),                                      # too few words
        (3, "the and " + " ".join(["a"] * 30), "en", "s", 1),                   # mean len < 3
        (4, "the and " + " ".join(f"x{i}9" for i in range(30)), "en", "s", 1),  # non-alpha
        (5, " ".join(f"word{chr(97+i)}" for i in range(30)), "en", "s", 1),     # no stopwords
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "gopher_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in catalog()["q_quality_gopher"].fn(spark, sf_dir).collect()}
    assert got[1].keep and all(
        [got[1].words_ok, got[1].word_len_ok, got[1].alpha_ok, got[1].stopword_ok]
    )
    assert not got[2].words_ok and not got[2].keep
    assert not got[3].word_len_ok and not got[3].keep
    assert not got[4].alpha_ok and not got[4].keep
    assert not got[5].stopword_ok and not got[5].keep


def test_dupgrams_covers_exactly_the_repeated_phrase(spark, tmp_path):
    """Hand-checkable coverage: a doc that repeats one 5-gram twice
    must cover exactly those positions' characters; a no-repeat doc
    covers zero; a looping spam doc fails keep."""
    import os

    phrase = "alpha bravo charlie delta echo"  # 5 tokens, 26 chars
    rows = [
        (1, f"{phrase} filler one two three four {phrase}", "en", "s", 1),
        (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en", "s", 1),   # all unique
        (3, (phrase + " ") * 6, "en", "s", 1),                   # looping spam
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "dg_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in
           catalog()["q_quality_dupgrams"].fn(spark, sf_dir).collect()}
    # doc 1: the two phrase occurrences cover their 10 tokens = 52 chars
    assert got[1].covered_chars == 52, got[1]
    assert not got[1].keep  # 52 > 0.2 * total (73) here
    assert got[2].covered_chars == 0 and got[2].keep
    assert got[3].covered_chars == got[3].total_chars and not got[3].keep


def test_novelty_scores_copies_low_and_fresh_high(spark, tmp_path):
    """A doc cloned from another must score 0 novelty (every gram
    shared); fresh text scores 1000; a half-copied doc lands at the
    exact gram arithmetic in between."""
    import os

    base = " ".join(f"shared{i}" for i in range(20))       # 20 tokens
    fresh = " ".join(f"fresh{i}" for i in range(20))
    rows = [
        (1, base, "en", "s", 1),
        (2, base, "en", "s", 1),                           # exact clone
        (3, fresh, "en", "s", 1),
        (4, base + " " + " ".join(f"own{i}" for i in range(20)), "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "nov_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {r.doc_id: r for r in catalog()["q_text_novelty"].fn(spark, sf_dir).collect()}
    assert got[1].novelty_permille == 0 and got[2].novelty_permille == 0
    assert got[3].novelty_permille == 1000
    # doc 4: 40 tokens -> 36 grams; the 16 grams fully inside the
    # copied first 20 tokens are shared with docs 1/2, the other 20
    # (straddling or inside the own-tail) are unique
    assert got[4].n_grams == 36 and got[4].n_novel == 20


# ---- corpus-scaled quantizer knob (round-4 verdict item 2) ----------


def test_scaled_planes_formula_matches_duckdb_twin():
    """The Python plane-count formula and the oracle's SQL indicator
    formula must agree for every corpus size — both are integer
    shift-and-compare, so equality is exact, which is what lets the
    hash gate stay green while the knob moves with the data."""
    import duckdb

    from production_ready_ds_spark.functions.vectors import (
        SIGN_MAX_PLANES,
        SIGN_MIN_PLANES,
        SIGN_TARGET_BUCKET_ROWS,
        scaled_ivf_k,
        scaled_sign_planes,
    )

    expr = (
        str(SIGN_MIN_PLANES)
        + " + "
        + " + ".join(
            f"CAST(n > {SIGN_TARGET_BUCKET_ROWS << k} AS INT)"
            for k in range(SIGN_MIN_PLANES, SIGN_MAX_PLANES)
        )
    )
    con = duckdb.connect()
    probe = [1, 500, 1023, 1024, 1025, 2000, 2048, 4096, 8000, 8192,
             16384, 32000, 32768, 32769, 10**6, 10**9]
    for n in probe:
        (sql_p,) = con.execute(
            f"SELECT {expr} FROM (SELECT CAST({n} AS BIGINT) AS n)"
        ).fetchone()
        assert sql_p == scaled_sign_planes(n), n
    # spot values: the documented growth schedule
    assert scaled_sign_planes(500) == 4     # the original 16 buckets
    assert scaled_sign_planes(2000) == 5    # sf0.1
    assert scaled_sign_planes(8000) == 7    # 4x stress
    assert scaled_sign_planes(32000) == 9   # 16x stress
    assert scaled_sign_planes(10**9) == SIGN_MAX_PLANES  # clamped
    # trained-quantizer twin: mean list <= 64 rows, floored/clamped
    assert scaled_ivf_k(500) == 16
    assert scaled_ivf_k(2000) == 32
    assert scaled_ivf_k(10**6) == 4096  # clamped at max_k
    assert scaled_ivf_k(10**9, max_k=1 << 20) == 1 << 20


def test_sign_plane_refinement_is_monotone(spark, sf_small):
    """Raising the plane count REFINES the blocking: a pair colliding
    at p+k planes agrees on the first p sign bits too, so the engine's
    pair set at a finer grid is a subset of the coarser one — and every
    surviving pair's rounded cosine is identical (blocking can only
    DROP pairs, never corrupt a similarity). This is the decision
    invariance that holds as the corpus-scaled knob moves."""
    import pyspark.sql.functions as F

    from production_ready_ds_spark.functions.vectors import sign_bucket
    from production_ready_ds_spark.operators.ann import bucketed_cosine_pairs
    from production_ready_ds_spark.queries.llm import EMBED_COS_THRESHOLD
    from production_ready_ds_spark.tables import load

    e = load(spark, sf_small, "embeddings")

    def pairs_at(p):
        home = e.select(
            "vec_id", sign_bucket(F.col("embedding"), p).alias("pb"), "embedding"
        )
        return {
            (r.vec_a, r.vec_b): r.cos_sim
            for r in bucketed_cosine_pairs(
                home, home, threshold=EMBED_COS_THRESHOLD
            )
            .distinct()
            .collect()
        }

    p4, p6, p8 = pairs_at(4), pairs_at(6), pairs_at(8)
    assert set(p8) <= set(p6) <= set(p4)
    assert len(p8) < len(p6) < len(p4), "finer grids must actually prune"
    for k in p8:
        assert p8[k] == p6[k] == p4[k]


def test_sign_plane_near_dup_recall_survives_scaling(spark):
    """What the knob must NOT break: TRUE near-duplicates (the pairs
    semantic dedup exists to catch, cos ≈ 1) keep colliding as the
    plane count scales, because a clone pair splits only when a
    component's |value| is under the perturbation size. Constructed
    clone corpus (64-dim, unit-scale components, noise 1e-3): recall of
    clone pairs must stay ≥ 0.95 at EVERY plane count in the knob's
    range — the low-similarity pairs the coarse grid happened to keep
    are the ones a finer grid sheds, not the near-dups."""
    import numpy as np
    import pyspark.sql.functions as F

    from production_ready_ds_spark.functions.vectors import (
        SIGN_MAX_PLANES,
        sign_bucket,
    )
    from production_ready_ds_spark.operators.ann import bucketed_cosine_pairs

    rng = np.random.RandomState(11)
    base = rng.normal(0, 1.0, size=(60, 64))
    clones = base + rng.normal(0, 1e-3, size=base.shape)
    X = np.concatenate([base, clones])
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    want = {(i, i + 60) for i in range(60)}
    for p in (4, 7, SIGN_MAX_PLANES):
        home = e.select(
            "vec_id", sign_bucket(F.col("embedding"), p).alias("pb"), "embedding"
        )
        got = {
            (r.vec_a, r.vec_b)
            for r in bucketed_cosine_pairs(home, home, threshold=0.999)
            .distinct()
            .collect()
        }
        recall = len(got & want) / len(want)
        assert recall >= 0.95, (p, recall)


# ---- trained quality classifier (round-4 verdict item 3) ------------


def _mixed_quality_corpus(spark):
    """40 clean docs (stopword-bearing English-ish text → pass every
    Gopher rule) + 40 junk docs (digit-ridden tokens, no stopwords →
    fail alpha + stopword rules), distinct vocabularies so hashed
    token counts are separable."""
    good_words = ["data", "model", "training", "corpus", "signal", "layer"]
    rows = []
    for i in range(40):
        w = [good_words[(i + j) % len(good_words)] for j in range(20)]
        rows.append((i, "the %s and %s of %s with %s" % (w[0], w[1], w[2], " ".join(w[3:])), "en", "s", 1))
    for i in range(40, 80):
        toks = ["x%d%d" % (i, j) for j in range(20)]
        rows.append((i, " ".join(toks), "en", "s", 1))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_quality_classifier_auc_vs_gopher_teacher(spark):
    """On a corpus where the Gopher gate discriminates, the ladder must
    pick the GOPHER teacher (weak_keep == the rule gate's keep) and
    the trained score must separate those rule labels with AUC ≥ 0.9 —
    the FineWeb-Edu/DCLM evidence form: the model recovers the
    teacher's ranking from hashed token features alone."""
    import pandas as pd

    from production_ready_ds_spark.queries.llm import (
        gopher_decision_frame,
        quality_classifier_scores,
    )

    docs = _mixed_quality_corpus(spark)
    rule = {r.doc_id: r.keep for r in gopher_decision_frame(docs).collect()}
    assert set(rule.values()) == {True, False}, "corpus must split the rule gate"
    got = quality_classifier_scores(docs).collect()
    assert {r.doc_id: r.weak_keep for r in got} == rule, "ladder must pick gopher"
    ys = pd.Series({r.doc_id: r.weak_keep for r in got}).sort_index()
    ss = pd.Series({r.doc_id: r.score for r in got}).sort_index()
    ranks = ss.rank(method="average")
    n1, n0 = int(ys.sum()), int((~ys).sum())
    auc = (ranks[ys].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert auc >= 0.9, auc


def test_quality_classifier_decisions_deterministic(spark, sf_small):
    """Two independent runs over the same corpus must emit identical
    decision tables — seeded LBFGS + fixed partitioning, the
    reproducible-backfill contract every gate in corpus_build holds."""
    from production_ready_ds_spark.queries import catalog

    fn = catalog()["q_quality_classifier"].fn
    a = {r.doc_id: (r.weak_keep, r.score, r.keep) for r in fn(spark, sf_small).collect()}
    b = {r.doc_id: (r.weak_keep, r.score, r.keep) for r in fn(spark, sf_small).collect()}
    assert a == b


def test_quality_classifier_degenerate_teacher_keeps_all(spark):
    """An all-identical corpus gives BOTH teachers one class — no
    discrimination evidence, so the gate must keep everything (NULL
    scores), never hard-drop a corpus on a degenerate rule gate."""
    from production_ready_ds_spark.queries.llm import quality_classifier_scores

    docs = spark.createDataFrame(
        [(i, "same text every time forever again", "en", "s", 1) for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = quality_classifier_scores(docs).collect()
    assert len(got) == 30
    assert all(r.keep for r in got)
    assert all(r.score is None for r in got)


def test_rrf_surfaces_lexically_disjoint_semantic_hit(spark):
    """The reach fix q_search_rrf exists for: a document SEMANTICALLY
    close to the query seed but sharing NO query term must rank via
    the ANN list — while rerank-only hybrid_topk can never surface it
    (its candidates are BM25 hits by construction)."""
    from production_ready_ds_spark.queries.llm import hybrid_topk, rrf_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha"),
            (1, "alpha beta unrelated words here"),
            (2, "completely different vocabulary entirely"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.99, 0.1, 0.0, 0.0]),  # near doc 0 (the BM25 seed)
        ],
        "doc_id long, embedding array<float>",
    )
    fused = {r.doc_id: r for r in rrf_topk(docs, emb, ("alpha", "beta"), k=3).collect()}
    assert 2 in fused, "no-term-overlap doc must rank through the ANN list"
    assert fused[2].bm25_rank is None and fused[2].ann_rank is not None
    # doc 0 tops both lists -> highest fused score
    assert fused[0].rrf_rank == 1
    hyb = {r.doc_id for r in hybrid_topk(docs, emb, ("alpha", "beta"), k=3).collect()}
    assert 2 not in hyb, "rerank-only hybrid cannot surface it (the documented limit)"


def test_rrf_scores_are_exact_reciprocal_rank_integers(spark):
    """RRF arithmetic contract: score = Σ 1e9 div (60 + rank), exact
    integer division, 0 for a missing list."""
    from production_ready_ds_spark.queries.llm import RRF_K, RRF_NUMER, rrf_topk

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha other"), (2, "nothing shared")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, [0.9, 0.1])],
        "doc_id long, embedding array<float>",
    )
    for r in rrf_topk(docs, emb, ("alpha", "beta"), k=3).collect():
        want = 0
        if r.bm25_rank is not None:
            want += RRF_NUMER // (RRF_K + r.bm25_rank)
        if r.ann_rank is not None:
            want += RRF_NUMER // (RRF_K + r.ann_rank)
        assert r.rrf_score == want, (r.doc_id, r.rrf_score, want)


def test_rrf_ivf_served_ann_list_matches_brute_force(spark, sf_small, tmp_path):
    """Verdict parity: the fusion's semantic list can be served from
    the IVFStore — at nprobe = every list the store's ranking is the
    brute-force ranking, so the fused output is IDENTICAL to
    q_search_rrf's corpus-pass shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from production_ready_ds_spark.operators.ivfstore import IVFStore
    from production_ready_ds_spark.queries.llm import bm25_topk, rrf_topk
    from production_ready_ds_spark.tables import load

    terms = ("spark", "vector")
    k = 10
    docs = load(spark, sf_small, "documents")
    emb = load(spark, sf_small, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    brute = [tuple(r) for r in rrf_topk(docs, emb, terms, k=k).collect()]

    # seed doc: top BM25 hit holding a stored embedding (the rrf_topk
    # convention), served here as a 1-row probe into the vector index
    bm = bm25_topk(docs, terms, k=k)
    seed_id = (
        bm.join(emb, "doc_id").orderBy("rank").limit(1).first().doc_id
    )
    store = IVFStore(str(tmp_path / "ivf"))
    n_lists = store.train(emb, vec_col="embedding")
    store.append(emb, id_min=0, id_max=10**9, id_col="doc_id")
    probe = emb.filter(F.col("doc_id") == seed_id)
    found = store.search(
        probe, top_k=k - 1, nprobe=n_lists, id_col="doc_id"
    )
    # store excludes the probe itself; brute force ranks it first at
    # cos=1 — prepend it and shift the store ranks by one
    neigh = found.select(
        (
            F.row_number().over(
                Window.orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
            )
            + 1
        )
        .cast("long")
        .alias("ann_rank"),
        F.col("neighbor_id").alias("doc_id"),
    )
    seed_row = spark.createDataFrame([(1, seed_id)], "ann_rank long, doc_id long")
    fused = rrf_topk(
        docs, emb, terms, k=k, ann_candidates=seed_row.unionByName(neigh)
    )
    assert [tuple(r) for r in fused.collect()] == brute


def test_readability_separates_simple_from_polysyllabic(spark, tmp_path):
    """The Flesch gate must place short-word simple prose in a higher
    ease band than dense polysyllabic text, count the declared units
    (words / sentence runs / vowel-group syllables, min 1 each), and
    match the hand-computed snap."""
    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran. We all had fun."),
            (2, "Incomprehensibility characterizes interdisciplinary "
                "epistemological institutionalization methodologies."),
            (3, "no punctuation here at all"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from production_ready_ds_spark.queries import catalog

    rows = {
        r.doc_id: r
        for r in catalog()["q_quality_readability"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[1].band == "easy" and rows[2].band == "difficult"
    assert rows[1].ease_x100 > rows[2].ease_x100
    assert rows[2].grade_x100 > rows[1].grade_x100
    # unit counting: doc 1 = 10 words, 3 sentence runs; doc 3 has no
    # terminal punctuation -> sentence floor of 1
    assert (rows[1].n_words, rows[1].n_sentences) == (10, 3)
    assert rows[3].n_sentences == 1
    # hand-check the snap on doc 1 (all monosyllabic)
    assert rows[1].n_syllables == 10
    w_s, syl_w = 10 / 3, 10 / 10
    import math

    want = math.floor((206.835 - 1.015 * w_s - 84.6 * syl_w) * 100 + 0.5)
    assert rows[1].ease_x100 == want


def test_sentence_chunker_windows_overlap_and_clip(spark, tmp_path):
    """q_chunk_sentences on punctuated text (the synthetic corpus has
    none — this is the real-behavior pin): 3-sentence windows starting
    every 2, adjacent chunks share one sentence, the tail clips."""
    spark.createDataFrame(
        [
            (1, "One fish. Two fish! Red fish? Blue fish. Old fish."),
            (2, "Just one sentence here."),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from production_ready_ds_spark.queries import catalog

    rows = catalog()["q_chunk_sentences"].fn(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    # doc 1: 5 sentences -> chunks at offsets 0, 2, 4
    assert sorted(by_doc[1]) == [0, 1, 2]
    assert by_doc[1][0].chunk_text == "One fish Two fish Red fish"
    assert by_doc[1][1].chunk_text == "Red fish Blue fish Old fish"
    assert by_doc[1][2].chunk_text == "Old fish"  # tail clips
    assert [by_doc[1][i].n_sentences for i in (0, 1, 2)] == [3, 3, 1]
    # doc 2: single sentence -> exactly one 1-sentence chunk
    assert sorted(by_doc[2]) == [0]
    assert by_doc[2][0].chunk_text == "Just one sentence here"


def test_fuzzy_search_finds_what_exact_match_cannot(spark, tmp_path):
    """The typo query terms are absent from the corpus vocabulary, so
    BM25/exact matching returns nothing — only the Levenshtein
    comparator surfaces the intended terms, counting every occurrence
    within the distance budget."""
    from production_ready_ds_spark.queries.llm import bm25_topk, fuzzy_topk

    docs = spark.createDataFrame(
        [
            (0, "spark spark query table"),
            (1, "spark hash join"),
            (2, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    assert bm25_topk(docs, ("sparc", "qery"), k=5).count() == 0
    got = {r.doc_id: r for r in fuzzy_topk(docs, ("sparc", "qery"), k=5).collect()}
    assert set(got) == {0, 1}
    assert (got[0].n_hits, got[0].n_terms) == (3, 2)  # spark x2 + query
    assert (got[1].n_hits, got[1].n_terms) == (1, 1)
    assert got[0].rank == 1


def test_rank_eval_metric_bounds(spark, sf_small):
    """IR-metric invariants that hold for ANY corpus: DCG never
    exceeds ideal DCG (so NDCG <= 1.0 scaled), MRR <= 1.0 scaled,
    hits@10 <= hits@20 <= min(n_relevant, 20), and MRR > 0 iff any
    relevant doc was retrieved."""
    from production_ready_ds_spark.queries.llm import q_rank_eval

    row = q_rank_eval(spark, sf_small).collect()[0]
    assert 0 <= row.hits_at_10 <= row.hits_at_20 <= min(row.n_relevant, 20)
    assert row.dcg_scaled <= row.idcg_scaled
    assert 0 <= row.ndcg_scaled <= 1_000_000
    assert 0 <= row.mrr_scaled <= 1_000_000
    assert (row.mrr_scaled > 0) == (row.hits_at_20 > 0)


def test_mmr_rerank_trades_relevance_for_diversity(spark, sf_small, cat):
    """The MMR contract, measured on the operator's own exact
    int8-grid dot similarity: the first pick IS the top-1 (no selected
    set yet, score = relevance), every later pick is a top-20
    candidate, and the selected set's mean pairwise similarity is
    LOWER than plain top-8's (the diversity the operator exists to
    buy), while ranks stay 1..8 per probe."""
    import numpy as np

    from production_ready_ds_spark.tables import load

    mmr = cat["q_sim_topk_mmr"].fn(spark, sf_small).collect()
    assert len(mmr) == 3 * 8
    by_probe = {}
    for r in mmr:
        by_probe.setdefault(r.probe_id, {})[r.rank] = r.neighbor_id
    qv = {}
    for r in load(spark, sf_small, "embeddings").collect():
        e = np.array(r.embedding, dtype=np.float64)
        amax = np.abs(e).max()
        if amax > 0:
            qv[r.vec_id] = np.floor(e / (amax / 127) + 0.5)

    def dot(a, b):
        return int(np.dot(qv[a], qv[b]))

    def mean_pairwise(ids):
        sims = [dot(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return sum(sims) / len(sims)

    for pid, picks in by_probe.items():
        assert sorted(picks) == list(range(1, 9)), "ranks are 1..8"
        rels = sorted(
            ((dot(pid, v), v) for v in qv if v != pid),
            key=lambda t: (-t[0], t[1]),
        )
        top20 = [v for _, v in rels[:20]]
        assert picks[1] == top20[0], "first pick = relevance top-1"
        assert set(picks.values()) <= set(top20), "picks come from the pool"
        mmr_ids = [picks[k] for k in range(1, 9)]
        topk_ids = top20[:8]
        if mmr_ids != topk_ids:
            assert mean_pairwise(mmr_ids) < mean_pairwise(topk_ids), pid


def test_jl_projection_preserves_pairwise_geometry(spark, sf_small, cat):
    """The JL guarantee, measured instead of assumed, at the bounds the
    statistics actually give for 64 -> 16 dims: (1) squared DISTANCES
    concentrate — ||y_a - y_b||^2 / d_out stays within [0.5, 2.0] of
    ||q_a - q_b||^2 for >= 90% of 300 random pairs, median within
    [0.8, 1.25] (the JL statement; estimator sd is ~sqrt(2/16) = 35%);
    (2) dot products still CORRELATE (r > 0.3 — near-orthogonal pairs
    make this the noisy statistic: signal var d_in vs noise var
    d_in^2/d_out predicts r = sqrt(64/(64+256)) = 0.45, so 0.8 would
    be a wrong test, not a stricter one); (3) E[||y||^2] = d_out *
    ||q||^2 within 25% on average (sign rows are unit-variance)."""
    import numpy as np

    from production_ready_ds_spark.tables import load

    rows = cat["q_embed_project"].fn(spark, sf_small).collect()
    proj = {}
    for r in rows:
        proj.setdefault(r.vec_id, [0] * 16)[r.out_dim] = r.component
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_small, "embeddings").collect()
    }
    qv = {}
    for vid, e in emb.items():
        amax = np.abs(e).max()
        if amax > 0:
            qv[vid] = np.floor(e / (amax / 127) + 0.5)
    assert set(proj) == set(qv)

    rng = np.random.RandomState(7)
    ids = sorted(qv)
    orig, prj, dratio = [], [], []
    for _ in range(300):
        a, b = rng.choice(ids, 2, replace=False)
        orig.append(float(np.dot(qv[a], qv[b])))
        prj.append(float(np.dot(proj[a], proj[b])) / 16.0)
        d_orig = float(np.dot(qv[a] - qv[b], qv[a] - qv[b]))
        pa, pb = np.array(proj[a], dtype=np.float64), np.array(proj[b], dtype=np.float64)
        d_proj = float(np.dot(pa - pb, pa - pb)) / 16.0
        dratio.append(d_proj / d_orig)
    dratio = np.array(dratio)
    assert 0.8 < float(np.median(dratio)) < 1.25, np.median(dratio)
    frac_in = float(np.mean((dratio > 0.5) & (dratio < 2.0)))
    assert frac_in >= 0.9, f"only {frac_in:.2%} of pair distances within 2x"
    r = np.corrcoef(orig, prj)[0, 1]
    assert r > 0.3, f"projected dots decorrelated from originals: r={r:.3f}"

    ratios = [
        float(np.dot(proj[v], proj[v])) / (16.0 * float(np.dot(qv[v], qv[v])))
        for v in ids
    ]
    assert 0.75 < float(np.mean(ratios)) < 1.25, np.mean(ratios)


def test_containment_catches_subset_duplication_jaccard_misses(spark):
    """The asymmetric score's reason to exist: doc 0 is quoted WHOLE
    inside doc 1 (plus 4x more text), so containment(0 in 1) = 1.0
    while Jaccard ~ 0.2 sits under the 0.5 threshold — the pair must
    surface in containment_pairs and be absent from jaccard_pairs.
    Unrelated docs surface in neither."""
    from production_ready_ds_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    quote = " ".join(f"tok{i}" for i in range(24))
    wrapper = quote + " " + " ".join(f"pad{i}" for i in range(96))
    other = " ".join(f"zz{i}" for i in range(30))
    d = spark.createDataFrame(
        [(0, quote), (1, wrapper), (2, other)], "doc_id long, text string"
    )
    cont = {
        (r.doc_a, r.doc_b): (r.cont_a_x1e4, r.cont_b_x1e4)
        for r in containment_pairs(d).collect()
    }
    assert (0, 1) in cont
    ca, cb = cont[(0, 1)]
    assert ca == 10000, "the quote is fully contained"
    assert cb < 5000, "the wrapper is mostly NOT the quote"
    assert not any(2 in p for p in cont), "unrelated doc pairs with nothing"
    jac = {(r.doc_a, r.doc_b) for r in jaccard_pairs(d).collect()}
    assert (0, 1) not in jac, "symmetric Jaccard must miss the subset pair"


def test_keep_best_prefers_longest_member_not_min_id(spark, sf_small):
    """q_dedup_keep_best semantics on a constructed family: the most
    complete (longest) member wins even when it carries the LARGEST
    id; ties fall back to the lowest id; kept is true exactly for the
    winner; singleton non-clustered docs never appear."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from production_ready_ds_spark.queries import catalog as _cat
    from production_ready_ds_spark.tables import TABLE_NAMES

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base),                              # family A, short
        (1, base + " today"),                   # family A, longer
        (2, base + " today with extra words"),  # family A, LONGEST, max id
        (3, "totally unrelated text about spark catalyst optimizer rules"),
    ]
    with tempfile.TemporaryDirectory() as d:
        for t in TABLE_NAMES:
            if t != "documents":
                os.symlink(
                    os.path.join(sf_small, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"),
                )
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
            os.path.join(d, "documents.parquet"),
        )
        from production_ready_ds_spark.oracle import run_compare

        r = run_compare(spark, "q_dedup_keep_best", d)
        assert r.ok, r.detail
        got = {
            x.doc_id: (x.cluster_id, x.keep_doc_id, x.kept)
            for x in _cat()["q_dedup_keep_best"].fn(spark, d).collect()
        }
    assert set(got) == {0, 1, 2}, got  # doc 3 is a singleton
    assert all(v[0] == 0 and v[1] == 2 for v in got.values()), got
    assert [got[i][2] for i in (0, 1, 2)] == [False, False, True]


def test_stemmed_search_folds_inflected_forms(spark, sf_small):
    """q_search_stemmed's folding semantics on a constructed corpus:
    documents containing only inflected forms (queries, querying,
    tabled) are found by the stemmed search while the unstemmed BM25
    for the same query terms misses them; a morphologically unrelated
    doc never appears. Also re-verifies the composed oracle on the
    constructed corpus (Porter2 chain + BM25 template end-to-end)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from production_ready_ds_spark.queries import catalog as _cat
    from production_ready_ds_spark.queries.llm import (
        STEM_SEARCH_QUERY,
        bm25_topk,
    )
    from production_ready_ds_spark.oracle import run_compare
    from production_ready_ds_spark.tables import TABLE_NAMES, load

    rows = [
        (0, "queries over large tables need planning and merges"),
        (1, "querying tabled data merged yesterday"),
        (2, "completely unrelated words about spark streams"),
        (3, "the query planner merges table scans"),
    ]
    with tempfile.TemporaryDirectory() as d:
        for t in TABLE_NAMES:
            if t != "documents":
                os.symlink(
                    os.path.join(sf_small, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"),
                )
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
            os.path.join(d, "documents.parquet"),
        )
        r = run_compare(spark, "q_search_stemmed", d)
        assert r.ok, r.detail
        stemmed_hits = {
            x.doc_id: x.n_terms_hit
            for x in _cat()["q_search_stemmed"].fn(spark, d).collect()
        }
        unstemmed = bm25_topk(
            load(spark, d, "documents"), STEM_SEARCH_QUERY
        ).collect()
    assert set(stemmed_hits) == {0, 1, 3}, stemmed_hits
    # folding collapses every inflected variant onto the stem, so all
    # three morphologically-related docs hit ALL THREE terms
    assert all(stemmed_hits[i] == 3 for i in (0, 1, 3)), stemmed_hits
    # the unstemmed engine only counts exact token matches — each doc
    # hits at most its literally-present forms (doc 0: tables+merges,
    # doc 1: querying, doc 3: merges), never all three
    un = {x.doc_id: x.n_terms_hit for x in unstemmed}
    assert un and max(un.values()) < 3, un
    assert un == {0: 2, 1: 1, 3: 1}, un
