"""Misra-Gries heavy-hitters operator (operators/sketch.py): candidate
superset guarantee, bounded output, and the two-pass query's exactness
(the oracle equivalence in test_oracle covers the real corpus; here an
adversarial synthetic distribution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.operators.sketch import misra_gries_candidates


def test_candidates_contain_every_true_heavy_hitter(spark):
    # 3 heavy values (>N/k for k=10) buried in a long tail of uniques,
    # deliberately interleaved and split across partitions
    rows = []
    for i in range(3000):
        rows.append((f"tail_{i}",))
        if i % 5 == 0:
            rows.append(("heavy_a",))
        if i % 7 == 0:
            rows.append(("heavy_b",))
        if i % 9 == 0:
            rows.append(("heavy_c",))
    df = spark.createDataFrame(rows, "token string").repartition(8)
    n = df.count()
    k = 10
    summ = misra_gries_candidates(df, "token", k=k)
    cands = {r.token for r in summ.select("token").collect()}
    # the carried per-partition row counts reconstruct the global N
    total = sum(
        r.part_rows for r in summ.select("part", "part_rows").distinct().collect()
    )
    assert total == n
    true_heavy = {
        r.token
        for r in df.groupBy("token")
        .count()
        .filter(F.col("count") > n / k)
        .collect()
    }
    assert true_heavy  # the fixture actually has heavy hitters
    assert true_heavy <= cands, f"missing: {true_heavy - cands}"


def test_candidate_count_bounded_per_partition(spark):
    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(5000)], "token string"
    ).repartition(4)
    k = 16
    out = misra_gries_candidates(df, "token", k=k).count()
    assert out <= 4 * k, "each partition must emit at most k candidates"


def test_typed_key_column_and_empty_input(spark):
    """The summary keeps the key column's TYPE (a bigint key must not
    come back as string), and an empty frame yields an empty summary
    (not a crash); pagerank likewise returns empty on an empty graph."""
    from production_ready_ds_spark.operators.graph import pagerank

    df = spark.createDataFrame([(i % 7,) for i in range(100)], "key long")
    summ = misra_gries_candidates(df, "key", k=10)
    assert summ.schema["key"].dataType.simpleString() == "bigint"
    assert {r.key for r in summ.select("key").collect()} == set(range(7))

    empty = spark.createDataFrame([], "key long")
    assert misra_gries_candidates(empty, "key", k=10).count() == 0
    no_edges = spark.createDataFrame([], "s string, d string")
    assert pagerank(no_edges).count() == 0


def test_pagerank_conserves_mass_and_ranks_hubs(spark):
    """PageRank sanity on a known topology: a star (hub h connected to
    5 leaves) plus an isolated pair. The hub must outrank every leaf,
    leaves outrank nothing below the pair floor... and total mass stays
    ~1 (symmetrized graph has no dangling nodes)."""
    from production_ready_ds_spark.operators.graph import pagerank

    und = [("h", x) for x in "abcde"] + [("p", "q")]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "s string, d string"
    )
    r = {row.node: row.r for row in pagerank(edges).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9, r
    assert all(r["h"] > r[x] for x in "abcde"), r
    assert r["p"] == r["q"], "symmetric pair must tie exactly"


# ---------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from production_ready_ds_spark.operators.sketch import (
        bloom_bitmap,
        bloom_maybe_expr,
    )

    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(2000)], "sg string"
    )
    bm = bloom_bitmap(members, "sg")
    probe = spark.createDataFrame(
        [(f"m{i}",) for i in range(2000)] + [(f"x{i}",) for i in range(4000)],
        "sg string",
    )
    res = probe.select("sg", bloom_maybe_expr(F.col("sg"), bm).alias("maybe")).collect()
    misses = [r.sg for r in res if r.sg.startswith("m") and not r.maybe]
    assert not misses, f"bloom false negatives: {misses[:5]}"
    fp = sum(1 for r in res if r.sg.startswith("x") and r.maybe)
    # 2k keys in 131072 bits at k=3 → designed fpp ≪ 1%; allow 10× slack
    assert fp < 0.01 * 4000, f"false-positive rate out of bounds: {fp}/4000"


def test_bloom_bitmap_size_is_constant(spark):
    """The driver collect behind bloom_bitmap is bounded by m/32 words
    regardless of input size — the property that makes it driver-safe
    at any corpus scale."""
    from production_ready_ds_spark.operators.sketch import (
        BLOOM_M_BITS,
        bloom_bitmap,
    )

    small = bloom_bitmap(
        spark.createDataFrame([("a",)], "sg string"), "sg"
    )
    big = bloom_bitmap(
        spark.createDataFrame([(f"v{i}",) for i in range(20000)], "sg string"), "sg"
    )
    assert len(small.words) == len(big.words) == BLOOM_M_BITS // 32
    # k rides with the bitmap so test-side hashing can't desync (ADVICE r3)
    assert small.k == big.k == 3


def test_decontaminate_bloom_matches_exact_and_never_broadcasts_probe(spark, sf_small):
    """q_decontaminate_bloom must equal q_decontaminate row-for-row (the
    bloom stage is an exact-preserving prefilter) while its verify join
    takes the no-broadcast path the query exists to demonstrate."""
    from production_ready_ds_spark.plans.audit import explain_str
    from production_ready_ds_spark.queries import catalog

    cat = catalog()
    exact = cat["q_decontaminate"].fn(spark, sf_small)
    bloom = cat["q_decontaminate_bloom"].fn(spark, sf_small)
    assert sorted(exact.collect()) == sorted(bloom.collect())
    s = explain_str(bloom)
    assert "ShuffledHashJoin" in s and "LeftSemi" in s, s
    # the probe set must reach the semi join WITHOUT a broadcast: the
    # only allowed broadcast is the final small doc_id-level join if AQE
    # picks one, never a LeftSemi build side
    import re

    assert not re.search(r"BroadcastHashJoin .*LeftSemi", s), s


def test_bloom_prefilter_composes_with_streaming(spark, sf_small):
    """The q_stream_decontaminate docstring claims the bloom bitmap test
    composes into the streaming path unchanged (it is a stream-static
    broadcast join + map-side filter). Prove it: a streaming
    bloom-prefiltered shingle stream must keep EVERY truly-overlapping
    shingle (no false negatives) and match the batch prefilter row set."""
    import os
    import uuid

    from production_ready_ds_spark.operators.dedup import shingled_docs
    from production_ready_ds_spark.operators.sketch import (
        bloom_bitmap,
        bloom_m_for,
        bloom_prefilter,
    )
    from production_ready_ds_spark.streaming.events import _as_stream_dir
    from production_ready_ds_spark.tables import load

    d = load(spark, sf_small, "documents")
    probe_sg = shingled_docs(d.filter(F.col("doc_id") % 20 == 0)).select("sg").distinct()
    m = bloom_m_for(probe_sg.count())
    bitmap = bloom_bitmap(probe_sg, "sg", m_bits=m)

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .load(_as_stream_dir(os.path.join(sf_small, "documents.parquet")))
        .filter(F.col("doc_id") % 20 != 0)
    )
    name = f"bloom_stream_{uuid.uuid4().hex[:8]}"
    q = (
        bloom_prefilter(shingled_docs(stream), "sg", bitmap)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {(r.doc_id, r.sg) for r in spark.table(name).collect()}

    batch_corpus = shingled_docs(d.filter(F.col("doc_id") % 20 != 0))
    batch = {
        (r.doc_id, r.sg)
        for r in bloom_prefilter(batch_corpus, "sg", bitmap).collect()
    }
    true_hits = {
        (r.doc_id, r.sg)
        for r in batch_corpus.join(probe_sg, "sg", "left_semi").collect()
    }
    assert streamed == batch
    assert true_hits <= streamed, "bloom prefilter dropped a true overlap"


# ------------------------------------------------------------ count-min


def test_cms_merges_exactly(spark):
    """union(cms(a), cms(b)) re-aggregated must equal cms(a ∪ b) cell
    for cell — the mergeable-summaries contract that lets per-partition
    / per-batch sketches compose at any scale."""
    from production_ready_ds_spark.operators.sketch import cms_table

    a = spark.createDataFrame([(f"t{i % 50}",) for i in range(500)], "token string")
    b = spark.createDataFrame([(f"t{i % 30}",) for i in range(300)], "token string")
    merged = (
        cms_table(a, "token")
        .union(cms_table(b, "token"))
        .groupBy("seed", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_table(a.union(b), "token")
    assert sorted(merged.collect()) == sorted(whole.collect())


def test_cms_never_undercounts_and_zero_for_absent(spark):
    from production_ready_ds_spark.operators.sketch import cms_estimate, cms_table

    items = spark.createDataFrame(
        [(f"v{i % 100}",) for i in range(2000)], "token string"
    )
    cms = cms_table(items, "token")
    probes = spark.createDataFrame(
        [(f"v{i}",) for i in range(100)] + [("absent_key_xyz",)], "token string"
    )
    true_counts = {r.token: r["count"] for r in items.groupBy("token").count().collect()}
    for r in cms_estimate(cms, probes, "token").collect():
        true = true_counts.get(r.token, 0)
        assert r.est >= true, f"CMS undercounted {r.token}: {r.est} < {true}"
    # an absent key CAN still collide, but with w=2048 and 100 distinct
    # values the expected collision mass is tiny — just assert the
    # estimate is bounded, not necessarily zero
    est_absent = {
        r.token: r.est
        for r in cms_estimate(cms, probes, "token").collect()
    }["absent_key_xyz"]
    assert est_absent <= 2000 * 16 / 2048


# ---------------------------------------------------------------- theta --


def test_theta_intersection_tracks_exact_on_heavy_overlap(spark, tmp_path):
    """KMV intersection estimate must land within 4-sigma of the exact
    count on a constructed heavy-overlap pair (k=256 -> sigma ~ 6%),
    and the exact column must reflect the built overlap."""
    import os
    import random

    from production_ready_ds_spark.queries import catalog

    rng = random.Random(11)
    shared = [f"sh{rng.randrange(10**9)}" for _ in range(4000)]
    rows, did = [], 0
    for source, extra_tag in [("A", "a"), ("B", "b")]:
        # 40 docs of 100 shared tokens each + a unique tail per source
        for i in range(40):
            toks = shared[i * 100 : (i + 1) * 100] + [
                f"{extra_tag}{rng.randrange(10**9)}" for _ in range(20)
            ]
            rows.append((did, " ".join(toks), "en", source, 1))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "theta_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    out = catalog()["q_sketch_theta"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r.exact_intersection > 3000, r  # the shared shingles are there
    rel = abs(r.est_intersection - r.exact_intersection) / r.exact_intersection
    assert rel < 0.25, (r.est_intersection, r.exact_intersection, rel)


def test_theta_kmv_sketches_merge(spark):
    """KMV mergeability (the family contract): the k smallest of the
    UNION of two sketches equals the sketch of the unioned input —
    the property that lets per-partition/per-batch sketches compose."""
    from pyspark.sql import Window

    k = 64

    def kmv(df):
        w = Window.orderBy("h")
        return {
            r.h
            for r in df.select("h").distinct()
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .collect()
        }

    a = spark.createDataFrame([(F"a{i}",) for i in range(500)], "v string").select(
        F.xxhash64("v").alias("h")
    )
    b = spark.createDataFrame([(F"b{i}",) for i in range(500)], "v string").select(
        F.xxhash64("v").alias("h")
    )
    merged = sorted(kmv(a) | kmv(b))[:k]
    whole = sorted(kmv(a.unionAll(b)))
    assert merged == whole


def test_hll_cube_union_matches_direct_sketch(spark, sf_small):
    """The q_sketch_cube serving path: merging per-day HLL sketches
    over a date range must estimate EXACTLY what a sketch built
    directly on the range estimates (DataSketches union is
    state-lossless at equal lgConfigK) — the property that makes a
    sketch cube answer range queries without re-scanning events. The
    contract booleans must also all hold."""
    from production_ready_ds_spark.queries import catalog
    from production_ready_ds_spark.queries.events import (
        CUBE_WINDOW_HI,
        CUBE_WINDOW_LO,
    )
    from production_ready_ds_spark.tables import load

    rows = catalog()["q_sketch_cube"].fn(spark, sf_small).collect()
    assert rows and all(r.within_rel_error for r in rows)
    e = load(spark, sf_small, "events")
    lo = F.lit(CUBE_WINDOW_LO).cast("timestamp_ntz")
    hi = F.lit(CUBE_WINDOW_HI).cast("timestamp_ntz")
    cube = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = (
        cube.filter((F.col("day") >= lo) & (F.col("day") < hi))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m"))
    )
    direct = (
        e.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d"))
    )
    got = merged.join(direct, "event_type").collect()
    assert got and all(r.m == r.d for r in got)
