"""Constructed-data semantics tests for the sampling / normalization /
curriculum operators added in round 3.

The oracle harness already proves cross-engine value equality on the
driver testdata; these tests pin the operators' SEMANTIC claims on
hand-built corpora where the expected answer is computable by eye
(the test pattern SURVEY.md §5.2(5) calls for).
"""

from __future__ import annotations

import os

import pytest

from production_ready_ds_spark.queries import catalog


@pytest.fixture(scope="module")
def cat():
    return catalog()


@pytest.fixture()
def doc_dir(spark, tmp_path):
    """A tiny documents table written as <dir>/documents.parquet so the
    catalog queries (which load via tables.load) run on constructed data."""

    def make(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        d = str(tmp_path / "sf_constructed")
        os.makedirs(d, exist_ok=True)
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        return d

    return make


def test_dedup_normalized_merges_rerenders(spark, cat, doc_dir):
    """Case/punctuation/whitespace re-renders collapse to ONE family
    with the min doc_id as keeper; genuinely different text stays
    separate. Exact dedup (q_dedup_exact) would find nothing here."""
    d = doc_dir(
        [
            (1, "Hello, World!", "en", "a", 13),
            (2, "hello world", "en", "a", 11),
            (3, "HELLO -- WORLD\n", "en", "b", 15),
            (4, "goodbye world", "en", "a", 13),
        ]
    )
    rows = cat["q_dedup_normalized"].fn(spark, d).collect()
    fams = {r.keeper_id: r.family_size for r in rows}
    assert fams == {1: 3, 4: 1}


def test_sample_quota_exact_counts_and_determinism(spark, sf_small, cat):
    from production_ready_ds_spark.queries.traindata import SOURCE_QUOTA
    from production_ready_ds_spark.tables import load

    out = cat["q_sample_quota"].fn(spark, sf_small).collect()
    per_source: dict[str, int] = {}
    for r in out:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    totals = {
        r.source: r.n
        for r in load(spark, sf_small, "documents").groupBy("source").count()
        .withColumnRenamed("count", "n").collect()
    }
    for src, n_total in totals.items():
        assert per_source.get(src, 0) == min(SOURCE_QUOTA, n_total)
    # determinism: a second run picks the identical doc set
    again = cat["q_sample_quota"].fn(spark, sf_small).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)


def test_curriculum_stages_balanced_and_ordered(spark, sf_small, cat):
    """ntile invariants: per source the stage sizes differ by at most 1,
    and mean diversity is non-increasing stage over stage (stage 1 is
    the cleanest slice by construction)."""
    rows = cat["q_curriculum_order"].fn(spark, sf_small).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.stage)
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1, (src, sizes)
        divs = [r.avg_diversity for r in rs]
        assert divs == sorted(divs, reverse=True), (src, divs)


def test_char_collision_extremes(spark, cat, doc_dir):
    """'aaaa' collides with probability 1; 'abab' at 0.5; empty docs are
    filtered out rather than dividing by zero."""
    d = doc_dir(
        [
            (1, "aaaa", "en", "a", 4),
            (2, "abab", "en", "a", 4),
            (3, "", "en", "a", 0),
        ]
    )
    rows = {r.doc_id: r for r in cat["q_char_collision"].fn(spark, d).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].collision_prob == 1.0
    assert rows[2].collision_prob == 0.5
    assert rows[1].n_distinct_chars == 1 and rows[2].n_distinct_chars == 2


def test_ngram_profile_counts(spark, cat, doc_dir):
    """Trigram counts on a constructed doc: 'aaab' → aaa, aab; the
    per-lang rank orders by count desc then trigram asc."""
    d = doc_dir(
        [
            (1, "aaab", "en", "a", 4),
            (2, "aaab", "en", "a", 4),
            (3, "xy", "de", "a", 2),  # too short: filtered
        ]
    )
    rows = cat["q_ngram_lang_profile"].fn(spark, d).collect()
    en = {(r.trigram, r.n, r.rnk) for r in rows if r.lang == "en"}
    assert en == {("aaa", 2, 1), ("aab", 2, 2)}
    assert not [r for r in rows if r.lang == "de"]


def test_winnow_pairs_detects_shared_span(spark, cat, doc_dir):
    """The winnowing guarantee: a shared run of >= K+W-1 tokens selects
    at least one common fingerprint, so docs 1/2 (same 12-token passage
    embedded in different surroundings) must pair; doc 3 (no shared
    span) must pair with neither."""
    span = "the quick brown fox jumps over the lazy dog near the river"
    d = doc_dir(
        [
            (1, "alpha beta gamma " + span + " delta epsilon zeta", "en", "a", 0),
            (2, "one two three four five " + span + " six seven", "en", "a", 0),
            (3, "completely unrelated text with nothing shared at all "
                "whatsoever in any window of tokens anywhere", "en", "a", 0),
        ]
    )
    rows = cat["q_winnow_pairs"].fn(spark, d).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_leakage_safe_split_keeps_families_together(spark, tmp_path):
    """Every near-dup family must land wholly on one side of the
    split, and the per-doc split must be deterministic. Build 3 copied
    families + unique docs; assert no family straddles train/eval."""
    import os
    import random

    from production_ready_ds_spark.queries import catalog

    rng = random.Random(9)
    rows = []
    doc_id = 0
    families = []
    for f in range(3):
        base = " ".join(f"f{f}w{rng.randrange(3000)}" for _ in range(120))
        fam = []
        for c in range(4):  # 4 near-copies per family
            text = base + f" tail{f}c{c}"
            rows.append((doc_id, text, "en", "s", len(text)))
            fam.append(doc_id)
            doc_id += 1
        families.append(fam)
    for _ in range(20):  # unique filler
        text = " ".join(f"u{rng.randrange(10**6)}" for _ in range(60))
        rows.append((doc_id, text, "en", "s", len(text)))
        doc_id += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "split_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    fn = catalog()["q_split_leakage_safe"].fn
    got = {r.doc_id: r for r in fn(spark, sf_dir).collect()}
    assert len(got) == len(rows)
    for fam in families:
        splits = {got[d].split for d in fam}
        clusters = {got[d].cluster_id for d in fam}
        assert len(splits) == 1, f"family straddles the split: {fam}"
        assert clusters == {min(fam)}
    again = {r.doc_id: r.split for r in fn(spark, sf_dir).collect()}
    assert again == {d: r.split for d, r in got.items()}


def test_pack_bestfit_shelf_invariants(spark, doc_dir, cat):
    """Harmonic shelf packing on a constructed corpus: (a) no shelf can
    overflow the budget (k docs of class k each fit budget/k), so
    fill_permille <= 1000; (b) lang_bins >= concat_bins — the
    fractional concat baseline lower-bounds any whole-doc packing;
    (c) class bin counts equal ceil(count/k) computed by hand."""
    import math

    from production_ready_ds_spark.queries.traindata import SEQ_BUDGET

    # doc of w words => w tokens: build classes around the boundaries
    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    rows, did = [], 0
    for n, copies in [(600, 2), (512, 1), (300, 3), (171, 4), (100, 7), (1, 5)]:
        for c in range(copies):
            rows.append((did, words(n, f"d{did}_"), "en", "s", 1))
            did += 1
    sf_dir = doc_dir(rows)
    out = cat["q_pack_bestfit"].fn(spark, sf_dir).collect()
    assert out
    by_class = {r.size_class: r for r in out}
    for r in out:
        # classes of docs that individually fit can never overflow;
        # class 1 may exceed 1000 permille only via oversized
        # (>budget) singleton docs — the documented carve-out
        if r.size_class >= 2:
            assert r.fill_permille <= 1000, r
        assert r.lang_bins >= r.concat_bins, r
        k = r.size_class
        assert r.n_bins == math.ceil(r.n_docs / k), r
    # hand math: n>=512 -> class 1; 300 -> floor(512/300)=1; 171 -> 2
    # (512/171=2.99); 100 -> 5; 1 -> 512
    assert by_class[1].n_docs == 2 + 1 + 3
    assert by_class[2].n_docs == 4 and by_class[2].n_bins == 2
    assert by_class[5].n_docs == 7 and by_class[5].n_bins == 2
    assert by_class[512].n_docs == 5 and by_class[512].n_bins == 1


def test_mix_temperature_flattens_head(spark, doc_dir, cat):
    """The smallest language must be kept whole (rate 1) and larger
    languages downsampled at (n_min/n)^(1-alpha), realized within
    binomial 4-sigma of the snapped threshold."""
    rows, did = [], 0
    for lang, n in [("en", 1600), ("de", 400), ("fr", 100)]:
        for _ in range(n):
            rows.append((did, f"w{did} x{did} y{did}", lang, "s", 1))
            did += 1
    sf_dir = doc_dir(rows)
    got = {r.lang: r for r in cat["q_mix_temperature"].fn(spark, sf_dir).collect()}
    assert got["fr"].thresh == 65536 and got["fr"].n_kept == 100  # kept whole
    for lang, n in [("en", 1600), ("de", 400)]:
        r = got[lang]
        rate = (100 / n) ** 0.3
        assert r.thresh == int(rate * 65536 + 0.5)
        p = r.thresh / 65536
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(r.n_kept - n * p) <= 4 * sigma, (lang, r.n_kept, n * p, sigma)
    # monotone: bigger language -> smaller keep rate
    assert got["en"].thresh < got["de"].thresh < got["fr"].thresh


def test_pack_bestfit_assign_never_overflows_and_matches_report(spark, doc_dir, cat):
    """Every realized bin's token sum must fit the budget, and the
    membership's bin counts must equal q_pack_bestfit's capacity
    report bin-for-bin."""
    from collections import defaultdict

    from production_ready_ds_spark.queries.traindata import SEQ_BUDGET

    rows = []
    for did in range(120):
        n = 30 + (did * 37) % 400  # varied doc lengths across classes
        rows.append((did, " ".join(f"t{did}_{i}" for i in range(n)), "en", "s", 1))
    rows.append((500, " ".join(f"big{i}" for i in range(700)), "en", "s", 1))
    sf_dir = doc_dir(rows)
    assign = cat["q_pack_bestfit_assign"].fn(spark, sf_dir).collect()
    sums = defaultdict(int)
    docs_per_bin = defaultdict(int)
    for r in assign:
        sums[(r.lang, r.size_class, r.bin_id)] += r.n_tokens
        docs_per_bin[(r.lang, r.size_class, r.bin_id)] += 1
    for key, s in sums.items():
        # the invariant with its one carve-out: any overflowing shelf
        # must be a SINGLETON in class 1 holding a doc that is itself
        # over budget; every multi-doc shelf fits
        if s > SEQ_BUDGET:
            assert docs_per_bin[key] == 1 and key[1] == 1, (key, s)
        if docs_per_bin[key] > 1:
            assert s <= SEQ_BUDGET, (key, s)
    big = next(r for r in assign if r.doc_id == 500)
    assert big.size_class == 1 and big.n_tokens == 700
    assert docs_per_bin[("en", 1, big.bin_id)] == 1, "oversized doc must sit alone"
    report = {
        (r.lang, r.size_class): r.n_bins
        for r in cat["q_pack_bestfit"].fn(spark, sf_dir).collect()
    }
    realized = defaultdict(set)
    for lang, k, b in sums:
        realized[(lang, k)].add(b)
    assert {kk: len(v) for kk, v in realized.items()} == report
