"""TermStore (operators/termstore.py): the persistent inverted index
must score BIT-IDENTICALLY to the corpus-scan BM25 (integer equality,
not approximation), stay exact under incremental appends, skip
re-appends idempotently, and read O(query terms) postings (pushed
In(term) over term-clustered segments)."""

from __future__ import annotations

import pytest

from production_ready_ds_spark.operators.termstore import TermStore
from production_ready_ds_spark.queries.llm import bm25_topk
from production_ready_ds_spark.tables import load


def _results(df):
    return [tuple(r) for r in df.collect()]


def test_indexed_search_equals_corpus_scan(spark, sf_small, tmp_path):
    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9)
    for terms in [("spark", "query", "vector"), ("join",), ("table", "hash")]:
        scan = _results(bm25_topk(docs, terms, k=15))
        indexed = _results(store.search(spark, terms, k=15))
        assert indexed == scan, terms
    # manifest stats equal the corpus aggregates the scan path computes
    n, sumdl = store.stats()
    assert n == docs.count()


def test_incremental_appends_equal_one_shot(spark, sf_small, tmp_path):
    """Two id-ranged appends must produce the same manifest statistics
    and the same search integers as one whole-corpus append — and both
    equal the scan path (the sigstore incremental evidence form)."""
    docs = load(spark, sf_small, "documents")
    lo = docs.filter("doc_id < 250")
    hi = docs.filter("doc_id >= 250")
    inc = TermStore(str(tmp_path / "inc"))
    assert inc.append(lo, id_min=0, id_max=249)
    assert inc.append(hi, id_min=250, id_max=10**9)
    one = TermStore(str(tmp_path / "one"))
    assert one.append(docs, id_min=0, id_max=10**9)
    assert inc.stats() == one.stats()
    terms = ("spark", "vector")
    want = _results(bm25_topk(docs, terms, k=10))
    assert _results(inc.search(spark, terms, k=10)) == want
    assert _results(one.search(spark, terms, k=10)) == want
    # compaction folds segments without changing a single integer
    assert inc.compact(spark) == 1
    assert inc.stats() == one.stats()
    assert _results(inc.search(spark, terms, k=10)) == want


def test_append_is_idempotent_on_indexed_range(spark, sf_small, tmp_path):
    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9)
    assert not store.append(
        docs, id_min=0, id_max=10**9, skip_if_range_indexed=True
    )
    assert len(store.segments()) == 1


def test_postings_read_is_query_terms_only(spark, sf_small, tmp_path):
    from production_ready_ds_spark.plans.audit import pushed_filters

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    store.append(docs, id_min=0, id_max=10**9)
    post = store.read_postings(spark, ["spark", "vector"])
    pushed = " ".join(pushed_filters(post))
    assert "term" in pushed and "In(" in pushed, pushed
    assert {r.term for r in post.select("term").distinct().collect()} <= {
        "spark",
        "vector",
    }


def test_streaming_ingest_equals_batch_build(spark, sf_small, tmp_path):
    """TermStore.append composes with Structured Streaming's
    foreachBatch — the online-indexing shape: each micro-batch of
    documents tokenizes and appends as its own postings segment, the
    manifest accumulates the batch statistics, and the resulting index
    answers searches with the SAME integers as a one-shot build (and
    therefore as the corpus scan) — the IVFStore streaming-ingest
    evidence form applied to full-text search."""
    import os

    from pyspark.sql import functions as F

    from production_ready_ds_spark.streaming.events import _as_stream_dir

    docs = load(spark, sf_small, "documents")
    one = TermStore(str(tmp_path / "one"))
    one.append(docs, id_min=0, id_max=10**9)

    store = TermStore(str(tmp_path / "stream"))

    def ingest(batch_df, batch_id):
        ids = batch_df.agg(F.min("doc_id"), F.max("doc_id")).first()
        if ids[0] is not None:
            store.append(batch_df, id_min=ids[0], id_max=ids[1])

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(_as_stream_dir(os.path.join(sf_small, "documents.parquet")))
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert store.segments(), "streaming ingest must register segments"
    assert store.stats() == one.stats()
    terms = ("spark", "query", "vector")
    assert _results(store.search(spark, terms, k=10)) == _results(
        one.search(spark, terms, k=10)
    )


def test_phrase_search_equals_corpus_scan(spark, sf_small, tmp_path):
    """The positional index's phrase search must return the EXACT
    integers of the corpus-scan q_search_phrase (counts, first
    positions, ranking), and a 3-token constructed phrase must
    intersect across all three terms' position lists."""
    from production_ready_ds_spark.queries import catalog
    from production_ready_ds_spark.queries.llm import PHRASE_QUERY

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    store.append(docs, id_min=0, id_max=10**9)
    scan = _results(catalog()["q_search_phrase"].fn(spark, sf_small))
    assert scan, "fixture phrase must occur in the corpus"
    assert _results(store.search_phrase(spark, PHRASE_QUERY, k=20)) == scan

    # constructed corpus: 3-token phrase with a repeated first term,
    # multiple hits, and a decoy doc with the terms NON-consecutive
    rows = [
        (1, "alpha beta gamma alpha beta gamma", "en", "s", 1),
        (2, "alpha beta delta gamma", "en", "s", 1),  # broken sequence
        (3, "x alpha beta gamma y", "en", "s", 1),
        (4, "alpha gamma beta", "en", "s", 1),  # all terms, wrong order
    ]
    d2 = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    s2 = TermStore(str(tmp_path / "p3"))
    s2.append(d2, id_min=0, id_max=10)
    got = _results(s2.search_phrase(spark, ("alpha", "beta", "gamma"), k=10))
    # doc 1: hits at positions 1 and 4; doc 3: hit at position 2
    assert got == [(1, 1, 2, 1), (2, 3, 1, 2)]


def test_phrase_and_bm25_index_equivalence_random_corpora(spark, tmp_path):
    """Property check over randomized small corpora (tiny vocabulary →
    dense phrase collisions, duplicate terms, repeated tokens inside a
    doc): for every draw, BOTH index paths must equal their scan
    twins exactly — BM25 integers and phrase hit counts/positions."""
    import random

    from production_ready_ds_spark.queries.llm import bm25_topk, phrase_topk

    rng = random.Random(13)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(3):
        rows = []
        for doc_id in range(30):
            n = rng.randint(0, 12)
            rows.append(
                (doc_id, " ".join(rng.choice(vocab) for _ in range(n)), "en", "s", 1)
            )
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        store = TermStore(str(tmp_path / f"t{trial}"))
        assert store.append(docs, id_min=0, id_max=100)
        terms = ("aa", "cc")
        assert _results(store.search(spark, terms, k=30)) == _results(
            bm25_topk(docs, terms, k=30)
        ), trial
        phrase = ("bb", "aa")
        assert _results(store.search_phrase(spark, phrase, k=30)) == _results(
            phrase_topk(docs, phrase, k=30)
        ), trial


def test_append_rejects_ids_outside_declared_range(spark, sf_small, tmp_path):
    """A mis-declared [id_min, id_max] + skip_if_range_indexed would
    silently drop a future overlapping batch (stats AND postings
    missing) while search keeps returning confidently wrong integers —
    append fails loudly instead, and writes nothing."""
    import pytest

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "rng"))
    with pytest.raises(ValueError, match="escape"):
        store.append(docs, id_min=0, id_max=3)
    assert store.segments() == []


def test_delete_ids_scores_equal_fresh_rebuild(spark, sf_small, tmp_path):
    """RTBF parity: delete-then-search must return the IDENTICAL
    integers to rebuild-without-the-docs-then-search — postings gone
    AND manifest n_docs/sum_dl decremented (stale stats would shift
    every idf/avgdl and drift the scores)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_small, "documents")
    victims = [r.doc_id for r in docs.select("doc_id").orderBy("doc_id").limit(7).collect()]

    deleted = TermStore(str(tmp_path / "del"))
    # two segments so deletion exercises the only-affected-rewrite path
    assert deleted.append(docs.filter(F.col("doc_id") < 250), id_min=0, id_max=249)
    assert deleted.append(docs.filter(F.col("doc_id") >= 250), id_min=250, id_max=10**9)
    assert deleted.delete_ids(spark, victims) == 1  # victims live in seg 0 only

    fresh = TermStore(str(tmp_path / "fresh"))
    assert fresh.append(docs.filter(~F.col("doc_id").isin(victims)), id_min=0, id_max=10**9)

    assert deleted.stats() == fresh.stats()
    for terms in [("spark", "query", "vector"), ("join",), ("table", "hash")]:
        assert _results(deleted.search(spark, terms, k=15)) == _results(
            fresh.search(spark, terms, k=15)
        ), terms
    assert _results(deleted.search_phrase(spark, ("table", "hash"), k=15)) == _results(
        fresh.search_phrase(spark, ("table", "hash"), k=15)
    )
    # deleted ids can never surface again
    hits = {r.doc_id for r in deleted.search(spark, ("spark", "query"), k=100).collect()}
    assert not (hits & set(victims))


def test_delete_ids_survives_compact_and_empty_segment_drop(spark, sf_small, tmp_path):
    """Deleting EVERY doc of a segment drops it from the manifest (an
    empty parquet dir would poison later reads), and compaction after
    deletion preserves both scores and stats."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "drop"))
    assert store.append(docs.filter(F.col("doc_id") < 20), id_min=0, id_max=19)
    assert store.append(docs.filter(F.col("doc_id") >= 20), id_min=20, id_max=10**9)
    assert store.delete_ids(spark, list(range(20))) == 1
    assert len(store.segments()) == 1  # seg 0 emptied -> dropped
    fresh = TermStore(str(tmp_path / "fresh2"))
    assert fresh.append(docs.filter(F.col("doc_id") >= 20), id_min=0, id_max=10**9)
    assert store.stats() == fresh.stats()
    before = _results(store.search(spark, ("spark", "vector"), k=10))
    assert before == _results(fresh.search(spark, ("spark", "vector"), k=10))
    assert store.compact(spark) == 1
    assert store.stats() == fresh.stats()
    assert _results(store.search(spark, ("spark", "vector"), k=10)) == before


def test_compact_tiered_preserves_scores_and_stats(spark, sf_small, tmp_path):
    """LSM leveled fold (sigstore-kernel parity): 9 per-50-doc appends
    with fanout 4 must cascade into few segments while BM25/phrase
    integers and manifest stats stay exactly those of a one-shot
    build — including the doc-length sidecar, so delete_ids still
    decrements exactly AFTER tiered folds."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "lsm"))
    for lo in range(0, 450, 50):
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 50))
        assert store.append(batch, id_min=lo, id_max=lo + 49)
        store.compact_tiered(spark, fanout=4)
    assert store.append(
        docs.filter(F.col("doc_id") >= 450), id_min=450, id_max=10**9
    )
    n_segs = store.compact_tiered(spark, fanout=4)
    assert n_segs == len(store.segments()) < 10

    one = TermStore(str(tmp_path / "one"))
    assert one.append(docs, id_min=0, id_max=10**9)
    assert store.stats() == one.stats()
    terms = ("spark", "query", "vector")
    assert _results(store.search(spark, terms, k=15)) == _results(
        one.search(spark, terms, k=15)
    )
    assert _results(store.search_phrase(spark, ("table", "hash"), k=10)) == _results(
        one.search_phrase(spark, ("table", "hash"), k=10)
    )
    # the sidecar survived the folds: deletion still equals a rebuild
    victims = [0, 1, 2]
    store.delete_ids(spark, victims)
    fresh = TermStore(str(tmp_path / "fresh"))
    assert fresh.append(
        docs.filter(~F.col("doc_id").isin(victims)), id_min=0, id_max=10**9
    )
    assert store.stats() == fresh.stats()
    assert _results(store.search(spark, terms, k=15)) == _results(
        fresh.search(spark, terms, k=15)
    )


def test_append_derives_bounds_from_batch(spark, sf_small, tmp_path):
    """Omitting id_min/id_max derives the segment range from the
    batch's own min/max doc_id (free — the stats pass computes them
    anyway), and skip_if_range_indexed still dedupes a replayed
    derived-bounds batch; mixing one bound with the other is an
    error."""
    import pytest
    from pyspark.sql import functions as F

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "auto"))
    batch = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    assert store.append(batch)
    seg = store.segments()[0]
    assert (seg["id_min"], seg["id_max"]) == (100, 199)
    assert store.append(batch, skip_if_range_indexed=True) is False
    with pytest.raises(ValueError, match="both"):
        store.append(batch, id_min=0)
    # derived-bounds store scores identically to an explicit-bounds one
    explicit = TermStore(str(tmp_path / "explicit"))
    assert explicit.append(batch, id_min=100, id_max=199)
    assert store.stats() == explicit.stats()
    assert _results(store.search(spark, ("spark",), k=10)) == _results(
        explicit.search(spark, ("spark",), k=10)
    )


def test_prefix_search_equals_scan_and_pushes_range(spark, sf_small, tmp_path):
    """TermStore.search_prefix must return the scan path's exact
    integers, and its postings read must push RANGE predicates on
    term (the dictionary-range read the term clustering exists for —
    range pushdown, not just In())."""
    from production_ready_ds_spark.plans.audit import pushed_filters
    from production_ready_ds_spark.queries.llm import prefix_topk

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "pfx"))
    assert store.append(docs, id_min=0, id_max=10**9)
    for prefix in ("s", "qu", "t"):
        scan = _results(prefix_topk(docs, prefix, k=15))
        indexed = _results(store.search_prefix(spark, prefix, k=15))
        assert indexed == scan, prefix
    post = store.read_postings_range(spark, "s", "t")
    pushed = " ".join(pushed_filters(post))
    assert "GreaterThanOrEqual(term" in pushed and "LessThan(term" in pushed, pushed
    got = {r.term for r in post.select("term").distinct().collect()}
    assert got and all(t.startswith("s") for t in got)


def test_fuzzy_search_equals_scan(spark, sf_small, tmp_path):
    """TermStore.search_fuzzy (dictionary pass + In-pruned postings)
    must return the scan path's exact integers, and an
    impossible-to-match query yields an empty frame with the right
    schema, not an error."""
    from production_ready_ds_spark.queries.llm import fuzzy_topk

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "fz"))
    assert store.append(docs, id_min=0, id_max=10**9)
    for terms in [("sparc", "qery"), ("tble",), ("windoq", "streem")]:
        scan = _results(fuzzy_topk(docs, terms, k=15))
        indexed = _results(store.search_fuzzy(spark, terms, k=15))
        assert indexed == scan, terms
    empty = store.search_fuzzy(spark, ("zzzzzzzzzz",), k=5)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["rank", "doc_id", "n_hits", "n_terms"]


def test_boolean_search_equals_scan(spark, sf_small, tmp_path):
    """Postings-algebra boolean retrieval must be integer-equal to the
    corpus scan for every clause shape: conjunction only, with
    negation, a term repeated across clauses (MUST wins), and an
    absent must term (empty result on BOTH paths)."""
    from production_ready_ds_spark.queries.llm import boolean_topk

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9)
    cases = [
        (("spark", "vector"), ()),
        (("spark", "vector"), ("stream",)),
        (("join",), ("spark", "vector")),
        (("spark", "spark"), ("spark",)),  # dedup + MUST-wins rule
        (("zzz_not_a_term", "spark"), ()),  # absent must term → empty
    ]
    for must, must_not in cases:
        scan = _results(boolean_topk(docs, must, must_not, k=15))
        indexed = _results(store.search_boolean(spark, must, must_not, k=15))
        assert indexed == scan, (must, must_not)
    assert not _results(
        store.search_boolean(spark, ("zzz_not_a_term", "spark"), (), k=15)
    )


def test_proximity_search_equals_scan(spark, sf_small, tmp_path):
    """Positional proximity must be integer-equal to the corpus scan
    across slop settings, and must agree with exact-phrase matching
    at the boundary: every doc where the bigram 'table hash' occurs
    has min_dist == 1 for proximity('table','hash')."""
    from production_ready_ds_spark.queries.llm import phrase_topk, proximity_topk

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9)
    for slop in (1, 4, 50):
        scan = _results(proximity_topk(docs, ("spark", "vector"), slop=slop, k=15))
        indexed = _results(
            store.search_proximity(spark, ("spark", "vector"), slop=slop, k=15)
        )
        assert indexed == scan, slop
    assert scan, "fixture pair must co-occur somewhere at slop=50"
    phrase_docs = {r[1] for r in _results(phrase_topk(docs, ("table", "hash"), k=500))}
    prox = {
        r[1]: r[2]
        for r in _results(
            store.search_proximity(spark, ("table", "hash"), slop=1, k=500)
        )
    }
    assert phrase_docs, "fixture phrase must occur in the corpus"
    for d in phrase_docs:
        assert prox.get(d) == 1, d


def test_boolean_and_proximity_validation(spark, sf_small, tmp_path):
    import pytest

    from production_ready_ds_spark.queries.llm import boolean_topk, proximity_topk

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9)
    with pytest.raises(ValueError):
        boolean_topk(docs, (), ("spark",))
    with pytest.raises(ValueError):
        store.search_boolean(spark, (), ("spark",))
    with pytest.raises(ValueError):
        proximity_topk(docs, ("spark", "spark"), slop=2)
    with pytest.raises(ValueError):
        store.search_proximity(spark, ("spark", "spark"), slop=2)


def test_mlt_index_equals_scan_and_excludes_source(spark, sf_small, tmp_path):
    """More-like-this served from postings must return the scan path's
    exact integers: same profile terms (one pushed point read), same
    BM25 grid, and the source doc excluded BEFORE ranks are assigned
    (so the rank sequence has no gap and no burned slot)."""
    from production_ready_ds_spark.queries.llm import (
        mlt_profile_terms,
        mlt_topk,
    )

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9)
    for src in (7, 123, 400):
        terms = mlt_profile_terms(docs, src)
        assert 0 < len(terms) <= 5
        scan = _results(mlt_topk(docs, src, k=15))
        indexed = _results(
            store.search(spark, terms, k=15, exclude_ids=(src,))
        )
        assert indexed == scan, src
        assert all(r[1] != src for r in indexed)
        assert [r[0] for r in indexed] == list(range(1, len(indexed) + 1))


def test_search_exclude_ids_reranks_without_gap(spark, sf_small, tmp_path):
    """Excluding the top hit promotes every later doc one rank — the
    result equals the unexcluded list with that doc removed and ranks
    reassigned (exclusion happens before ranking, not after)."""
    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9)
    terms = ("spark", "vector")
    base = _results(store.search(spark, terms, k=11))
    top = base[0][1]
    excl = _results(store.search(spark, terms, k=10, exclude_ids=(top,)))
    want = [(i + 1, *r[1:]) for i, r in enumerate(base[1:])]
    assert excl == want


def test_faceted_search_equals_scan_and_pushes_attr(spark, sf_small, tmp_path):
    """search_filtered (BM25 restricted by a doc-attribute facet) must
    return the scan twin's exact integers, with the facet predicate
    PUSHED into the sidecar parquet scan and candidates pruned by a
    semi join BEFORE scoring (never a post-filter of ranked results —
    eligible docs past the unfiltered top-k must surface)."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.plans.audit import explain_str, pushed_filters

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9, attrs=("lang", "source"))
    for attr, values in (
        ("lang", ("de", "fr")),
        ("lang", ("en",)),
        ("source", ("src3", "src7", "src11")),
    ):
        eligible = docs.filter(F.col(attr).isin(list(values))).select("doc_id")
        scan = _results(bm25_topk(docs, ("spark", "query", "vector"), k=15, eligible=eligible))
        indexed_df = store.search_filtered(
            spark, ("spark", "query", "vector"), attr=attr, values=values, k=15
        )
        assert _results(indexed_df) == scan, (attr, values)
        # ranks are gapless (pre-rank pruning), results all eligible
        assert [r[0] for r in scan] == list(range(1, len(scan) + 1))
        pushed = " ".join(pushed_filters(indexed_df))
        assert attr in pushed, pushed  # facet pushed to the sidecar scan
        assert "LeftSemi" in explain_str(indexed_df)  # pruned, not post-filtered
    # the facet surfaces eligible docs the unfiltered top-k never ranked
    base_ids = {r[1] for r in _results(store.search(spark, ("spark", "query", "vector"), k=15))}
    facet_ids = {
        r[1]
        for r in _results(
            store.search_filtered(
                spark, ("spark", "query", "vector"), attr="lang", values=("de", "fr"), k=15
            )
        )
    }
    assert facet_ids - base_ids, "facet should promote docs past the unfiltered top-k"


def test_faceted_search_statistics_stay_full_corpus(spark, sf_small, tmp_path):
    """The facet restricts candidates, never term statistics: a
    surviving doc's score_scaled must equal its score in the
    UNFILTERED search (Lucene filter-query semantics)."""
    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs, id_min=0, id_max=10**9, attrs=("lang",))
    terms = ("spark", "vector")
    unfiltered = {r[1]: r[2] for r in _results(store.search(spark, terms, k=500))}
    faceted = _results(
        store.search_filtered(spark, terms, attr="lang", values=("de",), k=50)
    )
    assert faceted, "facet must match some docs"
    for _rank, doc_id, score, _hits in faceted:
        assert unfiltered[doc_id] == score


def test_faceted_search_validates_attr(spark, sf_small, tmp_path):
    import pytest

    docs = load(spark, sf_small, "documents")
    plain = TermStore(str(tmp_path / "plain"))
    assert plain.append(docs, id_min=0, id_max=10**9)  # no attrs
    with pytest.raises(ValueError, match="no 'lang' doc attribute"):
        plain.search_filtered(spark, ("spark",), attr="lang", values=("de",))
    empty = TermStore(str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="empty"):
        empty.search_filtered(spark, ("spark",), attr="lang", values=("de",))


def test_faceted_search_survives_delete_and_compact(spark, sf_small, tmp_path):
    """Attribute columns ride every sidecar rewrite: after delete_ids
    and compact, faceted search must equal a fresh build of the
    surviving corpus with the same attrs."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    lo = docs.filter("doc_id < 250")
    hi = docs.filter("doc_id >= 250")
    assert store.append(lo, id_min=0, id_max=249, attrs=("lang",))
    assert store.append(hi, id_min=250, id_max=10**9, attrs=("lang",))
    gone = [r["doc_id"] for r in docs.filter(F.col("lang") == "fr").limit(20).collect()]
    assert store.delete_ids(spark, gone) >= 1
    assert store.compact(spark) == 1
    survivors = docs.filter(~F.col("doc_id").isin(gone))
    fresh = TermStore(str(tmp_path / "fresh"))
    assert fresh.append(survivors, id_min=0, id_max=10**9, attrs=("lang",))
    terms = ("spark", "query")
    for attr_values in (("de", "fr"), ("en",)):
        got = _results(
            store.search_filtered(spark, terms, attr="lang", values=attr_values, k=15)
        )
        want = _results(
            fresh.search_filtered(spark, terms, attr="lang", values=attr_values, k=15)
        )
        assert got == want, attr_values


def test_append_rejects_mismatched_attr_schema(spark, sf_small, tmp_path):
    """Mixed sidecar schemas silently drop attribute columns on
    multi-segment reads (spark.read.parquet picks one file's schema),
    so append must fail loudly when a batch declares different attrs
    than the store's existing segments."""
    import pytest

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / "ts"))
    assert store.append(docs.filter("doc_id < 250"), id_min=0, id_max=249, attrs=("lang",))
    with pytest.raises(ValueError, match="mixed sidecar schemas"):
        store.append(docs.filter("doc_id >= 250"), id_min=250, id_max=10**9)
    with pytest.raises(ValueError, match="mixed sidecar schemas"):
        store.append(
            docs.filter("doc_id >= 250"), id_min=250, id_max=10**9,
            attrs=("lang", "source"),
        )
    # the matching declaration still appends fine
    assert store.append(
        docs.filter("doc_id >= 250"), id_min=250, id_max=10**9, attrs=("lang",)
    )
    assert len(store.segments()) == 2


def test_analyzer_label_guards_mixed_appends_and_survives_maintenance(
    spark, tmp_path, sf_small
):
    """A stem-folded store (append token_fn + analyzer label) refuses
    a standard append (disjoint postings vocabularies), the label
    survives compaction, and the stemmed postings serve stemmed query
    terms."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from production_ready_ds_spark.functions.snowball import snowball_stem
    from production_ready_ds_spark.functions.stemmer import stem_tokens_udf
    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.operators.termstore import TermStore
    from production_ready_ds_spark.tables import load

    docs = load(spark, sf_small, "documents")
    stem = stem_tokens_udf()
    store = TermStore(str(tmp_path / "stem"))
    half = docs.filter(F.col("doc_id") < 250)
    rest = docs.filter(F.col("doc_id") >= 250)
    store.append(
        half, id_min=0, id_max=249,
        token_fn=lambda c: stem(tokens_expr(c)), analyzer="snowball",
    )
    assert store.analyzer_name() == "snowball"
    with _pt.raises(ValueError, match="mixed analyzers"):
        store.append(rest, id_min=250, id_max=10**9)
    store.append(
        rest, id_min=250, id_max=10**9,
        token_fn=lambda c: stem(tokens_expr(c)), analyzer="snowball",
    )
    # search takes RAW terms — the store applies its recorded analyzer
    # (the Lucene same-chain-both-sides rule), so the inflected form
    # finds the stem postings
    before = store.search(spark, ("queries",), k=5).collect()
    assert before, "raw inflected term must hit the stem postings"
    assert store.analyze_terms(("queries",)) == (snowball_stem("queries"),)
    store.compact(spark)
    assert store.analyzer_name() == "snowball", "label must survive compact"
    after = store.search(spark, ("queries",), k=5).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))


@pytest.mark.parametrize("analyzer", ["standard", "snowball"])
def test_analyzer_contract_across_search_surfaces(
    spark, tmp_path, sf_small, analyzer
):
    """Round-9 verdict item 5, the review pass-2 #4 bug class pinned as
    a PROPERTY over the whole analyzer × surface grid: whatever
    analyzer the manifest records, every BM25 surface (plain search,
    MLT-style exclude_ids, eligible-pruned, faceted search_filtered)
    routes RAW query terms through analyze_terms — so two spellings
    that analyze to the same postings term return identical integers,
    duplicates collapse AFTER analysis, a full-facet filter equals the
    unfiltered search — while the raw primitive (read_postings) stays
    analyzer-agnostic and serves only the ANALYZED vocabulary."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.functions.stemmer import stem_tokens_udf
    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.operators.termstore import TermStore
    from production_ready_ds_spark.tables import load

    docs = load(spark, sf_small, "documents")
    store = TermStore(str(tmp_path / analyzer))
    if analyzer == "snowball":
        stem = stem_tokens_udf()
        store.append(
            docs, id_min=0, id_max=10**9,
            token_fn=lambda c: stem(tokens_expr(c)),
            analyzer="snowball", attrs=("lang",),
        )
        # two spellings, one analyzed term ("queri")
        t1, t2 = "query", "queries"
        assert store.analyze_terms((t1,)) == store.analyze_terms((t2,))
    else:
        store.append(docs, id_min=0, id_max=10**9, attrs=("lang",))
        t1 = t2 = "query"  # identity analyzer: same spelling
        assert store.analyze_terms((t1,)) == (t1,)

    langs = tuple(
        r.lang for r in docs.select("lang").distinct().collect()
    )
    everyone = docs.select("doc_id")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    surfaces = {
        "search": lambda t: store.search(spark, t, k=10),
        "mlt_exclude": lambda t: store.search(spark, t, k=10, exclude_ids=(0,)),
        "eligible": lambda t: store.search(spark, t, k=10, eligible=everyone),
        "faceted": lambda t: store.search_filtered(
            spark, t, attr="lang", values=langs, k=10
        ),
    }
    got = {}
    for name, fn in surfaces.items():
        r1 = rows(fn((t1,)))
        assert r1, f"{analyzer}/{name}: raw term must hit the postings"
        assert r1 == rows(fn((t2,))), f"{analyzer}/{name}: same-analysis spellings diverge"
        assert r1 == rows(fn((t1, t2))), f"{analyzer}/{name}: dedup must follow analysis"
        got[name] = r1
    # full facet == all-eligible == unfiltered (the Lucene filter-query
    # convention: filters prune candidates, never statistics)
    assert got["search"] == got["eligible"] == got["faceted"]

    # the raw primitive stays agnostic: it serves the ANALYZED
    # vocabulary and must NOT re-analyze its input
    analyzed = store.analyze_terms((t1,))[0]
    hit = store.read_postings(spark, [analyzed])
    assert hit is not None and hit.count() > 0
    if analyzer == "snowball":
        assert analyzed != "queries"
        miss = store.read_postings(spark, ["queries"])
        assert miss is None or miss.count() == 0, (
            "raw inflection must miss a stem-folded vocabulary"
        )
