"""Result-presentation search surfaces: KWIC highlighting and
more-like-this, semantics pinned on constructed corpora (the catalog
entries q_search_highlight / q_search_mlt are oracle-verified on the
testdata; these tests pin the window clipping and profile-selection
edge cases hand-checkably)."""

from __future__ import annotations

from production_ready_ds_spark.queries.llm import kwic_snippets, mlt_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ranked(spark, ids):
    return spark.createDataFrame(
        [(i + 1, d, 100 - i) for i, d in enumerate(ids)],
        "rank long, doc_id long, score_scaled long",
    )


def test_kwic_window_mid_start_end(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "delta one two three four"),
            (3, "one two delta"),
        ],
    )
    out = {
        r.doc_id: r
        for r in kwic_snippets(
            docs, _ranked(spark, [1, 2, 3]), ("delta",)
        ).collect()
    }
    # mid-document: full ±3 window
    assert out[1].hit_pos == 4
    assert out[1].snippet == "alpha beta gamma delta epsilon zeta eta"
    # hit at token 1: window clips at the start
    assert out[2].hit_pos == 1
    assert out[2].snippet == "delta one two three"
    # hit at the last token: window clips at the end
    assert out[3].hit_pos == 3
    assert out[3].snippet == "one two delta"


def test_kwic_first_hit_is_min_over_terms(spark):
    docs = _docs(spark, [(1, "x xray y yankee zulu")])
    out = kwic_snippets(
        docs, _ranked(spark, [1]), ("zulu", "yankee"), context=1
    ).collect()[0]
    # yankee (pos 4) beats zulu (pos 5); window is ±1
    assert out.hit_pos == 4
    assert out.snippet == "y yankee zulu"


def test_kwic_preserves_rank_and_score(spark):
    docs = _docs(spark, [(7, "alpha delta"), (9, "delta beta")])
    ranked = spark.createDataFrame(
        [(1, 9, 555), (2, 7, 333)],
        "rank long, doc_id long, score_scaled long",
    )
    rows = {r.doc_id: r for r in kwic_snippets(docs, ranked, ("delta",)).collect()}
    assert (rows[9].rank, rows[9].score_scaled) == (1, 555)
    assert (rows[7].rank, rows[7].score_scaled) == (2, 333)


def test_mlt_ranks_near_copy_first_and_excludes_source(spark):
    docs = _docs(
        spark,
        [
            # source: content terms (len >= 4) = alpha x3, bravo x2,
            # charlie x1, tiny x1; "is"/"of" are below the length gate
            (0, "alpha alpha alpha bravo bravo charlie tiny is of"),
            (1, "alpha alpha bravo charlie tiny extras here"),  # near-copy
            (2, "charlie something unrelated entirely"),  # one shared term
            (3, "totally disjoint vocabulary document"),  # no overlap
        ],
    )
    rows = mlt_topk(docs, 0, k=10).collect()
    ids = [r.doc_id for r in rows]
    assert 0 not in ids, "source document must be excluded"
    assert ids[0] == 1, "near-copy must rank first"
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].n_terms_hit == 4
    assert by_id[2].n_terms_hit == 1
    assert 3 not in by_id, "zero-overlap doc must not appear"


def test_mlt_profile_respects_length_gate(spark):
    # the source doc's most frequent token is short ("is" x5) — the
    # profile must skip it, so a doc containing ONLY "is" scores 0
    docs = _docs(
        spark,
        [
            (0, "is is is is is alpha bravo"),
            (1, "is is is is is is is is"),
            (2, "alpha bravo"),
        ],
    )
    rows = {r.doc_id: r for r in mlt_topk(docs, 0, k=10).collect()}
    assert 1 not in rows, "short-token-only doc must not match the profile"
    assert rows[2].n_terms_hit == 2


def test_kwic_at_windows_whole_phrase_span(spark):
    from production_ready_ds_spark.queries.llm import kwic_snippets_at

    docs = _docs(
        spark,
        [
            (1, "a b c red fox jumps d e"),
            (2, "red fox at the start"),
        ],
    )
    ranked = spark.createDataFrame(
        [(1, 1, 1, 4), (2, 2, 1, 1)],
        "rank long, doc_id long, n_hits long, first_pos long",
    )
    rows = {
        r.doc_id: r
        for r in kwic_snippets_at(docs, ranked, span=2, context=2).collect()
    }
    # 2-token match at pos 4: window [2, 7] — both phrase tokens kept
    assert rows[1].snippet == "b c red fox jumps d"
    # match at pos 1: clipped window [1, 4]
    assert rows[2].snippet == "red fox at the"
    # ranked columns survive decoration untouched
    assert (rows[1].rank, rows[1].n_hits, rows[1].first_pos) == (1, 1, 4)
