"""q_clean_boilerplate (corpus-wide CCNet-style line removal):
threshold boundary and rebuild semantics on constructed corpora
(the catalog entry is oracle-verified on the real tables)."""

from __future__ import annotations


def test_boilerplate_threshold_is_exact_integer_boundary(spark, tmp_path):
    """Corpus-wide line removal on a constructed N=30 corpus, pinning
    the exact integer threshold (10·df ≥ N): unique content lines
    (df=1, 10 < 30) survive, a 3-doc repeated line (df=3, 30 ≥ 30)
    sits exactly AT the boundary and drops, and the synthetic
    header/footer (df=30) drop everywhere."""
    import os

    from production_ready_ds_spark.queries import catalog

    docs = []
    for i in range(30):
        body = f"unique{i} " * 16  # one unique content line per doc
        if i < 3:
            body += " boundary line " + "repeat " * 14  # df=3 line
        docs.append((i, body.strip()))
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    rows = {
        r.doc_id: r
        for r in catalog()["q_clean_boilerplate"].fn(spark, sf).collect()
    }
    assert len(rows) == 30
    for i, r in rows.items():
        # header + footer always drop; the df=3 line sits exactly at
        # the 10*3 >= 1*30 boundary and drops too
        assert f"unique{i}" in r.clean_text
        assert "share this article" not in r.clean_text
        assert "powered by" not in r.clean_text
        assert "boundary" not in r.clean_text
        want_dropped = 3 if i < 3 else 2
        assert r.n_lines_dropped == want_dropped, (i, r)


def test_repetition_trim_cuts_at_third_gram_occurrence(spark, tmp_path):
    """Constructed docs pin the cutoff rule: a doc looping a 5-gram
    keeps everything strictly before the THIRD occurrence's start; a
    loop-free doc (and one with only two occurrences) passes through
    untouched. doc_ids avoid multiples of 5 so the fixture's own
    loop injection stays inert."""
    import os

    from production_ready_ds_spark.queries import catalog

    base = "a b c d e"  # one 5-gram
    docs = [
        # third occurrence of "a b c d e" starts at token 11 -> keep 10
        (1, f"{base} {base} {base} tail tail2"),
        # two occurrences only: kept whole
        (2, f"{base} x {base}"),
        # no repetition at all
        (3, "p q r s t u v w"),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(sf, "documents.parquet")
    )
    rows = {
        r.doc_id: r
        for r in catalog()["q_clean_repetition"].fn(spark, sf).collect()
    }
    assert rows[1].n_tokens_kept == 10
    assert rows[1].clean_text == f"{base} {base}"
    assert rows[2].n_tokens_kept == rows[2].n_tokens_in == 11
    assert rows[2].clean_text == f"{base} x {base}"
    assert rows[3].n_tokens_kept == rows[3].n_tokens_in == 8
