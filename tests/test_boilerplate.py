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
