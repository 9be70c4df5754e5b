"""Markup-strip kernel (functions/markup.py): HTML → text semantics
pinned on constructed cases, and the Spark chain held equal to its
DuckDB twin on every case (the q_clean_markup catalog entry proves
the same on the real tables; these pin the edge semantics
hand-checkably)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from production_ready_ds_spark.functions.markup import (
    strip_markup,
    strip_markup_sql,
)

CASES = [
    # plain tags drop, text survives, whitespace collapses
    ("<p>hello   <b>bold</b> world</p>", 'hello bold world'),
    # script/style/comment containers drop WITH their content —
    # including tag-bearing string payloads
    ('<script>var x = "<i>hi</i>";</script>after', "after"),
    ("<style>p { color: red; }</style>text", "text"),
    ("a<!-- hidden <b>note</b> -->b", "a b"),
    # multi-line containers ((?s) flag)
    ("<script>\nline1\nline2\n</script>ok", "ok"),
    # entities decode AFTER tag removal, &amp; last (no double-unescape:
    # &amp;lt; must yield the literal string "&lt;", never "<")
    ("1 &lt; 2 &amp;&amp; 3 &gt; 2", "1 < 2 && 3 > 2"),
    ("&amp;lt;", "&lt;"),
    ("&quot;q&#39;", "\"q'"),
    # unclosed tag at end drops; stray > survives
    ("text <br", "text <br"),
    ("a > b", "a > b"),
    # empty and tag-only inputs
    ("", ""),
    ("<div><span></span></div>", ""),
]


@pytest.mark.parametrize("marked,want", CASES)
def test_strip_semantics(spark, marked, want):
    got = (
        spark.createDataFrame([(marked,)], "m string")
        .select(strip_markup(F.col("m")).alias("c"))
        .first()
        .c
    )
    assert got == want, (marked, got)


def test_spark_equals_duckdb_on_all_cases(spark):
    """The cross-engine contract itself: both engines produce the
    identical string for every pinned case (the property the catalog
    entry's hash match rests on)."""
    df = spark.createDataFrame(
        [(i, m) for i, (m, _) in enumerate(CASES)], "i long, m string"
    ).select("i", strip_markup(F.col("m")).alias("c"))
    got_spark = {r.i: r.c for r in df.collect()}
    con = duckdb.connect()
    sql = strip_markup_sql("m")
    for i, (m, _) in enumerate(CASES):
        got_duck = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS m)", [m]
        ).fetchone()[0]
        assert got_spark[i] == got_duck, (m, got_spark[i], got_duck)


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
