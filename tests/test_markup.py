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
    # case-insensitive containers and whitespace-tolerant closers —
    # <SCRIPT> payloads must never leak into the corpus
    ("<SCRIPT>var y = 2;</SCRIPT>kept", "kept"),
    ('<Script defer src="x.js">payload</script >kept', "kept"),
    ("<STYLE>body{}</Style>kept", "kept"),
    # entities decode AFTER tag removal, &amp; last (no double-unescape:
    # &amp;lt; must yield the literal string "&lt;", never "<")
    ("1 &lt; 2 &amp;&amp; 3 &gt; 2", "1 < 2 && 3 > 2"),
    ("&amp;lt;", "&lt;"),
    ("&quot;q&#39;", "\"q'"),
    # web typography entities decode instead of leaking "nbsp"/"mdash"
    # tokens into the quality signals
    ("foo&nbsp;bar&mdash;baz&hellip;", "foo bar—baz…"),
    ("it&#x27;s &#160; here", "it's here"),
    # an unclosed trailing tag SURVIVES (no closing '>' to match the
    # tag pattern), as does a stray '>' — pinned cross-engine
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


def test_strip_spark_equals_duckdb_on_random_tag_soup(spark):
    """Seeded fuzz over 200 random tag-soup strings (angle brackets,
    ampersands, half-finished entities, nested fragments): Spark and
    DuckDB must produce the IDENTICAL cleaned string for every one —
    the cross-engine regex-subset claim tested beyond the hand-picked
    cases. One batched Spark job (per-example jobs would be
    prohibitively slow)."""
    import random

    rng = random.Random(0xC1EA4)
    frags = [
        "<p>", "</p>", "<b ", ">", "<", "&", "&amp;", "&lt;", "&nbsp;",
        "<script>", "</script>", "<SCRIPT>", "</ScRiPt >", "<style>",
        "</style>", "<!--", "-->", "text", "a b", ";", "x&y", "\n",
        "<br/>", "<div class='c'>", "&#39;", "&#x27;", "it's",
    ]
    cases = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(cases)], "i long, m string"
    ).select("i", strip_markup(F.col("m")).alias("c"))
    got_spark = {r.i: r.c for r in df.collect()}
    con = duckdb.connect()
    sql = strip_markup_sql("m")
    for i, m in enumerate(cases):
        got_duck = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS m)", [m]
        ).fetchone()[0]
        assert got_spark[i] == got_duck, (m, got_spark[i], got_duck)
