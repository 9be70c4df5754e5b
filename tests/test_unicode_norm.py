"""Unicode normalization cleaning: exact semantics on constructed docs
(independent pure-Python expected values), Spark ≡ DuckDB agreement on
seeded unicode soup, and the catalog report frame's arithmetic."""

from __future__ import annotations

import random
import re
import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from production_ready_ds_spark.functions.unicode_norm import (
    DIRT_MOD,
    DIRT_PREFIX,
    DIRT_SUFFIX,
    POST_NFC_STEPS,
    PRE_NFC_STEPS,
    clean_unicode_frame,
    normalize_unicode,
    normalize_unicode_sql,
    sql_text_literal,
)


def _py_steps(t: str, steps) -> str:
    for pat, rep in steps:
        py = re.sub(r"\\x\{([0-9A-Fa-f]+)\}", lambda m: chr(int(m.group(1), 16)), pat)
        t = re.sub(py, rep, t)
    return t


def _py_clean(t: str) -> str:
    """Independent reference: PRE steps → unicodedata NFC → POST steps
    via Python re (\\x{NNNN} → \\uNNNN translation)."""
    out = _py_steps(t, PRE_NFC_STEPS)
    out = unicodedata.normalize("NFC", out)
    return _py_steps(out, POST_NFC_STEPS)


CASES = [
    # NFC composes the decomposed accent
    ("Cafe\u0301 au lait", "Café au lait"),
    # NBSP / thin space / ideographic space -> ASCII space, runs collapse
    ("a\u00a0b\u2009c\u3000 d", "a b c d"),
    # zero-width family, BOM and soft hyphen vanish entirely
    ("\ufeffzero\u200bwidth\u200c:\u200d gone\u00ad!", "zerowidth: gone!"),
    # C0 (minus tab/newline), DEL and C1 die; \t and \n survive
    ("keep\tthis\nline\x07\x00\x7f\x9f end", "keep\tthis\nline end"),
    # CRLF -> LF, lone CR joins lines (the documented \r rule)
    ("a\r\nb\rc", "a\nbc"),
    # already-NFC text with only ASCII is untouched
    ("plain ascii stays", "plain ascii stays"),
]


def test_exact_semantics_vs_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.clean
        for r in df.select(
            "doc_id", normalize_unicode(F.col("text")).alias("clean")
        ).collect()
    }
    for i, (raw, expect) in enumerate(CASES):
        assert got[i] == expect, (raw, got[i], expect)
        assert _py_clean(raw) == expect, "reference impl drifted"


def test_fuzz_spark_equals_duckdb(spark):
    """200 seeded soup docs through both engines byte-for-byte. The
    pool mixes stable-since-Unicode-1.1 composition pairs with every
    junk class the chain handles."""
    pool = (
        list("abc XY.:!\t\n")
        + ["e\u0301", "a\u0300", "o\u0302", "é", "ü", "ß", "…"]
        + ["\u00a0", "\u2003", "\u2009", "\u3000", "\u202f"]
        + ["\u200b", "\u200c", "\u200d", "\ufeff", "\u00ad", "\u2060"]
        + ["\x07", "\x00", "\x1b", "\x7f", "\x85", "\r\n", "\r"]
    )
    rng = random.Random(0xD1CE)
    docs = [
        (i, "".join(rng.choice(pool) for _ in range(rng.randrange(0, 60))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.clean
        for r in df.select(
            "doc_id", normalize_unicode(F.col("text")).alias("clean")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in docs:
        expect = con.execute(
            f"SELECT {normalize_unicode_sql(sql_text_literal(t))}"
        ).fetchone()[0]
        assert got[i] == expect, (i, repr(t), repr(got[i]), repr(expect))
        assert got[i] == _py_clean(t), (i, repr(t))


def test_report_frame_arithmetic(spark):
    """clean_unicode_frame dirties every DIRT_MOD-th doc and reports
    exact lengths + the cleaned md5; undirtied ASCII rows are
    identity (in == out, md5 of the original text)."""
    import hashlib

    rows = [(i, f"doc number {i} body") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in clean_unicode_frame(df).collect()}
    for i, t in rows:
        if i % DIRT_MOD == 0:
            dirty = DIRT_PREFIX + t + DIRT_SUFFIX
        else:
            dirty = t
        clean = _py_clean(dirty)
        assert got[i].n_chars_in == len(dirty)
        assert got[i].n_chars_out == len(clean)
        assert got[i].cleaned_md5 == hashlib.md5(clean.encode()).hexdigest()
        if i % DIRT_MOD != 0:
            assert got[i].n_chars_in == got[i].n_chars_out


def test_sql_text_literal_roundtrip():
    con = duckdb.connect()
    for s in ["", "plain", "it's", DIRT_PREFIX, DIRT_SUFFIX, "a\u0301\x07'\\"]:
        assert con.execute(f"SELECT {sql_text_literal(s)}").fetchone()[0] == s


@pytest.mark.parametrize("sf", ["sf0.001"])
def test_catalog_entry_runs(spark, sf):
    from production_ready_ds_spark.queries import catalog

    out = catalog()["q_clean_unicode"].fn(spark, f"/root/testdata/{sf}").collect()
    assert out and all(r.n_chars_out <= r.n_chars_in for r in out)
    assert any(r.n_chars_out != r.n_chars_in for r in out), "dirt rule inert"
