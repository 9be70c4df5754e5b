"""Text-PII redaction kernel (functions/pii.py): category semantics
and redaction-order rules pinned on constructed cases, each held to
Spark≡DuckDB equality (the q_pii_redact catalog entry proves the same
on the real tables)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from production_ready_ds_spark.functions.pii import redact_pii, redact_pii_sql

CASES = [
    # one of each, mixed prose
    (
        "mail a.b+c@x.org, see https://x.org/p?q=1, от 10.1.2.3, tel +49 (30) 123-4567.",
        "mail <EMAIL>, see <URL>, от <IP>, tel <PHONE>.",
        {"url": 1, "email": 1, "ipv4": 1, "phone": 1},
    ),
    # ORDER: the URL swallows its embedded @ and digits — no double
    # redaction of the email/phone patterns inside it
    (
        "https://user@host.example.com/call/555-010-1234 done",
        "<URL> done",
        {"url": 1, "email": 0, "ipv4": 0, "phone": 0},
    ),
    # ORDER: IPv4 runs before phone, so dotted octets never become
    # half-redacted phone fragments
    (
        "server 192.168.100.200 up",
        "server <IP> up",
        {"url": 0, "email": 0, "ipv4": 1, "phone": 0},
    ),
    # plain digit runs and version strings survive
    (
        "release 4.1.2 of 2026 keeps 10000 rows",
        "release 4.1.2 of 2026 keeps 10000 rows",
        {"url": 0, "email": 0, "ipv4": 0, "phone": 0},
    ),
    # multiple hits of one category all redact, counts agree
    (
        "a@b.co c@d.co",
        "<EMAIL> <EMAIL>",
        {"url": 0, "email": 2, "ipv4": 0, "phone": 0},
    ),
    ("", "", {"url": 0, "email": 0, "ipv4": 0, "phone": 0}),
]


@pytest.mark.parametrize("dirty,want,want_counts", CASES)
def test_redaction_semantics(spark, dirty, want, want_counts):
    red, counts = redact_pii(F.col("t"))
    row = (
        spark.createDataFrame([(dirty,)], "t string")
        .select(red.alias("red"), *[c.alias(k) for k, c in counts.items()])
        .first()
    )
    assert row.red == want, (dirty, row.red)
    for cat, n in want_counts.items():
        assert row[cat] == n, (dirty, cat, row[cat])


def test_spark_equals_duckdb_on_all_cases(spark):
    red, counts = redact_pii(F.col("t"))
    df = spark.createDataFrame(
        [(i, d) for i, (d, _, _) in enumerate(CASES)], "i long, t string"
    ).select("i", red.alias("red"), *[c.alias(k) for k, c in counts.items()])
    got = {r.i: r for r in df.collect()}
    out_sql, counts_sql = redact_pii_sql("t")
    cols = ", ".join(f"{v} AS {k}" for k, v in counts_sql.items())
    con = duckdb.connect()
    for i, (d, _, _) in enumerate(CASES):
        duck = con.execute(
            f"SELECT {out_sql} AS red, {cols} FROM (SELECT ? AS t)", [d]
        ).fetchone()
        assert got[i].red == duck[0], (d, got[i].red, duck[0])
        assert tuple(got[i])[2:] == duck[1:], (d, tuple(got[i])[2:], duck[1:])


def test_redaction_spark_equals_duckdb_on_random_pii_soup(spark):
    """Seeded fuzz over 200 random strings mixing PII-shaped
    fragments (addresses, digit runs, dotted quads, at-signs, URLs):
    identical redacted text AND counts on both engines for every
    case — the ordered-pattern cross-engine claim beyond the pinned
    examples."""
    import random

    rng = random.Random(0x9EDAC7)
    frags = [
        "a@b.co", "x.y@mail.example.org", "@", ".", "10.0.0.1",
        "256.1.2.3", "1.2.3", "https://a.io/x", "http://", "call",
        "+1 (555) 010-1234", "555-010-9999", "12345", "v4.1.2",
        "word", " ", "(", ")", "-", "end.", "a@b", "http://x.io,",
    ]
    cases = [
        " ".join(rng.choice(frags) for _ in range(rng.randint(0, 10)))
        for _ in range(200)
    ]
    red, counts = redact_pii(F.col("t"))
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(cases)], "i long, t string"
    ).select("i", red.alias("red"), *[c.alias(k) for k, c in counts.items()])
    got = {r.i: r for r in df.collect()}
    out_sql, counts_sql = redact_pii_sql("t")
    cols = ", ".join(f"{v} AS {k}" for k, v in counts_sql.items())
    con = duckdb.connect()
    for i, m in enumerate(cases):
        duck = con.execute(
            f"SELECT {out_sql} AS red, {cols} FROM (SELECT ? AS t)", [m]
        ).fetchone()
        assert got[i].red == duck[0], (m, got[i].red, duck[0])
        assert tuple(got[i])[2:] == duck[1:], (m, tuple(got[i])[2:], duck[1:])
