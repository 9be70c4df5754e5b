"""Text-level PII redaction: email / phone / IPv4 / URL patterns
replaced with typed placeholders, with per-category counts — the
training-corpus privacy pass (the BigScience/ROOTS-style step) that
complements q_pii_scrub's structured-column masking.

One :data:`PII_PATTERNS` table drives the Spark Column chain AND the
DuckDB oracle SQL (the functions/markup.py discipline), with every
regex in the Java-regex ∩ RE2 common subset: character classes,
``(?:...)`` groups, ``\\b`` word boundaries, bounded repetition — no
lookarounds (RE2 has none). ORDER IS LOAD-BEARING: URLs redact first
(a URL may embed an ``@`` or digit runs that the email/phone patterns
would otherwise carve up), then emails, then IPv4 (before phone —
dotted octets contain phone-length digit runs), then phone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (category, pattern, placeholder) — applied in order, replace-ALL;
#: counts are taken on the text as it stands WHEN that category runs
#: (both engines count on the identically pre-redacted string)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # the final negated class keeps trailing prose punctuation out of
    # the match ("see https://x.org/p, next" must leave the comma) —
    # the classic greedy-URL redaction bug
    ("url", r"https?://[^\s]+[^\s.,;:!?)\"']", "<URL>"),
    (
        "email",
        r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}\b",
        "<EMAIL>",
    ),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (
        "phone",
        r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?[-. ][0-9]{3,4}[-. ][0-9]{3,4}\b",
        "<PHONE>",
    ),
)


def redact_pii(col: Column) -> tuple[Column, dict[str, Column]]:
    """(redacted text, {category: count}) as codegen'd expressions —
    counts taken per category on the progressively-redacted text,
    mirroring :func:`redact_pii_sql` step for step."""
    counts: dict[str, Column] = {}
    out = col
    for cat, pat, repl in PII_PATTERNS:
        counts[cat] = F.regexp_count(out, F.lit(pat)).cast("long")
        out = F.regexp_replace(out, pat, repl)
    return out, counts


def redact_pii_sql(expr: str) -> tuple[str, dict[str, str]]:
    """The identical chain as DuckDB SQL: (redacted expr,
    {category: count expr}) built from the same PII_PATTERNS table.
    DuckDB counts via len(regexp_extract_all(...)) and needs the
    explicit ``g`` flag on the replace."""
    counts: dict[str, str] = {}
    out = expr
    for cat, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        counts[cat] = (
            f"CAST(len(regexp_extract_all({out}, '{p}')) AS BIGINT)"
        )
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out, counts
