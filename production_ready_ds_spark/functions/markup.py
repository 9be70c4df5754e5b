"""Markup stripping: HTML/XML → text extraction, the first cleaning
step of every web-corpus training-data pipeline (the reference's
corpus is API-clean Reddit JSON — `00_training_pipeline.py:37-42` —
so this is EXT surface; CCNet/C4-style pipelines run exactly this
before any quality gate sees a byte).

Design constraints:

- **Column expressions only** — the strip is a regexp_replace chain
  in whole-stage codegen (map-only at any corpus size), never a
  Python UDF.
- **Cross-engine identical semantics.** Every pattern is written in
  the common subset of Java regex (Spark) and RE2 (DuckDB): literal
  tags ``<[^>]*>``, ``(?s)``-flagged non-greedy container blocks,
  ``\\s+`` whitespace classes. The DuckDB twin must pass the ``g``
  flag (DuckDB replaces the FIRST match by default; Spark replaces
  all) — :data:`STRIP_STEPS` carries the shared patterns so the SQL
  and the Column builder can never drift.
- **Container elements drop CONTENT, tags drop only themselves**:
  ``<script>``/``<style>`` bodies are code, not prose — stripping
  their tags but keeping the payload would feed JavaScript to the
  quality gates (the classic naive-strip corpus bug).
- **Entity decoding after tag removal**, ``&amp;`` LAST (decoding it
  first would re-create decodable entities from double-escaped text
  — the standard double-unescape bug).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) regexp steps shared verbatim by the Spark
#: builder and the DuckDB oracle (apply in order, replace-ALL).
#: Container patterns are case-INSENSITIVE with a whitespace-tolerant
#: close (``</script >``): real HTML writes <SCRIPT>/<Script> and
#: sloppy closers routinely, and a missed container leaks its payload
#: — the exact naive-strip bug this module exists to prevent
STRIP_STEPS: tuple[tuple[str, str], ...] = (
    # container elements whose CONTENT must go with them
    (r"(?is)<script[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style[^>]*>.*?</style\s*>", " "),
    # comments, then any remaining tag
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
)

#: (entity, char) literal replacements, order significant (&amp;
#: LAST, so double-escaped text never double-unescapes); covers the
#: XML five plus the ubiquitous web typography entities whose leaked
#: names ("nbsp", "mdash") would otherwise become high-frequency
#: corpus tokens skewing every downstream quality signal
ENTITY_STEPS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&#x27;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&amp;", "&"),
)


def strip_markup(col: Column) -> Column:
    """Markup → text as one codegen'd expression chain: container
    blocks and tags to spaces, entities decoded, whitespace collapsed
    and trimmed. Mirrors the DuckDB SQL :func:`strip_markup_sql`
    emits step for step."""
    out = col
    for pat, rep in STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in ENTITY_STEPS:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_markup_sql(expr: str) -> str:
    """The identical strip chain as DuckDB SQL over ``expr`` — built
    from the same STRIP_STEPS/ENTITY_STEPS tuples so the two engines
    cannot drift (DuckDB needs the explicit ``g`` flag; Spark's
    regexp_replace is replace-all by default)."""
    out = expr
    for pat, rep in STRIP_STEPS:
        # escape quotes like redact_pii_sql — a future pattern with an
        # apostrophe must not silently break the generated SQL
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    for ent, ch in ENTITY_STEPS:
        e = ent.replace("'", "''")
        quoted = ch.replace("'", "''")
        out = f"replace({out}, '{e}', '{quoted}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
