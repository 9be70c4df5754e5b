"""Unicode normalization cleaning: NFC composition + invisible-junk
removal, the corpus-normalization step every multilingual pipeline
runs before tokenization (the reference's Reddit corpus arrives
API-clean ASCII — `00_training_pipeline.py:37-42` — so this is EXT
cleaning surface beside markup/PII/boilerplate/repetition). Decomposed
accents ("e" + U+0301) vs composed ("é") are DIFFERENT tokens to every
downstream hash — dedup, minhash, BM25 — so un-normalized corpora
silently split duplicate families and vocabulary entries.

Design constraints (the functions/markup.py discipline):

- **NFC is the one non-regex step.** Spark has no built-in Unicode
  normalizer, so composition runs in ONE Arrow-batched pandas_udf
  (unicodedata.normalize — map-only); DuckDB's native nfc_normalize
  is the oracle twin. Both implement the same Unicode standard
  algorithm; the fuzz suite pins agreement on the stable ranges.
- **Everything around NFC is a shared regexp chain** in the Java-regex
  ∩ RE2 common subset, carried by :data:`PRE_NFC_STEPS` /
  :data:`POST_NFC_STEPS` so the Spark Column builder and the oracle
  SQL can never drift (junk deletion runs BEFORE composition — see the
  step tuples for why, including DuckDB's NUL-truncating NFC C API).
  Codepoints are written as ``\\x{NNNN}`` escapes (both engines) — no
  raw invisible characters inside pattern strings.
- **Newlines and tabs survive; \\r does not.** The control class
  deletes C0 (minus \\t \\n) + DEL + C1; \\r\\n thereby becomes \\n and
  a lone \\r joins its lines — the documented simplification (no
  cross-engine replacement-escape seam).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) regexp steps applied IN ORDER — PRE steps
#: BEFORE NFC, POST steps after — replace-ALL, shared verbatim by the
#: Spark builder and the DuckDB oracle (which must pass the ``g``
#: flag). Junk deletion runs BEFORE composition for two reasons: a
#: deleted character between a base letter and its combining mark must
#: not leave an uncomposable pair behind (delete-then-NFC composes it,
#: NFC-then-delete cannot), and DuckDB's nfc_normalize is a
#: NUL-terminated C API that silently TRUNCATES at an embedded \x00 —
#: the control class must have removed it first (probed; the regex
#: functions themselves handle NUL-bearing strings correctly).
PRE_NFC_STEPS: tuple[tuple[str, str], ...] = (
    # zero-width + word-joiner + BOM + soft hyphen: delete
    (r"[\x{200B}-\x{200D}\x{2060}\x{FEFF}\x{00AD}]", ""),
    # C0 controls (keep \t \n), DEL, C1 controls: delete (\r and the
    # NUL that would truncate DuckDB's NFC die here)
    (r"[\x{0000}-\x{0008}\x{000B}-\x{001F}\x{007F}-\x{009F}]", ""),
)
POST_NFC_STEPS: tuple[tuple[str, str], ...] = (
    # Unicode space variants -> ASCII space (NBSP, ogham mark, en/em
    # family, narrow NBSP, math space, ideographic space); spaces are
    # NFC-invariant and legitimately block composition, so they wait
    (r"[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]", " "),
    # collapse runs of the ASCII spaces the substitutions created
    (r" {2,}", " "),
)


def normalize_unicode(col: Column) -> Column:
    """PRE steps → NFC → POST steps as a Spark expression chain:
    composition in one Arrow-batched pandas_udf, the regexp steps in
    whole-stage codegen. Mirrors :func:`normalize_unicode_sql` step
    for step."""
    from pyspark.sql.functions import pandas_udf

    def _nfc(texts):
        import unicodedata

        return texts.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    out = col
    for pat, rep in PRE_NFC_STEPS:
        out = F.regexp_replace(out, pat, rep)
    out = pandas_udf(_nfc, "string")(out)
    for pat, rep in POST_NFC_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def _sql_steps(expr: str, steps: tuple[tuple[str, str], ...]) -> str:
    out = expr
    for pat, rep in steps:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def normalize_unicode_sql(expr: str) -> str:
    """The identical chain as DuckDB SQL over ``expr`` — built from the
    same step tuples (explicit ``g`` flag; Spark replaces all by
    default)."""
    return _sql_steps(
        f"nfc_normalize({_sql_steps(expr, PRE_NFC_STEPS)})", POST_NFC_STEPS
    )


#: Deterministic dirt injected into every DIRT_MOD-th document by
#: q_clean_unicode (the q_clean_repetition fixture-synthesis
#: convention — the shipped corpus is pure ASCII, so the query dirties
#: it identically in both engines before cleaning): a decomposed
#: accent (NFC must compose it), NBSP, zero-width space, BEL, thin
#: space, ideographic space, soft hyphen, and a CRLF.
DIRT_PREFIX = "Cafe\u0301\u00A0du\u200B parc:\u0007\r\n"
DIRT_SUFFIX = "\u3000fin\u00ADde\u2009ligne"
DIRT_MOD = 7


def sql_text_literal(s: str) -> str:
    """``s`` as a DuckDB expression: printable-ASCII runs stay quoted
    literals, everything else becomes ``chr(codepoint)`` — so dirt
    constants with invisible characters embed into oracle SQL as
    readable ASCII, byte-identical to the Python literal Spark gets."""
    parts: list[str] = []
    run: list[str] = []

    def flush() -> None:
        if run:
            parts.append("'" + "".join(run).replace("'", "''") + "'")
            run.clear()

    for ch in s:
        if 0x20 <= ord(ch) <= 0x7E:
            run.append(ch)
        else:
            flush()
            parts.append(f"chr({ord(ch)})")
    flush()
    return " || ".join(parts) if parts else "''"


def dirty_unicode_col(text: Column, doc_id: Column) -> Column:
    """The deterministic dirt rule as a Spark expression."""
    return F.when(
        doc_id % DIRT_MOD == 0,
        F.concat(F.lit(DIRT_PREFIX), text, F.lit(DIRT_SUFFIX)),
    ).otherwise(text)


def dirty_unicode_sql(text_expr: str, id_expr: str) -> str:
    """The identical dirt rule as DuckDB SQL."""
    pre = sql_text_literal(DIRT_PREFIX)
    suf = sql_text_literal(DIRT_SUFFIX)
    return (
        f"CASE WHEN {id_expr} % {DIRT_MOD} = 0 "
        f"THEN {pre} || {text_expr} || {suf} ELSE {text_expr} END"
    )


def clean_unicode_frame(d: DataFrame) -> DataFrame:
    """(doc_id, text) → the q_clean_unicode report frame: exact in/out
    lengths and the md5 of the cleaned text (the rebuilt-text
    convention — the full cleaned column never needs to leave the
    executors for verification)."""
    dirty = dirty_unicode_col(F.col("text"), F.col("doc_id"))
    frame = d.select("doc_id", dirty.alias("dirty"))
    cleaned = normalize_unicode(F.col("dirty"))
    return frame.select(
        "doc_id",
        F.length("dirty").cast("long").alias("n_chars_in"),
        cleaned.alias("clean"),
    ).select(
        "doc_id",
        "n_chars_in",
        F.length("clean").cast("long").alias("n_chars_out"),
        F.md5(F.col("clean").cast("binary")).alias("cleaned_md5"),
    )
