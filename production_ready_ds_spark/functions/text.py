"""Text column expressions: tokenization, stopwords, quality features.

Re-expresses the reference's NLTK cleaning chain
(00_training_pipeline.py:84-89: tokenize → lowercase → stopword-filter →
stem) as native Spark column expressions — JVM-side, codegen'd, no
Python workers. Stemming (the one genuinely custom scalar op) lives in
``production_ready_ds_spark.functions.stemmer`` as a pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A compact English stopword list (subset of the classic NLTK 179-word
# list — public domain word list, reimplemented; reference T4 uses
# nltk.corpus.stopwords which is not installable here).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "had", "has", "have", "he", "her", "his", "i", "in", "is",
    "it", "its", "not", "of", "on", "or", "s", "she", "t", "that",
    "the", "their", "they", "this", "to", "was", "were", "will", "with",
    "you",
)

# The full classic English stopword list (public-domain word list, as
# shipped by NLTK's `stopwords` corpus) — the reference filters with
# exactly this list (00_training_pipeline.py:58,87), so the
# golden-artifact replay must too. Contraction entries ("don't") are
# kept for completeness although the reference's \w+ tokenizer can
# never produce them.
REFERENCE_STOPWORDS: frozenset[str] = frozenset((
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't",
))


def tokens_expr(text: Column) -> Column:
    """lowercase → split on non-word runs → drop empty strings.

    Matches DuckDB's
    ``list_filter(regexp_split_to_array(lower(text),'\\W+'), t -> t <> '')``
    exactly (leading/trailing separators produce empties in both engines;
    both are dropped).
    """
    return F.filter(F.split(F.lower(text), r"\W+"), lambda t: t != "")


def md5_prefix_int(col: Column) -> Column:
    """THE cross-engine 32-bit string hash: first 8 hex chars of md5
    over the UTF-8 bytes, as a long — ONE definition (the
    gram_hash_at rule: a one-character drift in any inline copy
    silently breaks exactly that query's oracle parity). DuckDB twin:
    :func:`md5_prefix_int_sql`."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def md5_prefix_int_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_prefix_int` — computes the identical
    integer from the identical bytes."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def tokens_expr_unicode(text: Column) -> Column:
    """Unicode-aware variant of :func:`tokens_expr` for reference
    replay: the reference tokenizes with a Python ``\\w+`` regex, which
    is unicode-aware ('cairó' is ONE token), while Java's ``\\w`` is
    ASCII-only. ``(?U)`` turns on UNICODE_CHARACTER_CLASS in the JVM
    regex. Not used by oracle-checked queries — DuckDB's RE2 ``\\W`` is
    ASCII-only, so those must keep :func:`tokens_expr` semantics."""
    return F.filter(F.split(F.lower(text), r"(?U)\W+"), lambda t: t != "")


def remove_stopwords(
    tokens: Column,
    keep_multiplicity: bool = True,
    stopwords=STOPWORDS,
) -> Column:
    """Stopword removal (reference T4) as a broadcast-literal filter.

    ``array_except`` would also dedup within the array; default keeps
    multiplicity via a lambda filter. Pass
    ``stopwords=REFERENCE_STOPWORDS`` for the reference's full list
    (the exact-replay chain).
    """
    words = list(stopwords)
    if keep_multiplicity:
        return F.filter(tokens, lambda t: ~t.isin(words))
    return F.array_except(tokens, F.array(*[F.lit(w) for w in words]))


def stopword_ratio(tokens: Column) -> Column:
    """Fraction of tokens that are stopwords (quality-scoring feature)."""
    n = F.size(tokens)
    n_stop = F.size(F.filter(tokens, lambda t: t.isin(list(STOPWORDS))))
    return F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
