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


def tokens_expr(text: Column) -> Column:
    """lowercase → split on non-word runs → drop empty strings.

    Matches DuckDB's
    ``list_filter(regexp_split_to_array(lower(text),'\\W+'), t -> t <> '')``
    exactly (leading/trailing separators produce empties in both engines;
    both are dropped).
    """
    return F.filter(F.split(F.lower(text), r"\W+"), lambda t: t != "")


def remove_stopwords(tokens: Column, keep_multiplicity: bool = True) -> Column:
    """Stopword removal (reference T4) as a broadcast-literal filter.

    ``array_except`` would also dedup within the array; default keeps
    multiplicity via a lambda filter.
    """
    if keep_multiplicity:
        return F.filter(tokens, lambda t: ~t.isin(list(STOPWORDS)))
    return F.array_except(tokens, F.array(*[F.lit(w) for w in STOPWORDS]))


def stopword_ratio(tokens: Column) -> Column:
    """Fraction of tokens that are stopwords (quality-scoring feature)."""
    n = F.size(tokens)
    n_stop = F.size(F.filter(tokens, lambda t: t.isin(list(STOPWORDS))))
    return F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
