"""BPE tokenizer training: learn byte-pair-encoding merges from the
corpus (Sennrich et al., ACL 2016 — the public BPE algorithm every LLM
tokenizer pipeline runs before training).

The catalog already counts tokens (q_token_count) and builds frequency
vocabularies (q_vocab_build); this is the missing third tokenizer step —
learning the merge table itself. Reference grounding: the reference's
HashingTF sidesteps tokenizer training entirely
(`00_training_pipeline.py:138`); this is the explicit-subword
alternative at the same pipeline position.

Scale shape (the reason BPE is tractable at 100 TB): the corpus is
touched ONCE — a single explode + map-side-combined hash-agg builds the
word-frequency dictionary, exactly q_vocab_build's plan. Every merge
round after that iterates on the VOCABULARY-bounded frame (≈10⁵–10⁶
distinct words), never the corpus: one small pair-count aggregate, one
bounded argmax collect (1 row — count desc then pair asc, so the winner
is engine- and partitioning-independent), one array-fold rewrite of the
symbol column. Lineage is truncated each round with localCheckpoint so
R rounds stay R small jobs instead of one exponentially-deep plan.
Production tokenizer trainers (HuggingFace, SentencePiece) collect the
word dict to one machine when it fits; this keeps it distributed, so
vocabulary size is not driver-bound.

Rows-only by design: the merge loop is iterative with a data-dependent
argmax per round — not SQL-expressible in one query. Exactness is
checked instead against an independent pure-Python BPE reference with
identical tie-breaks, token-for-token (tests/test_bpe.py), the same
discipline as the CDC chunker and Snowball stemmer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..tables import load
from . import query

N_MERGES = 12


def char_symbols(token: Column) -> Column:
    """A token's initial symbol array: its characters (no end-of-word
    marker — the convention the pure-Python reference mirrors).
    Explicit substring transform rather than split-on-empty-regex, whose
    edge behavior differs across engines; the empty token is guarded
    because ``F.sequence(1, 0)`` counts DOWN (it would fabricate ['','']
    and a phantom ('','') pair the reference never sees)."""
    return F.when(
        F.length(token) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(token)), lambda i: token.substr(i, F.lit(1))
        ),
    ).otherwise(F.array().cast("array<string>"))


def adjacent_pairs(sym: Column) -> Column:
    """struct(l, r) for each adjacent symbol pair; empty when the word
    is a single symbol (sequence(1, 0) would count DOWN — guarded)."""
    return F.when(
        F.size(sym) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(sym) - 1),
            lambda i: F.struct(
                F.element_at(sym, i).alias("l"), F.element_at(sym, i + 1).alias("r")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def merge_pair_expr(
    sym: Column, left: str, right: str, merged_sym: str | None = None
) -> Column:
    """Rewrite one symbol array with (left, right) → ``merged_sym``
    (default left+right — the BPE convention; WordPiece passes
    left + right-without-its-##-prefix) merged leftmost-first,
    non-overlapping — a single JVM array fold, the same greedy order
    the reference implementation uses (an 'aaaa' word under pair (a,a)
    becomes [aa, aa], not [aa, a, a])."""
    merged = F.array(F.lit(merged_sym if merged_sym is not None else left + right))
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(word_counts: DataFrame, n_merges: int = N_MERGES) -> list[tuple]:
    """Learn ``n_merges`` BPE merges from a (token, n) frequency frame.
    Returns [(rank, left, right, merged, n), ...] where n is the
    weighted pair count at the time of the merge. Ties break on
    (count desc, left asc, right asc) so the result is deterministic
    under any partitioning. Each round's argmax collect is exactly ONE
    row; the iterated frame stays vocabulary-bounded throughout."""
    words = word_counts.select(
        F.col("n"), char_symbols(F.col("token")).alias("sym")
    ).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = (
            words.select("n", F.explode(adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:  # every word is a single symbol — vocabulary exhausted
            break
        row = best[0]
        merges.append((rank, row["l"], row["r"], row["l"] + row["r"], row["cnt"]))
        words = words.withColumn(
            "sym", merge_pair_expr(F.col("sym"), row["l"], row["r"])
        ).localCheckpoint()
    return merges


@query("q_bpe_train", category="llm-text", sql=None)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train N_MERGES (= 12) BPE merges on the documents corpus and
    return the merge table (rank, left, right, merged, n). See the
    module docstring for the scale argument; exact-equivalence evidence
    is the pure-Python reference replay in tests/test_bpe.py."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merges = train_bpe(wc, N_MERGES)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, n long"
    )


@query("q_bpe_apply", category="llm-text", sql=None)
def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE merges to the corpus and report per-source
    subword statistics (token count, char count, subword count,
    chars-per-subword compression) — the report tokenizer training is
    run FOR: it decides whether the merge budget actually buys
    sequence-length headroom on each source.

    Scale shape: segmentation is memoized on the VOCABULARY, never
    applied per corpus token occurrence — the corpus is scanned once
    into a (source, token, n) aggregate (vocab×sources-bounded,
    checkpointed), merges train on its token-level rollup, and the R
    chained merge folds rewrite each DISTINCT word exactly once; corpus
    totals are then weighted sums over that small frame. At 100 TB the
    expensive part stays the one corpus scan that q_token_count already
    pays. Rows-only (merge list is data-dependent); exactness via the
    pure-Python reference segmentation replay in tests/test_bpe.py."""
    d = load(spark, sf_dir, "documents")
    wc_src = (
        d.select("source", F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    wc = wc_src.groupBy("token").agg(F.sum("n").alias("n"))
    merges = train_bpe(wc, N_MERGES)
    sym = char_symbols(F.col("token"))
    for _, left, right, _, _ in merges:
        sym = merge_pair_expr(sym, left, right)
    seg = wc_src.withColumn("n_sub", F.size(sym))
    return (
        seg.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.col("n") * F.length("token")).cast("long").alias("n_chars"),
            F.sum(F.col("n") * F.col("n_sub")).cast("long").alias("n_subwords"),
        )
        .withColumn(
            "chars_per_subword", F.round(F.col("n_chars") / F.col("n_subwords"), 4)
        )
    )
