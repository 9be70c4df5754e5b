"""WordPiece training (queries/wordpiece.py): exact replay against an
independent pure-Python reference with identical scoring and
tie-breaks — the train_bpe discipline (rows-only trainers earn their
exactness evidence here instead of a DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.queries.wordpiece import (
    N_WP_MERGES,
    train_wordpiece,
    wp_merged_symbol,
)


def wordpiece_reference(word_counts: dict[str, int], n_merges: int) -> list[tuple]:
    """Likelihood-scored dictionary WordPiece (Schuster & Nakajima):
    symbols are first-char + ##continuations, each round merges the
    pair maximizing cnt/(l_cnt*r_cnt) (double division of exact ints,
    ties broken pair-ascending). Plain dicts/loops, sharing no code
    with the Spark path."""
    vocab = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in word_counts if w
    }
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        sym_counts: dict[str, int] = {}
        for w, n in word_counts.items():
            if not w:
                continue
            syms = vocab[w]
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + n
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        (left, right), cnt = min(
            pair_counts.items(),
            key=lambda kv: (
                -(kv[1] / (sym_counts[kv[0][0]] * sym_counts[kv[0][1]])),
                kv[0][0],
                kv[0][1],
            ),
        )
        merged = left + (right[2:] if right.startswith("##") else right)
        merges.append(
            (rank, left, right, merged, cnt, sym_counts[left], sym_counts[right])
        )
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_wordpiece_train_matches_reference_on_corpus(spark, sf_small):
    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.tables import load

    d = load(spark, sf_small, "documents")
    wc = (
        d.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = wordpiece_reference(
        {r["token"]: r["n"] for r in wc.collect()}, N_WP_MERGES
    )
    got = train_wordpiece(wc, N_WP_MERGES)
    assert got == expected


def test_wordpiece_prefers_exclusive_pairs_over_frequent_ones(spark):
    """The likelihood score's defining behavior: (q,u) always co-occur
    (score 1/cnt) and must beat (t,h), which is more FREQUENT but both
    of whose symbols also appear apart — raw-count BPE would pick (t,h)
    first; WordPiece must not."""
    rows = [("qu", 4), ("the", 10), ("ten", 10), ("hat", 10)]
    wc = spark.createDataFrame(rows, "token string, n long")
    got = train_wordpiece(wc, 1)
    assert got[0][1:4] == ("q", "##u", "qu"), got


def test_wordpiece_merged_symbol_folds_continuation_marker():
    assert wp_merged_symbol("pl", "##ay") == "play"
    assert wp_merged_symbol("##a", "##y") == "##ay"
    assert wp_merged_symbol("a", "b") == "ab"


def test_wordpiece_train_tie_breaks_deterministic(spark):
    """Equal likelihood scores: the pair-ascending tie-break decides,
    independent of partitioning."""
    wc = spark.createDataFrame(
        [("cd", 5), ("ab", 5)], "token string, n long"
    ).repartition(4)
    got = train_wordpiece(wc, 1)
    assert got[0][1:4] == ("a", "##b", "ab")
