"""BPE training (queries/bpe.py): exact replay against an independent
pure-Python reference with identical tie-breaks — the same discipline as
the CDC chunker and Snowball stemmer (rows-only queries earn their
exactness evidence here instead of a DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.queries.bpe import N_MERGES, train_bpe


def bpe_reference(word_counts: dict[str, int], n_merges: int) -> list[tuple]:
    """Classic dictionary BPE (Sennrich et al.): count adjacent symbol
    pairs weighted by word frequency, merge the argmax (count desc, then
    pair asc), rewrite leftmost-first non-overlapping. Written with
    plain dicts/loops, sharing no code with the Spark path."""
    vocab = {w: [c for c in w] for w in word_counts}
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, n in word_counts.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + n
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, cnt))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def test_bpe_matches_pure_python_reference_on_corpus(spark, sf_small):
    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.tables import load

    d = load(spark, sf_small, "documents")
    wc = (
        d.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = bpe_reference(
        {r["token"]: r["n"] for r in wc.collect()}, N_MERGES
    )
    got = train_bpe(wc, N_MERGES)
    assert got == expected


def test_bpe_overlapping_pairs_merge_leftmost_first(spark):
    # 'aaaa' under pair (a,a) must become [aa, aa], never [aa, a, a] or
    # a second overlapping merge; frequencies force (a,a) as merge #1
    wc_rows = [("aaaa", 10), ("ab", 3)]
    wc = spark.createDataFrame(wc_rows, "token string, n long")
    got = train_bpe(wc, 2)
    expected = bpe_reference(dict(wc_rows), 2)
    assert got == expected
    assert got[0][1:4] == ("a", "a", "aa")
    # after merging 'aaaa' → [aa, aa], the top remaining pair is (aa, aa)
    assert got[1][1:4] == ("aa", "aa", "aaaa")


def test_bpe_tie_breaks_are_deterministic(spark):
    # equal counts: (a,b) in 'ab' and (c,d) in 'cd' both appear 5 times;
    # the lexicographically smaller pair must win regardless of
    # partitioning or input order
    wc = spark.createDataFrame(
        [("cd", 5), ("ab", 5)], "token string, n long"
    ).repartition(4)
    got = train_bpe(wc, 1)
    assert got[0][1:4] == ("a", "b", "ab")


def test_bpe_exhausted_vocabulary_stops_early(spark):
    wc = spark.createDataFrame([("x", 7), ("y", 2)], "token string, n long")
    assert train_bpe(wc, 5) == []


def test_bpe_apply_matches_reference_segmentation(spark, sf_small):
    """q_bpe_apply's per-source subword totals must equal totals derived
    from the pure-Python reference's final vocabulary state."""
    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.queries import catalog
    from production_ready_ds_spark.queries.bpe import N_MERGES
    from production_ready_ds_spark.tables import load

    d = load(spark, sf_small, "documents")
    rows = (
        d.select("source", F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .count()
        .collect()
    )
    word_counts: dict[str, int] = {}
    for r in rows:
        word_counts[r["token"]] = word_counts.get(r["token"], 0) + r["count"]
    # reference training + its final segmented vocabulary
    vocab = {w: [c for c in w] for w in word_counts}
    for rank, left, right, merged, n in bpe_reference(word_counts, N_MERGES):
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            vocab[w] = out
    expected = {}
    for r in rows:
        src, tok, n = r["source"], r["token"], r["count"]
        t, c, sub = expected.get(src, (0, 0, 0))
        expected[src] = (t + n, c + n * len(tok), sub + n * len(vocab[tok]))
    got = {
        r["source"]: (r["n_tokens"], r["n_chars"], r["n_subwords"])
        for r in catalog()["q_bpe_apply"].fn(spark, sf_small).collect()
    }
    assert got == expected


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="ab", min_size=1, max_size=6)


@given(st.dictionaries(_word, st.integers(min_value=1, max_value=5), min_size=1, max_size=8))
@settings(max_examples=8, deadline=None)  # each example is several Spark jobs
def test_bpe_fuzz_matches_reference(spark, word_counts):
    """Adversarial fuzz over a 2-letter alphabet: tiny words maximize
    overlapping-pair, tie, and merged-symbol-reuse cases (merges like
    ('a','a') then ('aa','aa')) that the corpus replay rarely hits.
    Spark training must equal the pure-Python reference exactly."""
    wc = spark.createDataFrame(list(word_counts.items()), "token string, n long")
    assert train_bpe(wc, 4) == bpe_reference(word_counts, 4)


def test_bpe_empty_token_contributes_nothing(spark):
    """Regression (review finding): an empty token must produce an empty
    symbol array, not the phantom ['',''] that F.sequence(1, 0)'s
    count-DOWN behavior would fabricate — train_bpe on a dict containing
    '' must match the reference exactly."""
    wc_rows = [("", 5), ("ab", 3)]
    wc = spark.createDataFrame(wc_rows, "token string, n long")
    got = train_bpe(wc, 1)
    assert got == bpe_reference(dict(wc_rows), 1)
    assert got[0][1:4] == ("a", "b", "ab")
