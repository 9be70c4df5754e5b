"""Unigram-LM tokenizer training (queries/unigram.py): exact replay
against an independent pure-Python reference following the module's
determinism contract — the BPE / CDC / Snowball discipline for
rows-only queries (exactness evidence in tests instead of a DuckDB
oracle)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from production_ready_ds_spark.queries.unigram import (
    EM_ROUNDS,
    MAX_PIECE_LEN,
    SEED_MIN_COUNT,
    SEED_VOCAB,
    TARGET_VOCAB,
    train_unigram,
    viterbi_segment,
)


def _ref_viterbi(token: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Independent Viterbi under the contract: dp left-to-right, k
    ascending, win on greater score or equal-and-longer, unknown chars
    at min(logp) - 10."""
    if not token:
        return []
    unk = min(logp.values()) - 10.0
    best: list[tuple[float, int]] = [(0.0, 0)] + [(float("-inf"), 0)] * len(token)
    for i in range(1, len(token) + 1):
        for k in range(1, min(max_len, i) + 1):
            piece = token[i - k : i]
            lp = logp.get(piece, unk if k == 1 else None)
            if lp is None:
                continue
            score = best[i - k][0] + lp
            if score > best[i][0] or (score == best[i][0] and k > best[i][1]):
                best[i] = (score, k)
    out, i = [], len(token)
    while i > 0:
        k = best[i][1]
        out.append(token[i - k : i])
        i -= k
    return out[::-1]


def unigram_reference(word_counts: dict[str, int]) -> list[tuple]:
    """The full trainer with plain dicts/loops, sharing no code with the
    Spark path: position-based substring seeding, EM_ROUNDS Viterbi
    hard-EM passes, char-preserving prune to TARGET_VOCAB, final
    re-fit. Mirrors the contract in queries/unigram.py exactly."""

    def model(counts: dict[str, int]) -> dict[str, float]:
        total = sum(counts.values())
        return {p: math.log(n / total) for p, n in counts.items()}

    def count_pass(logp: dict[str, float], chars: set[str]) -> dict[str, int]:
        got: dict[str, int] = {}
        for w, n in word_counts.items():
            for piece in _ref_viterbi(w, logp, MAX_PIECE_LEN):
                if piece in logp:
                    got[piece] = got.get(piece, 0) + n
        for c in chars:
            got[c] = got.get(c, 0) + 1
        return got

    seeds: dict[str, int] = {}
    for w, n in word_counts.items():
        for i in range(len(w)):
            for k in range(1, min(MAX_PIECE_LEN, len(w) - i) + 1):
                seeds[w[i : i + k]] = seeds.get(w[i : i + k], 0) + n
    chars = {p for p in seeds if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in seeds.items() if len(p) >= 2 and n >= SEED_MIN_COUNT),
        key=lambda kv: (-kv[1], kv[0]),
    )[:SEED_VOCAB]
    counts = {p: n for p, n in seeds.items() if len(p) == 1}
    counts.update(dict(multi))
    if not counts:
        return []
    for _ in range(EM_ROUNDS):
        counts = count_pass(model(counts), chars)
    keep_multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, TARGET_VOCAB - len(chars))]
    counts = {p: n for p, n in counts.items() if len(p) == 1}
    counts.update(dict(keep_multi))
    counts = count_pass(model(counts), chars)
    logp = model(counts)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [
        (rank, p, n, round(logp[p], 6))
        for rank, (p, n) in enumerate(ordered, start=1)
    ]


def _corpus_word_counts(spark, sf_dir) -> dict[str, int]:
    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.tables import load

    d = load(spark, sf_dir, "documents")
    rows = (
        d.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("token")
        .count()
        .collect()
    )
    return {r["token"]: r["count"] for r in rows}


def test_unigram_train_matches_pure_python_reference_on_corpus(spark, sf_small):
    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.tables import load

    d = load(spark, sf_small, "documents")
    wc = (
        d.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = unigram_reference(_corpus_word_counts(spark, sf_small))
    got = train_unigram(wc)
    assert got == expected


def test_unigram_every_corpus_char_survives_training(spark, sf_small):
    word_counts = _corpus_word_counts(spark, sf_small)
    pieces = {p for _, p, _, _ in unigram_reference(word_counts)}
    corpus_chars = {c for w in word_counts for c in w}
    assert corpus_chars <= pieces


def test_unigram_segmentation_reconstructs_every_token(spark, sf_small):
    word_counts = _corpus_word_counts(spark, sf_small)
    logp = {p: lp for _, p, _, lp in unigram_reference(word_counts)}
    for w in word_counts:
        seg = viterbi_segment(w, logp, MAX_PIECE_LEN)
        assert "".join(seg) == w
        assert all(p in logp for p in seg)


def test_unigram_apply_matches_reference_segmentation(spark, sf_small):
    """q_unigram_apply's per-source totals must equal totals derived by
    segmenting with the reference model's ROUNDED logp table — the same
    values the Spark path feeds its final pass."""
    from production_ready_ds_spark.functions.text import tokens_expr
    from production_ready_ds_spark.queries import catalog
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
    logp = {p: lp for _, p, _, lp in unigram_reference(word_counts)}
    expected: dict[str, tuple[int, int, int]] = {}
    for r in rows:
        src, tok, n = r["source"], r["token"], r["count"]
        n_pieces = len(_ref_viterbi(tok, logp, MAX_PIECE_LEN))
        t, c, p = expected.get(src, (0, 0, 0))
        expected[src] = (t + n, c + n * len(tok), p + n * n_pieces)
    got = {
        r["source"]: (r["n_tokens"], r["n_chars"], r["n_pieces"])
        for r in catalog()["q_unigram_apply"].fn(spark, sf_small).collect()
    }
    assert got == expected


def test_unigram_deterministic_under_repartition(spark):
    wc_rows = [("banana", 9), ("bandana", 4), ("ananas", 6), ("nab", 2)]
    one = train_unigram(spark.createDataFrame(wc_rows, "token string, n long"))
    many = train_unigram(
        spark.createDataFrame(wc_rows, "token string, n long").repartition(7)
    )
    assert one == many == unigram_reference(dict(wc_rows))


def test_unigram_empty_token_contributes_nothing(spark):
    wc_rows = [("", 5), ("abab", 3)]
    got = train_unigram(spark.createDataFrame(wc_rows, "token string, n long"))
    assert got == unigram_reference(dict(wc_rows))
    assert all(piece for _, piece, _, _ in got)  # no empty piece


def test_unigram_tie_break_prefers_longer_piece():
    # 'ab' vs 'a'+'b' with logp('ab') == logp('a') + logp('b'): the
    # contract says the LONGER piece wins the tie
    logp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert viterbi_segment("ab", logp, 2) == ["ab"]


def test_unigram_unknown_char_falls_back_to_unk():
    logp = {"a": -1.0}
    assert viterbi_segment("axa", logp, 2) == ["a", "x", "a"]


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="ab", min_size=1, max_size=6)


@given(st.dictionaries(_word, st.integers(min_value=1, max_value=5), min_size=1, max_size=6))
@settings(max_examples=5, deadline=None)  # each example is several Spark jobs
def test_unigram_fuzz_matches_reference(spark, word_counts):
    """Adversarial fuzz over a 2-letter alphabet: tiny repetitive words
    maximize score ties, shared-substring seeds, and prune boundaries.
    Spark training must equal the pure-Python reference exactly —
    including every float in the logp column."""
    wc = spark.createDataFrame(list(word_counts.items()), "token string, n long")
    assert train_unigram(wc) == unigram_reference(word_counts)
