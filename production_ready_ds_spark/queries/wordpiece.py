"""WordPiece greedy segmentation (Wu et al. 2016, the BERT tokenizer)
— the third member of the tokenizer family beside BPE merge training
(queries/bpe.py) and the unigram-LM trainer (queries/unigram.py):
where those two TRAIN a vocabulary, WordPiece APPLICATION is the
deterministic greedy longest-match-first algorithm every BERT-lineage
pipeline runs at ingest: at each position consume the LONGEST vocab
piece that matches (continuation pieces carry the ``##`` prefix); a
position with no match makes the whole word ``[UNK]``.

Unlike the trainers (rows-only: iterative model state), APPLICATION
over a FIXED vocabulary is a pure function — and it turns out to be
SQL-expressible: the oracle replays the greedy loop as a DuckDB
RECURSIVE CTE whose step picks the longest matching piece via a
correlated scalar subquery over the vocab relation, so every per-doc
piece count, UNK count, fertility ratio, and an md5 checksum over the
space-joined piece strings sit under the full driver hash gate. The
Spark side never recurses: segmentation is one Arrow-batched
pandas_udf per WORD (explode → greedy match in Python → per-doc
aggregate), with the checksum computed by the shared JVM-side
md5_prefix_int over the udf's piece string — the engines hash the
same bytes through the same one-definition helper.

Scale shape: explode is map-side; the udf is linear in characters
(longest-match with a max-piece-length window); the per-doc aggregate
is one map-side-combined hash-agg. The recursive CTE exists ONLY in
the oracle. The demo vocabulary is a fixed module constant (full
[a-z0-9] alphabet + ## twins so any ASCII token segments without UNK,
plus common English subwords so fertility is realistic); a production
run swaps in a trained vocab file — the kernel takes any piece set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.text import md5_prefix_int, md5_prefix_int_sql, tokens_expr
from ..tables import load
from . import query
from .llm import _DUCK_TOKENS

_SUBWORDS = (
    "the", "and", "ing", "ion", "tion", "ation", "ed", "er", "est", "ly",
    "ment", "ness", "able", "ible", "ous", "ive", "al", "ic", "ful",
    "less", "ish", "ize", "ise", "ity", "ant", "ent", "ance", "ence",
    "ure", "age", "ism", "ist", "ster", "ship", "hood", "ward", "wise",
    "re", "un", "in", "dis", "en", "non", "over", "under", "out", "up",
    "pre", "post", "pro", "anti", "de", "sub", "inter", "trans", "super",
    "semi", "mid", "mis", "co", "ex", "data", "work", "time", "day",
    "man", "men", "land", "light", "house", "water", "word", "world",
)

#: The fixed demo vocabulary: every [a-z0-9] single (initial AND ##
#: continuation form — guarantees any plain-ASCII token segments
#: without UNK) plus common English prefixes/suffixes/roots in both
#: forms. Tokens containing characters outside [a-z0-9] (underscore,
#: unicode letters) hit a matchless position and become [UNK] — the
#: standard WordPiece rule, identical in both engines.
WORDPIECE_VOCAB: tuple[str, ...] = tuple(
    sorted(
        {c for c in "abcdefghijklmnopqrstuvwxyz0123456789"}
        | {"##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"}
        | set(_SUBWORDS)
        | {"##" + s for s in _SUBWORDS}
    )
)

UNK = "[UNK]"

#: Derived once here — the CLI, the Spark kernel, and the tests all
#: consume THESE instead of re-deriving the set/max-length rule (the
#: md5_prefix_int one-definition discipline).
WORDPIECE_VOCAB_SET: frozenset[str] = frozenset(WORDPIECE_VOCAB)
WORDPIECE_MAX_LEN: int = max(
    len(p) - 2 if p.startswith("##") else len(p) for p in WORDPIECE_VOCAB
)


def wordpiece_segment(word: str, vocab: frozenset[str], max_len: int) -> list[str]:
    """Greedy longest-match-first — the ONE reference implementation
    (the Spark kernel calls it; tests replay it independently)."""
    pos, n, pieces = 0, len(word), []
    while pos < n:
        end = min(n, pos + max_len)
        found = None
        while end > pos:
            cand = word[pos:end]
            key = cand if pos == 0 else "##" + cand
            if key in vocab:
                found = key
                break
            end -= 1
        if found is None:
            return [UNK]
        pieces.append(found)
        pos = end
    return pieces


def _vocab_sql() -> str:
    vals = ", ".join("'" + p + "'" for p in WORDPIECE_VOCAB)
    return f"SELECT unnest([{vals}]) AS piece"


_WORDPIECE_SQL = f"""
    WITH RECURSIVE vocab AS ({_vocab_sql()}),
    words AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS word
      FROM documents
    ),
    seg AS (
      SELECT doc_id, word, 0 AS pos,
             CAST([] AS VARCHAR[]) AS pieces, false AS failed
      FROM words
      UNION ALL
      SELECT doc_id, word,
             CASE WHEN best IS NULL THEN length(word)
                  WHEN best LIKE '##%' THEN pos + length(best) - 2
                  ELSE pos + length(best) END AS pos,
             CASE WHEN best IS NULL THEN ['{UNK}']
                  ELSE list_append(pieces, best) END AS pieces,
             best IS NULL AS failed
      FROM (
        SELECT doc_id, word, pos, pieces,
               (SELECT v.piece FROM vocab v
                WHERE CASE WHEN pos = 0
                      THEN v.piece NOT LIKE '##%'
                           AND v.piece = substr(word, 1, length(v.piece))
                      ELSE v.piece LIKE '##%' AND length(v.piece) > 2
                           AND substr(v.piece, 3)
                               = substr(word, pos + 1, length(v.piece) - 2)
                      END
                ORDER BY length(v.piece) DESC, v.piece
                LIMIT 1) AS best
        FROM seg WHERE pos < length(word) AND NOT failed
      )
    ),
    done AS (
      SELECT doc_id, array_to_string(pieces, ' ') AS ps, len(pieces) AS np
      FROM seg WHERE pos >= length(word)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_pieces,
           CAST(SUM(CASE WHEN ps = '{UNK}' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unk,
           (1000 * CAST(SUM(np) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
             AS fertility_x1000,
           CAST(SUM({md5_prefix_int_sql("ps")}) AS BIGINT) AS pieces_checksum
    FROM done
    GROUP BY doc_id
"""


@query("q_wordpiece_apply", category="llm-text", bench=True, sql=_WORDPIECE_SQL)
def q_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece tokenization report per document over the fixed demo
    vocabulary: word/piece/UNK counts, fertility (pieces per word,
    integer ×1000 — the metric tokenizer teams actually compare), and
    an md5 checksum over every word's space-joined piece string (any
    single segmentation difference anywhere moves it). See the module
    docstring for the greedy algorithm, the recursive-CTE oracle, and
    the scale shape (Spark side: explode → Arrow greedy matcher →
    one hash-agg; linear, no recursion, no shuffle beyond the final
    per-doc aggregate).

    Shape note (round 8, measured): the BPE/unigram-style GLOBAL
    distinct-word memoization was built and A/B-measured against this
    per-occurrence-with-per-batch-memo plan — and LOST at every probe
    point (16× stress: 2.5 s vs 5.4 s pre-agg / 6.1 s broadcast-join;
    64×: 4.2 s vs 10.1 s both): the per-batch memo already reduces
    Arrow-kernel work to ~distinct-words-per-batch on Zipfian text, so
    the global variants only add shuffles (the (doc, word) pre-agg or
    the join back to occurrences) without removing measurable UDF
    time. SCALE.md "Round 8: WordPiece" has the numbers; revisit only
    if a profile shows the segmentation kernel (not the shuffle)
    dominating."""
    from pyspark.sql.functions import pandas_udf

    vocab = WORDPIECE_VOCAB_SET
    max_len = WORDPIECE_MAX_LEN

    def _seg(words):
        import pandas as pd

        # per-batch memo: natural text is Zipfian, so most exploded
        # occurrences repeat a few hundred word types — segment each
        # DISTINCT word once per Arrow batch
        cache: dict[str, tuple[str, int]] = {}

        def one(w):
            got = cache.get(w)
            if got is None:
                pieces = wordpiece_segment(w, vocab, max_len)
                got = (" ".join(pieces), len(pieces))
                cache[w] = got
            return got

        out = [one(w) for w in words]
        return pd.DataFrame(
            {"ps": [o[0] for o in out], "np": [o[1] for o in out]}
        )

    seg_udf = pandas_udf(_seg, "ps string, np long")
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("word")
    )
    segged = words.select("doc_id", seg_udf(F.col("word")).alias("s"))
    per_word = segged.select(
        "doc_id",
        F.col("s.ps").alias("ps"),
        F.col("s.np").alias("np"),
        md5_prefix_int(F.col("s.ps")).alias("h"),
    )
    return per_word.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("np").cast("long").alias("n_pieces"),
        F.sum(F.when(F.col("ps") == UNK, 1).otherwise(0))
        .cast("long")
        .alias("n_unk"),
        F.expr("(1000 * sum(np)) div count(1)").alias("fertility_x1000"),
        F.sum("h").cast("long").alias("pieces_checksum"),
    )


# ----------------------------------------------------- trainer ---------

N_WP_MERGES = 12


def wp_char_symbols(token):
    """A word's initial WordPiece symbol array: first character plain,
    every later character ##-prefixed (the continuation convention the
    apply query's vocabulary uses). Empty words guarded like
    bpe.char_symbols (sequence(1, 0) counts DOWN)."""
    return F.when(
        F.length(token) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(token)),
            lambda i: F.when(i == 1, token.substr(i, F.lit(1))).otherwise(
                F.concat(F.lit("##"), token.substr(i, F.lit(1)))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def wp_merged_symbol(left: str, right: str) -> str:
    """left + right with right's ## continuation marker folded away —
    ("pl", "##ay") merges to "play" when word-initial, ("##a", "##y")
    to "##ay"."""
    return left + (right[2:] if right.startswith("##") else right)


def train_wordpiece(word_counts: DataFrame, n_merges: int = N_WP_MERGES) -> list[tuple]:
    """Learn ``n_merges`` WordPiece merges from a (token, n) frequency
    frame — the bpe.train_bpe loop with the LIKELIHOOD score (Schuster &
    Nakajima 2012 / the BERT trainer): each round merges the pair
    maximizing count(l,r) / (count(l)·count(r)) — the pair whose fusion
    most raises a unigram LM's corpus likelihood — instead of the raw
    pair count, which is what makes WordPiece prefer 'qu' (always
    together) over 'th' (frequent but independent). Returns
    [(rank, left, right, merged, cnt, l_cnt, r_cnt), ...] with the
    EXACT integer counts behind each score, never the float ratio.

    Determinism: the argmax orders on the double ratio
    cnt/(l_cnt·r_cnt) with (l, r) ascending tie-breaks; the pure-Python
    reference computes the identical IEEE division from the identical
    exact integers (tests/test_wordpiece_train.py), so ranking cannot
    drift. (Counts here are far below 2^53, so the double products are
    exact; at 100 TB swap the comparator to the integer cross-product
    rule a.cnt·b.l_cnt·b.r_cnt vs b.cnt·a.l_cnt·a.r_cnt.)

    Scale shape: identical to train_bpe — the corpus is scanned once
    into the vocabulary-bounded word-count frame; each round is one
    pair-count aggregate, one symbol-count aggregate, TWO broadcast
    joins of the pair frame against the symbol counts, one 1-row
    argmax collect, one array-fold rewrite; localCheckpoint truncates
    lineage per round."""
    from .bpe import adjacent_pairs, merge_pair_expr

    words = word_counts.select(
        F.col("n"), wp_char_symbols(F.col("token")).alias("sym")
    ).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            words.select("n", F.explode(adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
        )
        syms = (
            words.select("n", F.explode(F.col("sym")).alias("s"))
            .groupBy("s")
            .agg(F.sum("n").alias("scnt"))
        )
        scored = (
            pairs.join(
                broadcast(syms.select(F.col("s").alias("l"), F.col("scnt").alias("l_cnt"))),
                "l",
            )
            .join(
                broadcast(syms.select(F.col("s").alias("r"), F.col("scnt").alias("r_cnt"))),
                "r",
            )
            .withColumn(
                "score",
                F.col("cnt").cast("double")
                / (F.col("l_cnt").cast("double") * F.col("r_cnt").cast("double")),
            )
        )
        best = (
            scored.orderBy(F.desc("score"), F.asc("l"), F.asc("r")).limit(1).collect()
        )
        if not best:
            break
        row = best[0]
        merged = wp_merged_symbol(row["l"], row["r"])
        merges.append(
            (rank, row["l"], row["r"], merged, row["cnt"], row["l_cnt"], row["r_cnt"])
        )
        words = words.withColumn(
            "sym", merge_pair_expr(F.col("sym"), row["l"], row["r"], merged)
        ).localCheckpoint()
    return merges


@query("q_wordpiece_train", category="llm-text", sql=None)
def q_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train N_WP_MERGES (= 12) WordPiece merges on the documents
    corpus and return the merge table with the exact integer counts
    behind each likelihood score — completing train+apply symmetry
    across all three tokenizer families (BPE, unigram-LM, WordPiece).
    Rows-only like the sibling trainers (iterative data-dependent
    argmax); exactness evidence is the independent pure-Python
    reference replay in tests/test_wordpiece_train.py, the
    train_bpe discipline."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merges = train_wordpiece(wc, N_WP_MERGES)
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string,"
        " cnt long, l_cnt long, r_cnt long",
    )
