"""WordPiece greedy segmentation: exact semantics, cross-engine fuzz
against the recursive-CTE oracle fragment, and the catalog report's
arithmetic."""

from __future__ import annotations

import random

import duckdb

from production_ready_ds_spark.queries.wordpiece import (
    UNK,
    WORDPIECE_MAX_LEN,
    WORDPIECE_VOCAB_SET,
    _vocab_sql,
    wordpiece_segment,
)


def seg(w: str) -> list[str]:
    return wordpiece_segment(w, WORDPIECE_VOCAB_SET, WORDPIECE_MAX_LEN)


def test_greedy_longest_match_semantics():
    # longest-match-first: 'the' beats 't'+'h'+'e'; '##ing' beats chars
    assert seg("the") == ["the"]
    assert seg("working") == ["work", "##ing"]
    # greedy is NOT optimal: it commits to the longest prefix even when
    # a shorter one would segment better downstream — pin that too
    assert seg("data") == ["data"]
    # greedy takes 'under' then has to char-walk the tail ('st' is not
    # a vocab piece) — pin the struggle exactly
    assert seg("underst") == ["under", "##s", "##t"]
    # UNK: any matchless position voids the WHOLE word
    assert seg("naïve") == [UNK]
    assert seg("snake_case") == [UNK]
    assert seg("") == []
    # full alphabet coverage: any [a-z0-9]+ word segments without UNK
    assert UNK not in seg("zzqqxxj9")


def _duck_seg(con, word: str) -> list[str]:
    """One word through the oracle's recursive CTE (same fragment,
    single-word input)."""
    q = f"""
    WITH RECURSIVE vocab AS ({_vocab_sql()}),
    seg AS (
      SELECT ? AS word, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces,
             false AS failed
      UNION ALL
      SELECT word,
             CASE WHEN best IS NULL THEN length(word)
                  WHEN best LIKE '##%' THEN pos + length(best) - 2
                  ELSE pos + length(best) END,
             CASE WHEN best IS NULL THEN ['{UNK}']
                  ELSE list_append(pieces, best) END,
             best IS NULL
      FROM (
        SELECT word, pos, pieces,
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
    )
    SELECT pieces FROM seg WHERE pos >= length(word)
    """
    rows = con.execute(q, [word]).fetchall()
    assert len(rows) == 1, (word, rows)
    return list(rows[0][0])


def test_fuzz_python_equals_recursive_cte():
    con = duckdb.connect()
    rng = random.Random(0xBEEF)
    pool = "abcdefghijklmnopqrstuvwxyz0123456789_"
    words = ["working", "unaffable", "the", "q", "9data9"] + [
        "".join(rng.choice(pool) for _ in range(rng.randrange(1, 14)))
        for _ in range(120)
    ]
    for w in words:
        assert seg(w) == _duck_seg(con, w), w


def test_catalog_report_arithmetic(spark, sf_small):
    from production_ready_ds_spark.queries import catalog

    rows = catalog()["q_wordpiece_apply"].fn(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_pieces >= r.n_words >= 1
        assert 0 <= r.n_unk <= r.n_words
        assert r.fertility_x1000 == (1000 * r.n_pieces) // r.n_words
