"""DuckDB replay of the English Snowball (Porter2) stemmer — the SQL
twin of :mod:`functions.snowball`, generated FROM THE SAME constant
tables (exception dicts, the step-2/3/4 suffix lists, the double and
li-ending sets), so retuning a rule in the Python stemmer cannot leave
the oracle replaying the old algorithm (the shared-constant
convention; cf. the minhash oracle's generated affine family).

The stemmer is a deterministic word → word rewrite: mark consonant-y,
compute the R1/R2 regions, then six suffix-stripping steps, each a
longest-match CASE with region-index guards. Everything is expressible
with substr/length/ends_with/regexp on a per-DISTINCT-word frame, so
:func:`snowball_stems_ctes` emits a WITH-fragment that turns a
``(tok)`` vocabulary CTE into a ``(tok, stem)`` mapping — vocabulary-
bounded work, the same shape the Spark side's Arrow-batched stemmer
relies on (stemming cost scales with |vocab| in the oracle, corpus
tokens join the mapping).

Exactness notes (all pinned in tests/test_snowball.py against the
Python stemmer over every corpus vocabulary + constructed edges):

- consonant-y marking as a GLOBAL non-overlapping regexp replace
  ``([aeiouy])y → \\1Y`` after ``^y → Y`` reproduces the sequential
  scan exactly: RE2 resumes scanning after each replacement, so a y
  following a freshly-marked Y is (correctly) not re-matched, while a
  y following an unmarked y is — the same left-to-right semantics.
- R1 = chars consumed by the non-greedy ``^.*?[aeiouy][^aeiouy]``
  prefix match (whole word if none), with the gener/commun/arsen
  overrides; R2 applies the same scan to ``substr(w, r1+1)``.
- Python's break-on-first-suffix-match (even when the region guard
  then fails) maps to a flat CASE chain in the same list order, with
  the region guard INSIDE each arm.
"""

from __future__ import annotations

from .snowball import (
    _DOUBLES,
    _EXCEPTIONS,
    _EXCEPTIONS_POST_1A,
    _LI_ENDINGS,
    _STEP2,
    _STEP3,
    _STEP4,
)

_V = "aeiouy"  # vowels (marked Y excluded — it is a consonant)


def _strip(col: str, n: int) -> str:
    return f"substr({col}, 1, length({col}) - {n})"


def _short_syllable(s: str) -> str:
    """_ends_short_syllable(s): (len 2: vowel+nonvowel) or
    (len>=3: nonvowel, vowel, nonvowel-not-wxY at the end)."""
    return (
        f"(length({s}) = 2 AND regexp_matches({s}, '^[{_V}][^{_V}]$')) OR "
        f"(length({s}) >= 3 AND regexp_matches({s}, '[^{_V}][{_V}][^{_V}wxY]$'))"
    )


def _region_after(s: str) -> str:
    """Chars consumed in ``s`` up to and including the first
    non-vowel-after-a-vowel; len(s) if none."""
    return (
        f"CASE WHEN regexp_matches({s}, '[{_V}][^{_V}]') "
        f"THEN length(regexp_extract({s}, '^(.*?[{_V}][^{_V}])')) "
        f"ELSE length({s}) END"
    )


def _1b_fix(suf: str) -> str:
    """The ingly/edly/ing/ed branch: strip when the stem has a vowel,
    then at/bl/iz → +e, doubled consonant → -1, short word → +e."""
    n = len(suf)
    st = _strip("w", n)
    dbl = " OR ".join(f"ends_with({st}, '{d}')" for d in _DOUBLES)
    return (
        f"CASE WHEN regexp_matches({st}, '[{_V}]') THEN "
        f"CASE WHEN ends_with({st}, 'at') OR ends_with({st}, 'bl') "
        f"OR ends_with({st}, 'iz') THEN {st} || 'e' "
        f"WHEN {dbl} THEN {_strip('w', n + 1)} "
        f"WHEN r1 >= length({st}) AND ({_short_syllable(st)}) THEN {st} || 'e' "
        f"ELSE {st} END "
        f"ELSE w END"
    )


def _suffix_case(rules, r_col: str, else_expr: str = "w") -> str:
    """Flat CASE in list order: first ends_with match wins; the region
    guard (vs ``r_col``) sits inside the arm (match-but-out-of-region
    keeps w and still stops the chain — the Python break)."""
    arms = []
    for suf, repl in rules:
        n = len(suf)
        rewrite = _strip("w", n) + (f" || '{repl}'" if repl else "")
        arms.append(
            f"WHEN ends_with(w, '{suf}') THEN "
            f"CASE WHEN length(w) - {n} >= {r_col} THEN {rewrite} ELSE w END"
        )
    return "CASE " + " ".join(arms) + f" ELSE {else_expr} END"


def snowball_stems_ctes(src: str = "sbv") -> str:
    """CTE fragment turning ``{src}(tok)`` into ``sb_stems(tok, stem)``
    — append inside a WITH list. ``fin`` short-circuits the exception
    lists and the <=2-char passthrough; every later step is a no-op
    when fin is set."""
    exc = " ".join(
        f"WHEN w = '{k}' THEN '{v}'" for k, v in sorted(_EXCEPTIONS.items())
    )
    p1a = ", ".join(f"'{x}'" for x in sorted(_EXCEPTIONS_POST_1A))
    li = ", ".join(f"'{c}'" for c in sorted(_LI_ENDINGS))

    # step 2 with the ization/izer R2 collapse mirrored on the r2 column
    s2_w = _suffix_case(
        _STEP2,
        "r1",
        else_expr=(
            "CASE WHEN ends_with(w, 'ogi') THEN "
            "CASE WHEN length(w) - 3 >= r1 AND length(w) >= 4 "
            "AND substr(w, length(w) - 3, 1) = 'l' "
            f"THEN {_strip('w', 1)} ELSE w END "
            "WHEN ends_with(w, 'li') THEN "
            f"CASE WHEN length(w) - 2 >= r1 AND length(w) >= 3 "
            f"AND substr(w, length(w) - 2, 1) IN ({li}) "
            f"THEN {_strip('w', 2)} ELSE w END "
            "ELSE w END"
        ),
    )
    s2_r2_arms = []
    for suf, repl in _STEP2:
        n = len(suf)
        if suf in ("ization", "izer"):
            s2_r2_arms.append(
                f"WHEN ends_with(w, '{suf}') THEN "
                f"CASE WHEN length(w) - {n} >= r1 AND r2 > length(w) - {n} "
                f"THEN length(w) - {n} + {len(repl)} + 1 ELSE r2 END"
            )
        else:
            s2_r2_arms.append(f"WHEN ends_with(w, '{suf}') THEN r2")
    s2_r2 = "CASE " + " ".join(s2_r2_arms) + " ELSE r2 END"

    s3_w = _suffix_case(
        _STEP3,
        "r1",
        else_expr=(
            "CASE WHEN ends_with(w, 'ative') AND length(w) - 5 >= r2 "
            f"THEN {_strip('w', 5)} ELSE w END"
        ),
    )

    s4_arms = []
    for suf in _STEP4:
        n = len(suf)
        if suf == "ion":
            s4_arms.append(
                "WHEN ends_with(w, 'ion') THEN "
                "CASE WHEN length(w) - 3 >= r2 AND length(w) > 3 "
                "AND substr(w, length(w) - 3, 1) IN ('s', 't') "
                f"THEN {_strip('w', 3)} ELSE w END"
            )
        else:
            s4_arms.append(
                f"WHEN ends_with(w, '{suf}') THEN "
                f"CASE WHEN length(w) - {n} >= r2 THEN {_strip('w', n)} ELSE w END"
            )
    s4_w = "CASE " + " ".join(s4_arms) + " ELSE w END"

    e_stem = _strip("w", 1)
    s5_w = (
        f"CASE WHEN ends_with(w, 'e') AND (length(w) - 1 >= r2 OR "
        f"(length(w) - 1 >= r1 AND NOT ({_short_syllable(e_stem)}))) "
        f"THEN {e_stem} "
        f"WHEN ends_with(w, 'll') AND length(w) - 1 >= r2 THEN {e_stem} "
        "ELSE w END"
    )

    return f"""
    sb0 AS (SELECT tok, lower(tok) AS w FROM {src}),
    sb1 AS (
      SELECT tok, w,
             CASE WHEN length(w) <= 2 THEN w {exc} END AS fin
      FROM sb0
    ),
    sb_m AS (
      SELECT tok, fin,
             regexp_replace(regexp_replace(
               CASE WHEN starts_with(w, '''') THEN substr(w, 2) ELSE w END,
               '^y', 'Y'), '([{_V}])y', '\\1Y', 'g') AS w
      FROM sb1
    ),
    sb_r1 AS (
      SELECT tok, fin, w,
             CASE WHEN starts_with(w, 'commun') THEN 6
                  WHEN starts_with(w, 'gener') OR starts_with(w, 'arsen') THEN 5
                  ELSE {_region_after('w')} END AS r1
      FROM sb_m
    ),
    sb_r AS (
      SELECT tok, fin, w, r1,
             r1 + {_region_after('substr(w, r1 + 1)')} AS r2
      FROM sb_r1
    ),
    sb_s0 AS (
      SELECT tok, fin, r1, r2,
             CASE WHEN fin IS NOT NULL THEN w
                  WHEN ends_with(w, '''s''') THEN {_strip('w', 3)}
                  WHEN ends_with(w, '''s') THEN {_strip('w', 2)}
                  WHEN ends_with(w, '''') THEN {_strip('w', 1)}
                  ELSE w END AS w
      FROM sb_r
    ),
    sb_s1a AS (
      SELECT tok, fin, r1, r2,
             CASE WHEN fin IS NOT NULL THEN w
                  WHEN ends_with(w, 'sses') THEN {_strip('w', 2)}
                  WHEN ends_with(w, 'ied') OR ends_with(w, 'ies') THEN
                    CASE WHEN length(w) > 4 THEN {_strip('w', 2)}
                         ELSE {_strip('w', 1)} END
                  WHEN ends_with(w, 'us') OR ends_with(w, 'ss') THEN w
                  WHEN ends_with(w, 's') THEN
                    CASE WHEN regexp_matches({_strip('w', 2)}, '[{_V}]')
                         THEN {_strip('w', 1)} ELSE w END
                  ELSE w END AS w
      FROM sb_s0
    ),
    sb_p1a AS (
      SELECT tok, r1, r2, w,
             CASE WHEN fin IS NULL AND w IN ({p1a}) THEN w ELSE fin END AS fin
      FROM sb_s1a
    ),
    sb_s1b AS (
      SELECT tok, fin, r1, r2,
             CASE WHEN fin IS NOT NULL THEN w
                  WHEN ends_with(w, 'eedly') THEN
                    CASE WHEN length(w) - 5 >= r1
                         THEN {_strip('w', 5)} || 'ee' ELSE w END
                  WHEN ends_with(w, 'eed') THEN
                    CASE WHEN length(w) - 3 >= r1
                         THEN {_strip('w', 3)} || 'ee' ELSE w END
                  WHEN ends_with(w, 'ingly') THEN {_1b_fix('ingly')}
                  WHEN ends_with(w, 'edly') THEN {_1b_fix('edly')}
                  WHEN ends_with(w, 'ing') THEN {_1b_fix('ing')}
                  WHEN ends_with(w, 'ed') THEN {_1b_fix('ed')}
                  ELSE w END AS w
      FROM sb_p1a
    ),
    sb_s1c AS (
      SELECT tok, fin, r1, r2,
             CASE WHEN fin IS NULL AND length(w) > 2
                       AND regexp_matches(w, '[^{_V}][yY]$')
                  THEN {_strip('w', 1)} || 'i' ELSE w END AS w
      FROM sb_s1b
    ),
    sb_s2 AS (
      SELECT tok, fin, r1,
             CASE WHEN fin IS NOT NULL THEN r2 ELSE {s2_r2} END AS r2,
             CASE WHEN fin IS NOT NULL THEN w ELSE {s2_w} END AS w
      FROM sb_s1c
    ),
    sb_s3 AS (
      SELECT tok, fin, r1, r2,
             CASE WHEN fin IS NOT NULL THEN w ELSE {s3_w} END AS w
      FROM sb_s2
    ),
    sb_s4 AS (
      SELECT tok, fin, r1, r2,
             CASE WHEN fin IS NOT NULL THEN w ELSE {s4_w} END AS w
      FROM sb_s3
    ),
    sb_s5 AS (
      SELECT tok, fin,
             CASE WHEN fin IS NOT NULL THEN w ELSE {s5_w} END AS w
      FROM sb_s4
    ),
    sb_stems AS (
      SELECT tok, replace(COALESCE(fin, w), 'Y', 'y') AS stem FROM sb_s5
    )"""
