"""Bounded-memory sketch operators: Misra-Gries heavy hitters, a
Bloom-filter membership bitmap, and a Count-Min frequency sketch.

Members of the engine's mergeable-sketch family (HLL for distinct
counts, GK for percentiles — SCALE.md "Sketches"). Misra-Gries: find
every item whose frequency exceeds N/k WITHOUT a full-cardinality
groupBy. Bloom: a constant-size set-membership bitmap built by one
map-side-combinable aggregate, tested by a pure column expression —
the scale path for "does this value appear in that set" when the set
is too large to broadcast exactly (see q_decontaminate_bloom).
At 100 TB a token-level ``groupBy`` shuffles one row per distinct token
(billions); the Misra-Gries pass reduces each partition to at most
``k`` candidate rows in a single map-side sweep, and the classic
two-pass protocol (candidates → exact recount of candidates only)
returns EXACT heavy-hitter counts with a shuffle bounded by
|partitions|·k + |candidates|.

Soundness of the candidate pass (why the second pass can trust it):
if an item's global frequency exceeds N/k, then by averaging there is
at least one partition where its local frequency exceeds that
partition's N_p/k, and a Misra-Gries(k) summary of that partition
retains every such item — so the UNION of per-partition candidate keys
is a superset of the true heavy hitters. The reduction below is the
mergeable-summaries form: add exact batch counts, then subtract the
(k+1)-th LARGEST counter from everything and drop non-positives — one
O(D log k) pass leaving ≤ k survivors (an earlier subtract-the-minimum
loop was O(D²) on mostly-distinct batches). Each subtraction of
``cut`` removes ≥ (k+1)·cut total mass, so any item's undercount is
≤ N_p/(k+1) — the same bound as item-at-a-time MG.

Each output row also carries the emitting partition's id and row
count, so callers get the global N by summing one row per partition —
WITHOUT a second full scan of the input (the two-pass query needs N
for its threshold; recomputing it would re-tokenize the whole corpus).

This is deliberately a PYTHON pass (``mapInPandas``, Arrow-batched,
dict of ≤ k counters): the sketch is inherently sequential per
partition and k is tiny, so the work is O(rows) dict updates — the
data never leaves the executor, nothing shuffles, and the JVM paths
(q_sort_topk's TakeOrdered, q_tokenize_explode's full groupBy) remain
the right tool when full cardinality is affordable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 100

# Bloom-filter defaults. m must be sized to the KEY COUNT, never
# guessed: an undersized bitmap saturates and the pass rate collapses
# toward 1 (measured: a fixed 2^17 bitmap over sf0.1's ~70k probe
# shingles let 38% of the corpus through — use bloom_m_for).
BLOOM_M_BITS = 1 << 17
BLOOM_K_HASHES = 3
_WORD_BITS = 32  # 32 bits per bitmap word so shiftleft(1L, bit) stays positive


def bloom_m_for(n_keys: int, bits_per_key: int = 14) -> int:
    """Bitmap size for ``n_keys`` members: next power of two ≥
    bits_per_key·n (14 bits/key ≈ 1e-3 fpp at k=3), floored at the
    default. Power-of-two m keeps pmod cheap and the word count a
    round row-group size."""
    m = BLOOM_M_BITS
    while m < bits_per_key * n_keys:
        m <<= 1
    return m


def _bloom_positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of a value: pmod(xxhash64(seed_i, v), m).
    Seeded by prepending a literal int to the hash input — xxhash64 has
    no seed parameter, but hashing (i, v) gives k independent families.
    All JVM-side, whole-stage-codegen friendly."""
    return [F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits)) for i in range(k)]


@dataclass(frozen=True)
class BloomFilter:
    """A built Bloom bitmap plus the hash count it was built with.

    BOTH test-side parameters are derived from this object — m from the
    word count, k carried explicitly — so a membership test can never
    run with a different (m, k) than the build. A desynced m, or a
    test-side k larger than the build k, silently yields FALSE
    NEGATIVES — the one error Bloom must not make (round-3 advice)."""

    words: list[int]
    k: int = BLOOM_K_HASHES

    @property
    def m_bits(self) -> int:
        return len(self.words) * _WORD_BITS


def bloom_bitmap(
    values: DataFrame,
    col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K_HASHES,
) -> BloomFilter:
    """Build a Bloom filter over ``values[col]``: a dense bitmap of
    ``m_bits/32`` 32-bit words (stored in longs) packaged with ``k`` as
    a :class:`BloomFilter` so the test side derives both parameters
    from the artifact.

    One map-side-combinable aggregate: explode each value into its k
    bit positions, ``groupBy(word)``/``bit_or(1<<bit)`` — the shuffle
    carries at most ``m_bits/32`` partial rows per map task regardless
    of input size, and the driver collect is bounded by ``m_bits/32``
    (4096 rows at the default), independent of the CORPUS the bitmap
    will screen. m itself scales with the KEY COUNT (bloom_m_for, ~1.75
    bytes/key), so the driver/broadcast footprint is Θ(probe set) —
    ~0.2 GB per 10⁹ probe keys; past what one driver row tolerates,
    shard the key space into B independent (bitmap, prefilter) pairs
    and union the survivor streams — each shard keeps this exact shape.
    The result is the mergeable-summary form of set membership: bitmaps
    of the same (m, k) OR together, so per-partition/per-batch bitmaps
    compose exactly like the HLL/GK/MG sketches in this family."""
    pos = values.select(
        F.explode(F.array(*_bloom_positions(F.col(col), m_bits, k))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / _WORD_BITS).cast("int").alias("w"),
            (F.col("pos") % _WORD_BITS).cast("int").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // _WORD_BITS)
    for row in words:
        bitmap[row["w"]] = row["word"]
    return BloomFilter(bitmap, k)


def _bloom_checks(col: Column, bm: Column, m_bits: int, k: int) -> Column:
    """AND of the k bit tests for ``col`` against bitmap column/literal
    ``bm`` — shared by the literal and broadcast-frame forms so the two
    can never diverge."""
    out = None
    for pos in _bloom_positions(col, m_bits, k):
        check = (
            F.bit_get(
                F.element_at(bm, (pos / _WORD_BITS).cast("int") + F.lit(1)),
                (pos % _WORD_BITS).cast("int"),
            )
            == 1
        )
        out = check if out is None else out & check
    return out


def bloom_maybe_expr(col: Column, bloom: BloomFilter) -> Column:
    """Membership test against a :func:`bloom_bitmap` result: true iff
    all k bit positions of ``col`` are set. No false negatives; false
    positives at the (m, k, n) design rate. BOTH m and k are derived
    from the :class:`BloomFilter` so build and test can never disagree.
    The bitmap rides along as an array<long> LITERAL, so the test is a
    pure map-side column expression — no join, no shuffle, no Python;
    literal codegen cost grows with m, so use :func:`bloom_prefilter`
    on data-sized scans."""
    return _bloom_checks(
        col, F.lit(bloom.words).cast("array<long>"), bloom.m_bits, bloom.k
    )


def bloom_prefilter(df: DataFrame, col: str, bloom: BloomFilter) -> DataFrame:
    """Rows of ``df`` whose ``col`` MAYBE belongs to the filter's set
    (no false negatives). m and k come from the :class:`BloomFilter`,
    like :func:`bloom_maybe_expr`.

    Same semantics as filtering on :func:`bloom_maybe_expr`, but the
    bitmap arrives as a BROADCAST one-row frame instead of an in-plan
    array literal: the literal's codegen cost grows with m (measured
    ~8× wall on the same scan going 2^17 → 2^20 bits), while the
    broadcast array materializes once per executor and each row does
    three O(1) attribute lookups."""
    bm = df.sparkSession.createDataFrame([(bloom.words,)], "_bloom_bm array<long>")
    cond = _bloom_checks(F.col(col), F.col("_bloom_bm"), bloom.m_bits, bloom.k)
    return df.join(F.broadcast(bm)).filter(cond).drop("_bloom_bm")


def misra_gries_candidates(
    items: DataFrame, col: str = "token", k: int = DEFAULT_K
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k rows per partition of
    ``(col, part, part_rows)`` whose value-union contains every value
    with global frequency > N/k. One map-side pass, no shuffle. The
    output value column keeps the input column's type; ``part`` /
    ``part_rows`` identify the partition and its TOTAL row count (the
    same on every row a partition emits), so ``N = Σ part_rows over
    distinct part``. An empty partition emits nothing."""
    import heapq

    import pandas as pd

    from pyspark import TaskContext

    value_type = items.schema[col].dataType.simpleString()

    def summarize(batches):
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for value, cnt in pdf[col].value_counts().items():
                counters[value] = counters.get(value, 0) + int(cnt)
            if len(counters) > k:
                cut = heapq.nlargest(k + 1, counters.values())[-1]
                counters = {v: c - cut for v, c in counters.items() if c > cut}
        if not n_rows:
            return
        pid = TaskContext.get().partitionId()
        yield pd.DataFrame(
            {
                col: list(counters.keys()),
                "part": pid,
                "part_rows": n_rows,
            }
        )

    return items.mapInPandas(
        summarize, f"{col} {value_type}, part int, part_rows long"
    )


# Count-Min defaults: 4 rows × 2048 cols = 8192 counters regardless of
# input cardinality; expected over-count per probe ≈ N/w per row, min
# over d rows. Widen w for tighter estimates, never the corpus.
CMS_W = 2048
CMS_D = 4


def _cms_positions(col: Column, w: int, d: int) -> Column:
    """The exploded (seed, pos) cells of a value — ONE definition shared
    by build and estimate (mirroring _bloom_positions) so the two can
    never hash differently. A build/estimate (w, d) mismatch sends
    probes to the wrong cells and can UNDERCOUNT, silently breaking the
    never-under contract — callers must pass the build's (w, d) to
    :func:`cms_estimate` (round-3 advice)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("seed"),
                    F.pmod(F.xxhash64(F.lit(i), col), F.lit(w)).alias("pos"),
                )
                for i in range(d)
            ]
        )
    )


def cms_table(items: DataFrame, col: str, w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """Count-Min sketch of ``items[col]`` as a (seed, pos, cnt) frame —
    at most d·w rows total, one map-side-combinable aggregate to build.

    The frame FORM is what makes it a distributed sketch: partial
    aggregation compresses every partition to ≤ d·w partial rows before
    the shuffle (bounded by the sketch size, not the data), and two
    sketches MERGE by union + re-aggregation — the same mergeability
    contract as the HLL/GK/MG/Bloom members of this family
    (tests pin union(cms(a), cms(b)) ≡ cms(a ∪ b) exactly).
    Complements Misra-Gries: MG returns exact heavy-hitter counts in
    two passes; CMS answers any-key frequency estimates in ONE pass
    under the same bounded memory, over-counting by ≈ N/w per row
    (min over d rows), never under-counting."""
    pos = items.select(_cms_positions(F.col(col), w, d).alias("sp"))
    return (
        pos.groupBy(F.col("sp.seed").alias("seed"), F.col("sp.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, col: str, w: int = CMS_W, d: int = CMS_D
) -> DataFrame:
    """Frequency estimates for ``probes[col]`` against a
    :func:`cms_table` frame: each probe hashes to its d (seed, pos)
    cells, a LEFT join fetches the counters (an untouched cell is an
    exact 0), and the estimate is the min over rows. The join's left
    side is |probes|·d rows — probes are the small side by design, so
    at scale broadcast the PROBES, stream the (≤ d·w row) sketch, or
    both ways; either is trivially small. ``(w, d)`` MUST equal the
    build's — _cms_positions is the one shared hash definition, and the
    docstring there spells out the mismatch hazard."""
    ppos = probes.select(
        F.col(col), _cms_positions(F.col(col), w, d).alias("sp")
    ).select(col, F.col("sp.seed").alias("seed"), F.col("sp.pos").alias("pos"))
    joined = ppos.join(cms, ["seed", "pos"], "left").withColumn(
        "cnt", F.coalesce("cnt", F.lit(0))
    )
    return joined.groupBy(col).agg(F.min("cnt").cast("long").alias("est"))
