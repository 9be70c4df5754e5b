"""Embedding-vector column expressions (array<float> columns).

All pure built-in higher-order functions (zip_with/aggregate) — JVM-side,
no UDF, no Python worker. Math accumulates in double so results line up
with DuckDB's list_cosine_similarity at 4-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Direct cosine — O(3d) per evaluation. In pair-join queries,
    precompute ``norm()`` on each side BELOW the join and use
    ``cosine_prenormed`` so the per-pair cost is one dot product."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine given precomputed L2 norms (computed once per row below
    the join instead of once per pair above it — 3× less higher-order-
    function work on the join output)."""
    return dot(a, b) / (norm_a * norm_b)


# Corpus-scaled quantizer granularity (round-4 verdict item: the fixed
# 16-bucket quantization was the one named scale-killer in the ANN
# family — within-bucket pair work grows quadratically with corpus size
# unless bucket COUNT grows with it). planes p is the smallest value in
# [min_planes, max_planes] whose 2^p buckets bring the MEAN bucket to
# ≤ target_bucket_rows rows, so expected per-bucket pair work stays
# O(target²) no matter the corpus size: 500 rows → 4 planes (the
# original 16 buckets), 2 000 → 5, 8 000 → 7, 32 000 → 9. Integer
# shift-and-compare only — no libm — so the DuckDB oracle twin
# (duck_planes_expr in queries/llm.py, a sum of n > target·2^k
# indicators) is bit-identical at every corpus size, which is what lets
# the hash gate stay green while the knob moves.
SIGN_TARGET_BUCKET_ROWS = 64
SIGN_MIN_PLANES = 4
SIGN_MAX_PLANES = 10


def scaled_sign_planes(
    n_rows: int,
    *,
    target_bucket_rows: int = SIGN_TARGET_BUCKET_ROWS,
    min_planes: int = SIGN_MIN_PLANES,
    max_planes: int = SIGN_MAX_PLANES,
) -> int:
    """Smallest plane count whose bucket grid holds the corpus at
    ≤ target_bucket_rows mean rows per bucket (clamped to
    [min_planes, max_planes]). max_planes bounds bucket-id width and
    must stay ≤ the embedding dimension (64 in the test corpus)."""
    p = min_planes
    while p < max_planes and n_rows > (target_bucket_rows << p):
        p += 1
    return p


#: Clamp bounds for the trained list count — module constants so SQL
#: oracles that must re-derive the formula (q_ann_recall_ivf's
#: full-probe row) interpolate THESE instead of copying literals.
IVF_MIN_K = 16
IVF_MAX_K = 4096


def scaled_ivf_k(
    n_rows: int,
    *,
    target_list_rows: int = SIGN_TARGET_BUCKET_ROWS,
    min_k: int = IVF_MIN_K,
    max_k: int = IVF_MAX_K,
) -> int:
    """Trained-quantizer twin of :func:`scaled_sign_planes`: the KMeans
    list count that brings the mean inverted list to ≤ target_list_rows
    rows. Not power-of-two constrained (centroid count is free), same
    clamping discipline; SemDeDup's own published k is corpus-sized."""
    k = -(-n_rows // target_list_rows)  # ceil div, integer-only
    return max(min_k, min(max_k, k))


def sign_bucket(a: Column, n_dims: int = 4) -> Column:
    """Coarse quantization bucket id from the sign bits of the first
    ``n_dims`` components — a deterministic IVF-style partitioner for
    ANN search (bucket count = 2^n_dims). Unlike random hyperplanes this
    needs no seed exchange, so the DuckDB oracle can replicate it."""
    bits = [
        F.when(F.element_at(a, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_dims)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def probe_buckets(a: Column, eps: float, n_dims: int = 4) -> Column:
    """Multi-probe expansion of :func:`sign_bucket`: the home bucket
    plus every Hamming-distance-1 neighbor whose deciding component sits
    within ``eps`` of the hyperplane. A vector pair with cos ≥ threshold
    can still land in different sign buckets when one component straddles
    zero — probing the flip side of every NEAR-ZERO component recovers
    those boundary pairs at a bounded cost of ≤ n_dims+1 bucket copies
    per vector (in practice ~2 with eps at the component-|x| quartile).
    Deterministic (no seeds), so a SQL oracle can replicate it."""
    home = sign_bucket(a, n_dims)
    flips = [
        F.when(
            F.abs(F.element_at(a, i + 1)) < F.lit(eps),
            home.bitwiseXOR(F.lit(1 << i)),
        )
        for i in range(n_dims)
    ]
    return F.array_distinct(
        F.filter(F.array(home, *flips), lambda x: x.isNotNull())
    )
