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
