"""Vectorized ANN pair generation: per-bucket cosine via Arrow-batched
matrix multiplication.

The sign-bucket / IVF family (queries/llm.py) generates candidate pairs
with an equi-join on the bucket key and evaluates cosine per pair with
JVM higher-order functions (zip_with + aggregate). That stays the right
default at moderate candidate counts — no Python workers, whole plan in
Catalyst. But when candidates × dim dominates (the multi-probe query
evaluates ~500k × 64-dim pairs at sf0.1), per-pair HOF evaluation pays
an array allocation and an interpreted fold per pair; measured 4.9 s at
sf0.1 vs 1.05 s for this operator (4.7×).

This is the production shape for bucketed similarity at 100 TB: group
both sides by bucket, hand each bucket's two panels to one Arrow batch,
and compute the whole bucket's similarity matrix with ONE BLAS matmul —
work per task is (probes × index × dim) flops at memory bandwidth, and
parallelism scales with bucket count (make buckets ≫ cores by raising
sign-plane count). The unavoidable cost is Arrow transfer of the two
panels, linear in rows — far below the quadratic pair frame the JVM
path materializes.

Precision: the matmul accumulates in float64 but BLAS sums in a
different order than the sequential JVM/DuckDB fold, so pair
similarities can differ in the last ulp (~1e-15 relative). Outputs are
rounded to 4 decimals — a 5e-5 grid, ten orders of magnitude above the
drift — and verified value-equal to both the HOF plan and the DuckDB
oracle at sf0.01 and sf0.1 (tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def bucketed_cosine_pairs(
    probes: DataFrame,
    index: DataFrame,
    *,
    threshold: float,
    bucket_col: str = "pb",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a, b) pairs with cosine ≥ threshold where a ∈ probes,
    b ∈ index, and both share a bucket — pairs normalized to
    (vec_a < vec_b) with the similarity rounded to 4 decimals. Callers
    wanting unique pairs across buckets apply ``.distinct()`` (the
    cross-band dedup), exactly like the HOF path.

    Both inputs need columns (id_col, bucket_col, vec_col); the probe
    side may hold multiple bucket rows per vector (multi-probe
    expansion)."""

    def pair_block(key, pdf_p, pdf_x):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64")}
        )
        if len(pdf_p) == 0 or len(pdf_x) == 0:
            return empty
        P = np.stack(pdf_p[vec_col].to_numpy()).astype("float64")
        X = np.stack(pdf_x[vec_col].to_numpy()).astype("float64")
        pid = pdf_p[id_col].to_numpy()
        xid = pdf_x[id_col].to_numpy()
        sims = (P @ X.T) / np.outer(
            np.linalg.norm(P, axis=1), np.linalg.norm(X, axis=1)
        )
        ii, jj = np.nonzero((sims >= threshold) & (pid[:, None] != xid[None, :]))
        if len(ii) == 0:
            return empty
        a, b = pid[ii], xid[jj]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a, b),
                "vec_b": np.maximum(a, b),
                "cos_sim": np.round(sims[ii, jj], 4),
            }
        )

    p = probes.select(
        probes[id_col].alias(id_col), probes[bucket_col].alias("pb"), probes[vec_col].alias(vec_col)
    )
    x = index.select(
        index[id_col].alias(id_col), index[bucket_col].alias("pb"), index[vec_col].alias(vec_col)
    )
    return p.groupBy("pb").cogroup(x.groupBy("pb")).applyInPandas(
        pair_block, schema="vec_a long, vec_b long, cos_sim double"
    )
