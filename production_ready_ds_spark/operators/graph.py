"""Bounded-round iterative graph analytics: PageRank on DataFrames.

Connected components (operators/dedup.py) covers reachability; this
adds the other canonical fixed-point iteration — importance scoring —
as the representative of the "K synchronized join+aggregate rounds"
algorithm class (PageRank, label propagation variants, iterative
SimRank all share the shape).

Execution shape per round: one join of the edge list with the current
rank vector on the source key + one aggregation by destination — both
shuffle on node keys, so co-partitioning carries across rounds and AQE
handles hub skew. Lineage grows per round, so the rank frame is
``localCheckpoint``ed every few iterations (same discipline as the
dedup label propagation); without it round 2k replans rounds 1..2k-1.

Determinism: with a FIXED iteration count the result is a pure
function of the graph (floating-point addition order aside — callers
round outputs), which is what makes it oracle-checkable: the DuckDB
twin unrolls the same K rounds as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 8
_CHECKPOINT_EVERY = 3


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    src: str = "s",
    dst: str = "d",
) -> DataFrame:
    """K rounds of PageRank over a directed edge list; returns
    (node, r). For an undirected graph pass both edge directions.

    Every node must appear as a source (true for symmetrized
    undirected edges — no dangling-mass redistribution needed; a
    directed caller with sinks must add self-loops or accept leaked
    mass). |nodes| is computed once driver-side (a scalar count, not a
    row collect)."""
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("degree"))
    nodes = edges.select(F.col(src).alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    if n == 0:  # empty graph: no nodes, no ranks — not a 1/0 traceback
        return nodes.withColumn("r", F.lit(0.0))
    out_edges = edges.join(deg, src).localCheckpoint()  # (src, dst, degree), fixed
    r = nodes.withColumn("r", F.lit(1.0 / n))
    for i in range(iterations):
        incoming = (
            out_edges.join(r, out_edges[src] == r.node)
            .select(F.col(dst).alias("node"), (F.col("r") / F.col("degree")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inc"))
        )
        r = nodes.join(incoming, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("inc"), F.lit(0.0))
            ).alias("r"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and (i + 1) < iterations:
            r = r.localCheckpoint()
    return r


def triangle_count(e: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Exact triangle count of an undirected edge list (canonical
    ``a < b`` per edge, no duplicates) as a ONE-ROW frame, via the
    degree-ordered orientation (Suri & Vassilvitskii, WWW'11): each
    edge points from its lower-(degree, id) endpoint to the higher, so
    every triangle is counted exactly once as the out-neighbor wedge
    at its lowest-degree vertex and out-degrees are bounded by √(2m) —
    wedge volume O(m^1.5) however skewed the degree distribution,
    where the naive id-ordered wedge join pays Σ deg(v)² and one
    million-degree hub detonates it. Same exact count, no
    result-changing degree cap.

    ``e`` is consumed four times (two degree unions, the orientation
    join, the closure probe) — pass a materialized frame."""
    deg = (
        e.select(F.col(a).alias("v"))
        .unionAll(e.select(F.col(b).alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias(a), F.col("d").alias("_da"))
    db = deg.select(F.col("v").alias(b), F.col("d").alias("_db"))
    ed = e.join(da, a).join(db, b)
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col(a) < F.col(b))
    )
    o = ed.select(
        F.when(a_first, F.col(a)).otherwise(F.col(b)).alias("u"),
        F.when(a_first, F.col(b)).otherwise(F.col(a)).alias("w"),
    ).localCheckpoint(eager=True)
    o1 = o.select("u", F.col("w").alias("x"))
    o2 = o.select("u", F.col("w").alias("y"))
    # x < y keeps each unordered out-neighbor pair of u exactly once,
    # and the closure edge {x, y} then lives at (x, y) in the
    # id-canonical undirected list — whatever x and y's degree order.
    wedges = (
        o1.join(o2, "u")
        .filter(F.col("x") < F.col("y"))
        .select(F.col("x").alias(a), F.col("y").alias(b))
    )
    return wedges.join(e, [a, b], "inner").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
