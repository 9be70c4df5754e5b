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
