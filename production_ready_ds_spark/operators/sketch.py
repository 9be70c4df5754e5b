"""Misra-Gries heavy-hitters summary: bounded-memory frequent items.

The missing member of the engine's mergeable-sketch family (HLL for
distinct counts, GK for percentiles — SCALE.md "Sketches"): find every
item whose frequency exceeds N/k WITHOUT a full-cardinality groupBy.
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

from pyspark.sql import DataFrame

DEFAULT_K = 100


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
