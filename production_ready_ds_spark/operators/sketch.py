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
is a superset of the true heavy hitters. The per-batch merge below is
the mergeable-summaries form (add exact batch counts, then repeatedly
subtract the minimum counter and drop zeros until ≤ k survive), which
preserves the same ±N_p/k undercount bound as item-at-a-time MG.

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
    """≤ k candidate values per partition whose union contains every
    value with global frequency > N/k. One map-side pass, no shuffle;
    output is (value) rows, at most k per input partition."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            for value, cnt in pdf[col].value_counts().items():
                counters[value] = counters.get(value, 0) + int(cnt)
            while len(counters) > k:
                m = min(counters.values())
                counters = {v: c - m for v, c in counters.items() if c > m}
        yield pd.DataFrame({col: list(counters.keys())})

    return items.mapInPandas(summarize, f"{col} string")
