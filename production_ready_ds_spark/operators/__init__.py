"""Reusable operator library.

The relational/dedup/similarity operators live as catalog queries in
``production_ready_ds_spark.queries``; modules here hold the pieces
that are operators in their own right rather than query shapes:

- :mod:`.asof` — backward as-of join with tolerance (union+window shape)
- :mod:`.upsert` — MERGE-style keyed upsert into parquet targets
- :mod:`.bucketing` — bucketed-table helpers for exchange-free joins
- :mod:`.multimodal` — opaque-binary payload plumbing (mapInPandas)
"""

from .asof import asof_join
from .dedup import (
    connected_components,
    incremental_hamming_dedup,
    incremental_minhash_dedup,
    jaccard_pairs,
    minhash_bands,
    minhash_candidates,
)
from .layout import compact_parquet, write_range_clustered
from .scd2 import scd2_as_of, scd2_current, scd2_merge
from .upsert import UpsertError, upsert_parquet

__all__ = [
    "asof_join",
    "compact_parquet",
    "write_range_clustered",
    "connected_components",
    "incremental_hamming_dedup",
    "incremental_minhash_dedup",
    "jaccard_pairs",
    "minhash_bands",
    "minhash_candidates",
    "scd2_merge",
    "scd2_current",
    "scd2_as_of",
    "upsert_parquet",
    "UpsertError",
]
