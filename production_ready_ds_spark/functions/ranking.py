"""The ONE top-k ranking contract for integer-scored search results:
``orderBy(*order).limit(k)`` — planned as TakeOrderedAndProject
(partition-local top-k + a k-row merge, never a corpus-wide sort or a
global window over unbounded input) — then ``row_number`` over the
SAME order on the k survivors only.

Six query paths (BM25 / phrase / prefix, scan AND TermStore-served)
previously hand-copied this block; the scan≡index integer-equality
contract requires every copy to agree on the tie-break and the rank
cast, so the block lives here exactly once."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranked_topk(df: DataFrame, order, *, k: int, rank_name: str = "rank") -> DataFrame:
    """Top-``k`` rows of ``df`` under ``order`` (a list of ready-made
    asc()/desc() Columns), prefixed with a 1-based long ``rank``
    column computed over the same order. Column order of the result is
    (rank, *df.columns)."""
    from pyspark.sql import Window

    top = df.orderBy(*order).limit(k)
    return top.select(
        F.row_number().over(Window.orderBy(*order)).cast("long").alias(rank_name),
        "*",
    )
