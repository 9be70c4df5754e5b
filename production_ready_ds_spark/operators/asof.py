"""Reusable as-of join operator (the library form of q_join_asof).

``asof_join(left, right, ...)``: for every left row, attach the columns
of the LATEST right row with the same key and ``right_time <=
left_time`` (backward as-of, the financial tick⋈quote semantics; an
optional ``tolerance`` bounds how far back a match may reach).

Implementation is the union-and-window shape — tag both inputs, union,
one window per key carrying the last non-null right-side values forward
— which costs ONE shuffle on the key plus a per-partition sort. The
naive alternative (per-left-row "max right_time <= t" range join) is
quadratic per key and unusable at 100 TB.

Determinism: ties on ``right_time`` are broken by the largest
``tie_break`` column value (defaults to the first value column); right
rows sort before left rows at equal timestamps, so an exactly-
simultaneous right row IS visible to the left row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_IS_RIGHT = "__asof_is_right"
_PREFIX = "__asof_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join; returns ``left`` plus the matched right-side
    ``value_cols`` (NULL when no right row is at-or-before the left
    row's time, or outside ``tolerance``).

    ``tolerance``: an interval Column, e.g. ``F.expr("INTERVAL 7 DAYS")``
    — matches older than ``left_time - tolerance`` become NULL.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_time
    ]
    if not value_cols:
        raise ValueError(
            "asof_join: right frame has no value columns (only keys and "
            f"{right_time!r}) — pass value_cols explicitly or add columns "
            "to attach"
        )
    overlap = [c for c in value_cols if c in left.columns]
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")

    t = "__asof_t"
    tagged_right = right.select(
        *keys,
        F.col(right_time).alias(t),
        F.lit(1).alias(_IS_RIGHT),
        *[F.col(c).alias(_PREFIX + c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys and c != left_time],
    )
    tagged_left = left.select(
        *keys,
        F.col(left_time).alias(t),
        F.lit(0).alias(_IS_RIGHT),
        *[F.lit(None).cast(right.schema[c].dataType).alias(_PREFIX + c) for c in value_cols],
        *[F.col(c) for c in left.columns if c not in keys and c != left_time],
    )
    # Right rows sort first at equal t (desc on the tag) → "<=" visibility;
    # among equal-t right rows the last by tie column wins under last().
    tie = _PREFIX + value_cols[0]
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(t), F.desc(_IS_RIGHT), F.asc(tie))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_right.unionByName(tagged_left)
    if tolerance is not None:
        # Each value travels WITH the time of the row it came from as a
        # (t, v) struct, so the tolerance clock is per column: a newer
        # right row whose value column is NULL must not refresh the
        # window for a value that actually came from an older row.
        # (Window exprs computed BEFORE the left-rows filter — a window
        # in the post-filter select would only see left rows.)
        for c in value_cols:
            carried = carried.withColumn(
                _PREFIX + "m_" + c,
                F.last(
                    F.when(
                        (F.col(_IS_RIGHT) == 1) & F.col(_PREFIX + c).isNotNull(),
                        F.struct(F.col(t).alias("t"), F.col(_PREFIX + c).alias("v")),
                    ),
                    ignorenulls=True,
                ).over(w),
            )
        picks = [
            F.when(
                F.col(_PREFIX + "m_" + c)["t"] >= (F.col(t) - tolerance),
                F.col(_PREFIX + "m_" + c)["v"],
            ).alias(c)
            for c in value_cols
        ]
    else:
        for c in value_cols:
            carried = carried.withColumn(
                _PREFIX + "m_" + c, F.last(_PREFIX + c, ignorenulls=True).over(w)
            )
        picks = [F.col(_PREFIX + "m_" + c).alias(c) for c in value_cols]

    out_left = [c for c in left.columns if c not in keys and c != left_time]
    return carried.filter(F.col(_IS_RIGHT) == 0).select(
        *keys,
        F.col(t).alias(left_time),
        *[F.col(c) for c in out_left],
        *picks,
    )
