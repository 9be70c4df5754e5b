"""SCD Type-2 merge: dimension history with validity intervals.

The reference's model store keeps full versions side by side
(``model/<version>/model``, reference `00_training_pipeline.py:111-112`)
— version-level history. Warehouses need the row-level equivalent:
when a dimension attribute changes, CLOSE the current row (stamp
``valid_to``) and open a new one, so every fact can be joined to the
attribute values that were true at its event time (the as-of join in
operators/asof.py is the natural consumer).

Scale shape: one equi-join of the incoming batch against ONLY the
current rows (``valid_to IS NULL``) on the business key, one column-set
inequality to detect real changes, and a union of (untouched + closed +
opened) rows. No windows, no per-key state; the join shuffles on the
business key and AQE's skew split handles hot keys. History rows are
never rewritten — at 100 TB pair this with a partitioned target where
closed rows land in archival partitions and only the current-slice
partition churns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def _any_attr_changed(attrs: list[str]) -> Column:
    """Null-safe 'any tracked attribute differs' predicate."""
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(f"cur.{a}").eqNullSafe(F.col(f"new.{a}"))
    return changed


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    batch_ts: Column,
) -> DataFrame:
    """Merge an update batch into an SCD2 history frame and return the
    new history.

    ``history`` carries ``key_cols + attr_cols + [valid_from, valid_to]``
    with ``valid_to IS NULL`` marking current rows; an empty history is
    allowed (first load). ``updates`` carries ``key_cols + attr_cols``
    — the latest observed attribute values per key (keys must be unique
    within the batch; validated, duplicates raise ValueError).
    ``batch_ts`` stamps both the ``valid_to`` of rows
    being closed and the ``valid_from`` of rows being opened, so the
    intervals chain without gaps.

    Rules (standard Type 2):
    - unknown key            → open a new current row
    - known key, attrs equal → no-op (idempotent re-delivery is safe)
    - known key, attrs differ→ close the current row, open a new one
    - keys absent from the batch are untouched (no implicit deletes)
    """
    # Enforce the documented batch-key uniqueness instead of trusting
    # it: a duplicate key would open multiple current rows at once and
    # every later merge fans out further — corruption that surfaces far
    # from its cause. One small aggregate (|batch keys| rows) per merge.
    dup = (
        updates.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        sample = [tuple(r[k] for k in key_cols) for r in dup]
        raise ValueError(
            f"scd2_merge: duplicate keys within the update batch (sample: {sample}); "
            "deduplicate to one row per key (e.g. latest by event time) before merging"
        )
    cur = history.filter(F.col(VALID_TO).isNull()).alias("cur")
    closed_history = history.filter(F.col(VALID_TO).isNotNull())
    new = updates.alias("new")

    joined = new.join(cur, key_cols, "left")
    changed = _any_attr_changed(attr_cols)
    is_new_key = F.col(f"cur.{VALID_FROM}").isNull()

    # Rows to OPEN: brand-new keys, or keys whose attributes changed.
    opens = (
        joined.filter(is_new_key | changed)
        .select(
            *[F.col(f"new.{k}").alias(k) for k in key_cols],
            *[F.col(f"new.{a}").alias(a) for a in attr_cols],
            batch_ts.cast("timestamp_ntz").alias(VALID_FROM),
            F.lit(None).cast("timestamp_ntz").alias(VALID_TO),
        )
    )
    # Current rows to CLOSE: those with a differing update.
    closes = (
        joined.filter(~is_new_key & changed)
        .select(
            *[F.col(f"new.{k}").alias(k) for k in key_cols],
            *[F.col(f"cur.{a}").alias(a) for a in attr_cols],
            F.col(f"cur.{VALID_FROM}").alias(VALID_FROM),
            batch_ts.cast("timestamp_ntz").alias(VALID_TO),
        )
    )
    # Current rows that survive untouched: anti-join against the keys
    # being closed (equal-attr updates keep their original open row).
    closing_keys = joined.filter(~is_new_key & changed).select(
        *[F.col(f"new.{k}").alias(k) for k in key_cols]
    )
    untouched_current = cur.join(closing_keys, key_cols, "left_anti").select(
        *key_cols, *attr_cols, VALID_FROM, VALID_TO
    )
    return (
        closed_history.select(*key_cols, *attr_cols, VALID_FROM, VALID_TO)
        .unionByName(untouched_current)
        .unionByName(closes)
        .unionByName(opens)
    )


def scd2_current(history: DataFrame) -> DataFrame:
    """The current slice of an SCD2 history (one row per live key)."""
    return history.filter(F.col(VALID_TO).isNull())


def scd2_as_of(history: DataFrame, ts: Column) -> DataFrame:
    """The dimension as it was at ``ts``: rows whose validity interval
    covers the instant (half-open ``[valid_from, valid_to)``)."""
    return history.filter(
        (F.col(VALID_FROM) <= ts) & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > ts))
    )
