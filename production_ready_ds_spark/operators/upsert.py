"""MERGE-style upsert into parquet directories.

The reference's daily pipelines only ever append new day-partitions
(reference O2/O4 semantics); an engine also needs keyed upsert —
"replace rows with these keys, insert the rest" — for late corrections.
Two implementations, chosen by whether the target is partitioned:

- **Partitioned** (the 100 TB path): only the partitions PRESENT IN the
  updates are rewritten, via Spark's dynamic partition-overwrite mode.
  Cost is proportional to the touched partitions, not the table: the
  day-partitioned layouts these pipelines write make a late-data
  correction touch one day's directory.
- **Unpartitioned** (small dims): merge to a fresh directory, then swap
  directories. The swap is not atomic for concurrent readers — at scale
  a transactional table format (Delta/Iceberg) supplies real MERGE
  semantics; the join shape below (updates ⟕ anti-join, union) is
  exactly what those engines execute.

Update rows win over target rows on key collision (last-writer-wins);
within ``updates`` keys must be unique (asserted).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class UpsertError(RuntimeError):
    pass


def _check_unique_keys(updates: DataFrame, key_cols: list[str]) -> None:
    dup = updates.groupBy(*key_cols).count().filter("count > 1").limit(1).collect()
    if dup:
        raise UpsertError(f"duplicate key in updates: {dup[0].asDict()}")


def upsert_parquet(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """Upsert ``updates`` into the parquet directory ``target_path``.

    Rows whose ``key_cols`` match an existing row replace it; the rest
    append. Creates the target if missing.
    """
    _check_unique_keys(updates, key_cols)
    if not os.path.exists(target_path):
        writer = updates.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    if set(target.columns) != set(updates.columns):
        raise UpsertError(
            f"schema mismatch: target {sorted(target.columns)} vs updates {sorted(updates.columns)}"
        )

    if partition_col:
        # Only the partitions the updates touch are read and rewritten.
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        affected = target.filter(target[partition_col].isin(parts))
        survivors = affected.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = survivors.unionByName(updates)
        (
            merged.write.mode("overwrite")
            # dynamic: overwrite ONLY partitions present in `merged`
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
        return

    survivors = target.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = survivors.unionByName(updates)
    tmp = f"{target_path}.upsert-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    try:
        os.rename(tmp, target_path)
    except BaseException:
        os.rename(old, target_path)  # roll back
        raise
    shutil.rmtree(old)
