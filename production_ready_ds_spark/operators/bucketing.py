"""Bucketed-table utilities: pre-partitioned co-located joins.

THE 100 TB join strategy for repeated big-big joins: write both fact
tables bucketed (+ sorted) by the join key; Spark then sort-merge-joins
bucket-to-bucket with NO Exchange on either side — the shuffle is paid
once at write time and amortized over every subsequent join
(tests/test_bucketing.py asserts the shuffle-free plan).

The reference gestures at this with its unused Hive dynamic-partition
configs (00_training_pipeline.py:123-125); this realizes the intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. Equal
    ``num_buckets`` on both sides of a future join is what enables the
    exchange-free plan."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; MERGE hint keeps AQE from
    broadcasting a small side so the co-located plan is used (at real
    scale neither side fits a broadcast anyway)."""
    left = spark.table(left_table).hint("MERGE")
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
