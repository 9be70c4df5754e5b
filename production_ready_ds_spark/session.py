"""SparkSession factory with scale-appropriate defaults.

The reference spawns one spark-submit per Luigi task with fixed resources
(reference 00_training_pipeline.py:97-101). Here a single tuned session is
shared; per-job knobs become runtime confs.

Defaults chosen for the 100 TB design brief:
- AQE on (runtime shuffle coalescing, skew-join splitting).
- Arrow on (fast toPandas / pandas_udf batches).
- ``spark.sql.legacy.parquet.nanosAsLong`` — the testdata ``events``
  table stores INT64 TIMESTAMP(NANOS) which Spark 4 otherwise rejects
  (PARQUET_TYPE_ILLEGAL); see tables.load_events.
- UTC session timezone so timestamp semantics line up with the DuckDB
  oracle and with any cluster regardless of host TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def configure(builder: SparkSession.Builder, shuffle_partitions: int | None = None) -> SparkSession.Builder:
    """Apply engine defaults to any SparkSession builder."""
    return (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )


def get_spark(app_name: str = "production-ready-ds-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the shared tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and no
    active session exists; on a real cluster leave it to spark-submit.
    """
    builder = configure(SparkSession.builder.appName(app_name))
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    return builder.getOrCreate()


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set the confs this engine relies on even when handed a foreign
    session (e.g. the verification driver's). All of these are
    runtime-settable in Spark 4."""
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - immutable conf on some builds
            pass
    return spark
