"""Table registry for the synthetic testdata lake.

Maps the TPC-H-ish star schema + LLM-pipeline tables (TESTDATA.md) to
DataFrames with explicit, verified schemas (schema-on-write discipline —
the reference reads everything as untyped CSV strings, reference
00_training_pipeline.py:129-132; we keep columnar parquet + real types).

Scale notes (100 TB design):
- All reads are plain ``spark.read.parquet`` → vectorized reader,
  predicate pushdown and column pruning are free from Catalyst.
- ``events.ts`` is INT64 TIMESTAMP(NANOS); Spark 4 refuses it unless
  ``spark.sql.legacy.parquet.nanosAsLong=true``, after which the column
  arrives as a long of nanoseconds. We convert with integer division
  (``ts div 1000`` → timestamp_micros) — float division would lose
  precision at 1e18 magnitudes. This matches DuckDB's microsecond
  truncation of the same column exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY realistic scale factor
# (region=5 rows, nation=25 rows always; supplier/part grow slowly).
BROADCASTABLE = {"region", "nation", "supplier"}


def _ensure_nanos_conf(spark: SparkSession) -> None:
    # UTC session tz makes the long→timestamp→ntz conversion below a pure
    # wall-clock identity, matching DuckDB's naive microsecond read.
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover
            pass


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one registry table as a typed DataFrame.

    ``events`` gets the nanos→micros timestamp shim; everything else is a
    straight vectorized parquet scan.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        _ensure_nanos_conf(spark)
        df = spark.read.parquet(path)
        # The shim only applies when ts physically arrives as INT64
        # nanos (the driver's testdata); an events table written with a
        # real timestamp column (test fixtures, foreign lakes) passes
        # through untouched apart from the NTZ normalization.
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            # integer division keeps full microsecond precision (see
            # module doc); TIMESTAMP_NTZ so downstream outputs compare
            # tz-free like the other timestamp columns.
            return df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(path)


def spread(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition a too-narrow scan — ONLY when the source
    has fewer partitions than the target.

    Why: parquet can only split on row-group boundaries, so a small
    single-row-group file scans as ONE partition and serializes every
    downstream map stage onto one core (the sf0.1 documents.parquet is
    one 580 KB row group). At warehouse scale a table has thousands of
    row groups and this is a no-op (partitions >= target → returned
    untouched), so the exchange exists exactly when the data is small
    enough for it to be cheap.

    Measured guidance (sf0.1, local[32], interleaved A/B): worth it
    ONLY for pipelines doing heavy per-row CPU before their first
    shuffle — q_winnow_pairs (an md5 per token position) went 1.74 →
    1.38 s. For cheap map sides (tokenize/concat shingling, tf
    explode) the extra exchange + task overhead LOSES: jaccard 2.12 →
    2.29 s, tfidf 1.09 → 1.27 s — those paths stay unspread. The
    default target is defaultParallelism/4, which beat both
    parallelism/2 and full parallelism (32 tasks × many downstream
    stages swamp the gain at this scale).

    Round-robin does not alter aggregate/join results downstream —
    apply only where output order is re-established by keys. Place it
    BEFORE a localCheckpoint so the final plan shape is unchanged."""
    sc = df.sparkSession.sparkContext
    if parts is None:
        parts = max(2, sc.defaultParallelism // 4)
    if df.rdd.getNumPartitions() < parts:
        return df.repartition(parts)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (SQL entry point parity —
    the reference enables Hive support but never registers a table;
    reference 00_training_pipeline.py:121-126)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
