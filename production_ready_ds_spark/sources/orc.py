"""ORC source/sink — the OTHER columnar interchange format big lakes
speak (Hive/Trino-heritage warehouses ship ORC the way Spark-heritage
ones ship parquet; a switch-over user's upstream tables are as likely
to arrive in either).

Spark's ORC support is built in (native vectorized reader since 2.3),
so this module is deliberately thin: the VALUE is the contract it
pins, not code volume —

- **predicate pushdown + column pruning survive the format swap**:
  ORC files carry min/max stride statistics exactly like parquet row
  groups, and Spark's native reader pushes filters into them
  (``spark.sql.orc.filterPushdown`` — the Spark default, and PINNED
  explicitly in session.configure so a deployment flipping defaults
  cannot silently lose it; plan-asserted in tests/test_sources.py,
  the same evidence form the parquet paths carry). A pipeline moved
  from parquet inputs to ORC inputs keeps its scan shape.
- **round-trip fidelity**: write → read returns identical rows and
  schema for the engine's table types — longs, strings, doubles,
  float arrays, and the events table's timestamp column are all
  exercised in tests/test_sources.py.
- at 100 TB the layout disciplines are format-agnostic: the
  ``layout.write_range_clustered`` clustering write works unchanged
  on ORC (repartitionByRange + sortWithinPartitions feed any columnar
  sink), so stride stats end up tight the same way row-group stats do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Write ``df`` as ORC (snappy, Spark's default)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC directory/file with the native vectorized reader."""
    return spark.read.orc(path)
