"""Schema-evolution-tolerant parquet reads.

A long-lived lake accumulates writer generations: early partitions lack
columns later ones carry, and a column's type may have widened
(int → long). The reference never faces this (each day overwrites one
CSV, reference `01_classification_pipeline.py:203-207`), but an
incremental 100 TB store ingesting for months hits it on day one of the
first schema change.

Two readers, two failure modes made loud instead of silent:

- ``read_evolved``: Spark's ``mergeSchema`` footer-union read, for
  exploration / first contact with an evolved store. Handles ADDED
  columns (absent files yield NULL). It does NOT widen primitive types
  — an int32 generation next to an int64 one raises Spark's
  CANNOT_MERGE_SCHEMAS — and its footer sweep is O(file count) driver
  work, so production readers graduate to ``read_with_contract``.
- ``read_with_contract``: fixed-schema read for pipelines. No footer
  sweep; absent columns materialize as NULL of the contract type, extra
  columns are pruned at the scan (never read), and compatible
  WIDENINGS (int32 file → bigint contract) upcast per file — this is
  the path that reads a type-widened store. With ``strict`` (default),
  file footers are first checked against the contract and an
  INCOMPATIBLE retype (string where the contract says long) raises a
  ``SchemaContractError`` at SUBMIT time. Without the check the same
  mismatch surfaces as a per-file executor failure
  (PARQUET_COLUMN_DATA_TYPE_MISMATCH) only when a task actually reaches
  the offending generation — on a 100 TB backfill that is hours in,
  after most of the job's work is already spent.

The strict check samples up to ``MAX_CHECK_FILES`` parquet footers via
pyarrow (metadata only, no data pages) — a bounded driver cost — taken
at an even stride across the listing (first and last file always
included) because writer generations cluster temporally: a head-only
sample would never see a retype introduced by the newest writer. A
generation narrower than the stride can still slip through; that
residual risk is the price of the bound, and a production lake's table
format schema log (Delta/Iceberg) replaces footer sampling outright.
LOCAL/POSIX-filesystem mechanism like operators/layout.py's swap.

Predicate pushdown and column pruning survive both paths (asserted in
tests/test_schema_evolution.py): pruning matters double here, since a
query touching only stable columns should never pay for the evolved
ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: strict-mode footer sample bound: generations ≫ this are pathological
#: (the check is per distinct WRITER GENERATION, not per row group).
MAX_CHECK_FILES = 100


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files disagree on (additive)
    schema. See module docstring for the widening caveat."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_with_contract(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    strict: bool = True,
) -> DataFrame:
    """Read ``path`` against a FIXED contract schema (see module
    docstring)."""
    if strict:
        _check_contract(path, schema)
    return spark.read.schema(schema).parquet(path)


class SchemaContractError(TypeError):
    """A store column's type cannot be read through the contract."""


# store parquet/arrow type → contract Spark simpleStrings it reads as.
# EMPIRICALLY verified against this Spark's vectorized parquet reader
# (tests/test_schema_evolution.py pins the rejections too): int64→double
# and date32→timestamp(LTZ) FAIL at read time, so listing them here
# would recreate the mid-job crash this check exists to prevent.
_WIDENINGS: dict[str, set[str]] = {
    "int32": {"int", "bigint", "double"},
    "int64": {"bigint"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string"},
    "large_string": {"string"},
    "bool": {"boolean"},
    "date32[day]": {"date", "timestamp_ntz"},
    "binary": {"binary"},
}


def _check_contract(path: str, schema: T.StructType) -> None:
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    contract = {f.name: f.dataType.simpleString() for f in schema.fields}
    all_files = ds.dataset(path, format="parquet").files
    # Bounded footer budget, EVEN-STRIDE sampled (always including the
    # first and last file): generations cluster temporally in the file
    # listing, so a head-only sample would miss a retype introduced by
    # the newest writer. Residual risk — a generation narrower than the
    # stride — is the documented cost of the bound; a table format's
    # schema log removes it entirely.
    if len(all_files) <= MAX_CHECK_FILES:
        files = all_files
    else:
        step = (len(all_files) - 1) / (MAX_CHECK_FILES - 1)
        files = [all_files[round(i * step)] for i in range(MAX_CHECK_FILES)]
    seen: set[tuple] = set()
    for f in files:
        file_schema = pq.read_schema(f)
        key = tuple(zip(file_schema.names, map(str, file_schema.types)))
        if key in seen:  # one check per distinct writer generation
            continue
        seen.add(key)
        for name, typ in key:
            want = contract.get(name)
            if want is None:
                continue  # extra column: pruned at the scan, fine
            allowed = _WIDENINGS.get(typ)
            if typ.startswith("timestamp"):
                allowed = {"timestamp", "timestamp_ntz"}
            if allowed is None or want not in allowed:
                raise SchemaContractError(
                    f"column {name!r} in {f}: store has {typ}, contract wants "
                    f"{want} — failing at submit time instead of mid-job in "
                    "the first task that reaches this generation"
                )
