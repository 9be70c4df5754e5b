"""SQL entry point: run ANSI SQL strings against the registry tables.

The reference has no SQL surface at all — its "query language" is the
DataFrame DSL inside spark-submit jobs (reference
`00_training_pipeline.py:129-141`), and although it enables Hive support
it never registers a table (reference `00_training_pipeline.py:121-126`).
An analytics engine needs the string entry point too; both paths compile
to the same Catalyst plans, so SQL here is a second door into the exact
same optimizer (predicate pushdown, broadcast selection, AQE) the
DataFrame catalog queries get.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import ensure_runtime_confs
from .tables import DEFAULT_SF_DIR, register_views


def run_sql(spark: SparkSession, statement: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Execute one SQL statement with the ten registry tables visible as
    temp views (``region nation customer supplier part orders lineitem
    events documents embeddings``).

    Views are (re)registered on every call: registration is metadata-only
    (a logical plan per table, no scan), so the cost is negligible and
    the views always point at the requested ``sf_dir``.
    """
    ensure_runtime_confs(spark)
    register_views(spark, sf_dir)
    return spark.sql(statement)
