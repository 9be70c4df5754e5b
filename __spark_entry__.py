"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query catalog
(production_ready_ds_spark.queries): every SURVEY.md §2b operator is
registered there as a (PySpark builder, DuckDB oracle SQL) pair; this
module exposes them in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from production_ready_ds_spark.queries import catalog  # noqa: E402
from production_ready_ds_spark.session import ensure_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    ensure_runtime_confs(spark)
    return catalog()["q_agg_pricing"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per declared query (rows-only ops omitted)."""
    return {name: q.sql for name, q in catalog().items() if q.sql is not None}
