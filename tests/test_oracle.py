"""The correctness gate, run locally: every declared catalog query is
compared against its DuckDB oracle at sf0.001 (fast) — the driver runs
the same comparison at sf0.01. Rows-only queries must return rows.
"""

from __future__ import annotations

import pytest

from production_ready_ds_spark.oracle import run_compare
from production_ready_ds_spark.queries import catalog

ALL = sorted(catalog())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_small, name):
    res = run_compare(spark, name, sf_small)
    assert res.ok, f"{name}: {res.detail} (spark_rows={res.spark_rows}, oracle_rows={res.oracle_rows})"
