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


def test_hll_sketch_estimate_close_to_exact(spark, sf_small):
    """q_sketch_hll is rows-only for the driver; here the HLL estimate
    is held to its error bound against the exact distinct count."""
    rows = catalog()["q_sketch_hll"].fn(spark, sf_small).collect()
    assert rows
    for row in rows:
        if row.exact_users is not None:
            tol = max(3.0, 0.05 * row.exact_users)
            assert abs(row.approx_users - row.exact_users) <= tol, row
