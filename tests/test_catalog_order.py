"""Catalog ordering contract.

The driver's correctness harness verifies a bounded prefix of the
catalog (50 entries in round 1), so the 48 SURVEY §2b declared queries
must always lead — an extension query registered ahead of a contract
query silently removes the contract row from driver evidence.
"""

from __future__ import annotations

from production_ready_ds_spark.queries import _CONTRACT_ORDER, catalog


def test_contract_queries_lead_catalog():
    names = list(catalog())
    assert names[: len(_CONTRACT_ORDER)] == list(_CONTRACT_ORDER)


def test_contract_covers_survey_2b():
    assert len(_CONTRACT_ORDER) == 48
    assert len(set(_CONTRACT_ORDER)) == 48


def test_no_duplicate_catalog_names():
    cat = catalog()
    assert len(cat) == len(set(cat))
