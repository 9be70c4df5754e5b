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


def test_every_catalog_name_documented_in_coverage():
    """Doc-drift guard (this class of staleness appeared in BOTH round-1
    and round-2 reviews): every registered query name must appear in
    COVERAGE.md, and the count COVERAGE.md/README.md claim must match
    len(catalog()). Adding a query without inventorying it fails here."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    coverage = (root / "COVERAGE.md").read_text()
    readme = (root / "README.md").read_text()
    cat = catalog()
    missing = sorted(n for n in cat if n not in coverage)
    assert not missing, f"catalog names absent from COVERAGE.md: {missing}"
    claimed = re.search(r"full catalog is (\d+) entries", coverage)
    assert claimed and int(claimed.group(1)) == len(cat), (
        f"COVERAGE.md claims {claimed and claimed.group(1)} entries, catalog has {len(cat)}"
    )
    claimed_readme = re.search(r"(\d+) operators \(", readme)
    assert claimed_readme and int(claimed_readme.group(1)) == len(cat), (
        f"README.md claims {claimed_readme and claimed_readme.group(1)} operators, catalog has {len(cat)}"
    )


def test_extension_priority_names_exist():
    """Rotation hygiene: every _EXTENSION_PRIORITY name must be a real
    registered query — a typo here silently burns a driver-evidence slot."""
    from production_ready_ds_spark.queries import _EXTENSION_PRIORITY

    cat = catalog()
    unknown = sorted(n for n in _EXTENSION_PRIORITY if n not in cat)
    assert not unknown, f"_EXTENSION_PRIORITY names not in catalog: {unknown}"
    assert len(set(_EXTENSION_PRIORITY)) == len(_EXTENSION_PRIORITY)
