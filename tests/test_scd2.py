"""SCD Type-2 merge semantics: open/close/no-op rules, interval
chaining, idempotency, and as-of reads."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from production_ready_ds_spark.operators.scd2 import (
    scd2_as_of,
    scd2_current,
    scd2_merge,
)

T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2024, 2, 1)
T3 = dt.datetime(2024, 3, 1)

SCHEMA_U = "cust_id long, segment string, acctbal double"


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, SCHEMA_U + ", valid_from timestamp_ntz, valid_to timestamp_ntz"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_U)


def _merge(hist, upd, ts):
    return scd2_merge(hist, upd, ["cust_id"], ["segment", "acctbal"], F.lit(ts))


def test_first_load_opens_all_rows(spark):
    hist = _hist(spark, [])
    got = _merge(hist, _upd(spark, [(1, "BUILDING", 10.0), (2, "AUTO", 5.0)]), T1)
    rows = {r["cust_id"]: r for r in got.collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r["valid_from"] == T1 and r["valid_to"] is None


def test_change_closes_and_opens_chained_intervals(spark):
    hist = _merge(_hist(spark, []), _upd(spark, [(1, "BUILDING", 10.0)]), T1)
    hist2 = _merge(hist, _upd(spark, [(1, "MACHINERY", 10.0)]), T2)
    rows = sorted(hist2.collect(), key=lambda r: r["valid_from"])
    assert len(rows) == 2
    closed, current = rows
    assert closed["segment"] == "BUILDING"
    assert (closed["valid_from"], closed["valid_to"]) == (T1, T2)
    assert current["segment"] == "MACHINERY"
    assert (current["valid_from"], current["valid_to"]) == (T2, None)


def test_identical_update_is_noop_and_absent_keys_untouched(spark):
    hist = _merge(
        _hist(spark, []), _upd(spark, [(1, "BUILDING", 10.0), (2, "AUTO", 5.0)]), T1
    )
    hist2 = _merge(hist, _upd(spark, [(1, "BUILDING", 10.0)]), T2)
    rows = {r["cust_id"]: r for r in hist2.collect()}
    assert len(rows) == 2  # no new versions anywhere
    assert rows[1]["valid_from"] == T1 and rows[1]["valid_to"] is None
    assert rows[2]["valid_from"] == T1 and rows[2]["valid_to"] is None


def test_null_attribute_transitions_are_detected(spark):
    hist = _merge(_hist(spark, []), _upd(spark, [(1, None, 10.0)]), T1)
    # null → value must count as a change (eqNullSafe, not =)
    hist2 = _merge(hist, _upd(spark, [(1, "AUTO", 10.0)]), T2)
    assert hist2.count() == 2
    # value → null likewise
    hist3 = _merge(hist2, _upd(spark, [(1, None, 10.0)]), T3)
    assert hist3.count() == 3


def test_as_of_and_current_views(spark):
    hist = _merge(_hist(spark, []), _upd(spark, [(1, "BUILDING", 10.0)]), T1)
    hist = _merge(hist, _upd(spark, [(1, "MACHINERY", 11.0)]), T2)
    hist = _merge(hist, _upd(spark, [(1, "FURNITURE", 12.0)]), T3)

    assert scd2_current(hist).collect()[0]["segment"] == "FURNITURE"
    mid = dt.datetime(2024, 2, 15)
    as_of = scd2_as_of(hist, F.lit(mid)).collect()
    assert len(as_of) == 1 and as_of[0]["segment"] == "MACHINERY"
    # boundary instant belongs to the newer row (half-open intervals)
    at_t2 = scd2_as_of(hist, F.lit(T2)).collect()
    assert len(at_t2) == 1 and at_t2[0]["segment"] == "MACHINERY"


def test_merge_is_idempotent_on_redelivery(spark):
    batch = _upd(spark, [(1, "BUILDING", 10.0), (2, "AUTO", 5.0)])
    hist = _merge(_hist(spark, []), batch, T1)
    redelivered = _merge(hist, batch, T2)  # same payload, later ts
    a = sorted(map(tuple, hist.collect()))
    b = sorted(map(tuple, redelivered.collect()))
    assert a == b


def test_duplicate_batch_keys_rejected(spark):
    """A batch with the same key twice must fail fast (it would open
    two current rows and corrupt every later merge)."""
    import pytest

    batch = _upd(spark, [(1, "BUILDING", 10.0), (1, "AUTO", 5.0)])
    with pytest.raises(ValueError, match="duplicate keys"):
        _merge(_hist(spark, []), batch, T1)
