"""asof_join operator: semantics vs a brute-force reference, tolerance
window, and the one-shuffle/no-join plan guarantee."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from production_ready_ds_spark.operators.asof import asof_join
from production_ready_ds_spark.plans import explain_str, shuffle_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    quotes = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:00:00"), 100.0),
            ("a", _ts("2024-01-01 10:05:00"), 101.0),
            ("a", _ts("2024-01-01 10:05:00"), 102.0),  # tie: larger px wins
            ("b", _ts("2024-01-01 09:00:00"), 50.0),
        ],
        "sym string, qt timestamp_ntz, px double",
    )
    trades = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 09:59:59"), 1),   # before any quote -> NULL
            ("a", _ts("2024-01-01 10:00:00"), 2),   # exactly at quote -> 100
            ("a", _ts("2024-01-01 10:04:00"), 3),   # -> 100
            ("a", _ts("2024-01-01 10:05:00"), 4),   # tie ts, max px -> 102
            ("a", _ts("2024-01-01 11:00:00"), 5),   # -> 102
            ("b", _ts("2024-01-01 12:00:00"), 6),   # stale quote -> 50
            ("c", _ts("2024-01-01 12:00:00"), 7),   # no quotes -> NULL
        ],
        "sym string, tt timestamp_ntz, trade_id int",
    )
    return trades, quotes


def test_asof_join_semantics(frames):
    trades, quotes = frames
    out = {
        r.trade_id: r.px
        for r in asof_join(trades, quotes, on="sym", left_time="tt", right_time="qt").collect()
    }
    assert out == {1: None, 2: 100.0, 3: 100.0, 4: 102.0, 5: 102.0, 6: 50.0, 7: None}


def test_asof_join_tolerance(frames):
    trades, quotes = frames
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on="sym", left_time="tt", right_time="qt",
            tolerance=F.expr("INTERVAL 10 MINUTES"),
        ).collect()
    }
    # trade 5 (11:00) is >10min after its 10:05 quote; trade 6's quote is 3h stale
    assert out == {1: None, 2: 100.0, 3: 100.0, 4: 102.0, 5: None, 6: None, 7: None}


def test_asof_join_preserves_left_rows_and_columns(frames):
    trades, quotes = frames
    res = asof_join(trades, quotes, on="sym", left_time="tt", right_time="qt")
    assert res.count() == trades.count()
    assert res.columns == ["sym", "tt", "trade_id", "px"]


def test_asof_join_plan_is_single_shuffle_no_join(frames):
    trades, quotes = frames
    res = asof_join(trades, quotes, on="sym", left_time="tt", right_time="qt")
    s = explain_str(res)
    assert "Join" not in s, s
    assert shuffle_count(res) == 1, s


def test_asof_join_rejects_column_collision(frames):
    trades, quotes = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades.withColumnRenamed("trade_id", "px"),
            quotes, on="sym", left_time="tt", right_time="qt",
        )


def test_asof_no_value_cols_raises(spark):
    from production_ready_ds_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, lt long")
    right = spark.createDataFrame([(1, 5)], "k long, rt long")
    import pytest

    with pytest.raises(ValueError, match="no value columns"):
        asof_join(left, right, on="k", left_time="lt", right_time="rt")


def test_asof_tolerance_null_value_does_not_refresh_clock(spark):
    """A newer right row with a NULL value must not extend the
    tolerance window for a value that came from an older row: the
    (time, value) pair travels together per column."""
    from pyspark.sql import functions as F

    from production_ready_ds_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 6)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, 1, 10.0), (1, 5, None)], "k long, rt long, v double"
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        value_cols=["v"], tolerance=F.lit(2),
    ).collect()
    # last non-null v is from rt=1, which is older than lt-2=4 → NULL
    assert out[0].v is None

    # sanity: without tolerance the older value IS attached
    out2 = asof_join(
        left, right, on="k", left_time="lt", right_time="rt", value_cols=["v"]
    ).collect()
    assert out2[0].v == 10.0
