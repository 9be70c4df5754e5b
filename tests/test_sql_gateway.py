"""The SQL string entry point must see every registry table and produce
plans/results identical to the DataFrame DSL (both compile to Catalyst)."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.sql import run_sql
from production_ready_ds_spark.tables import TABLE_NAMES, load


def test_run_sql_sees_all_tables(spark, sf_small):
    for name in TABLE_NAMES:
        n = run_sql(spark, f"SELECT COUNT(*) AS n FROM {name}", sf_small).collect()[0]["n"]
        assert n > 0, name


def test_run_sql_matches_dataframe_result(spark, sf_small):
    got = run_sql(
        spark,
        """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """,
        sf_small,
    )
    o = load(spark, sf_small, "orders")
    c = load(spark, sf_small, "customer")
    want = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_run_sql_events_view_has_shimmed_timestamp(spark, sf_small):
    # The nanos shim must be applied inside the view: SQL users get a
    # real TIMESTAMP_NTZ ts, never the raw INT64 nanos column.
    row = run_sql(
        spark, "SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events", sf_small
    ).collect()[0]
    assert row["lo"].year >= 2020 and row["hi"].year >= row["lo"].year
    dtype = dict(run_sql(spark, "SELECT ts FROM events LIMIT 1", sf_small).dtypes)
    assert dtype["ts"] == "timestamp_ntz"
