"""Bucketed co-located join: the shuffle paid at write time buys
exchange-free sort-merge joins afterwards — asserted on the plan."""

from __future__ import annotations

import pytest

from production_ready_ds_spark.operators.bucketing import bucketed_join, write_bucketed
from production_ready_ds_spark.plans import explain_str, shuffle_count
from production_ready_ds_spark.tables import load


@pytest.fixture(scope="module")
def bucketed(spark, sf_small):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    spark.catalog.setCurrentDatabase("bktest")
    write_bucketed(
        load(spark, sf_small, "orders"), "orders_bk", ["o_custkey"], 8, ["o_custkey"]
    )
    write_bucketed(
        load(spark, sf_small, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "customer_bk",
        ["o_custkey"],
        8,
        ["o_custkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bk")
    spark.sql("DROP TABLE IF EXISTS customer_bk")
    spark.catalog.setCurrentDatabase("default")
    spark.sql("DROP DATABASE IF EXISTS bktest")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    joined = bucketed_join(spark, "orders_bk", "customer_bk", on=["o_custkey"])
    plan = explain_str(joined, "simple")
    assert shuffle_count(joined) == 0, plan
    assert "SortMergeJoin" in plan
    assert joined.count() == 1500


def test_unbucketed_join_does_shuffle(spark, sf_small):
    """Control: the same join on raw parquet shuffles both sides."""
    o = load(spark, sf_small, "orders").hint("MERGE")
    c = load(spark, sf_small, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    assert shuffle_count(joined) >= 2
