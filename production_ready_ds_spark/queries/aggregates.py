"""Aggregation queries: hash aggregates, HAVING, distinct, grouping sets.

The reference has no groupBy at all (SURVEY.md §2a: absent operators);
these enter via the engine contract. All run as partial (map-side) +
final hash aggregates in Spark — one shuffle on the group keys, which is
the minimum possible; AQE coalesces post-shuffle partitions at small SF
while the same plan scales out by key hashing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "q_agg_pricing",
    category="aggregation",
    bench=True,
    sql="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2)                        AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                   AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      ROUND(AVG(l_quantity), 2)                        AS avg_qty,
      ROUND(AVG(l_extendedprice), 2)                   AS avg_price,
      ROUND(AVG(l_discount), 2)                        AS avg_disc,
      COUNT(*)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the flagship query.

    Scan → pushed filter → partial+final hash agg. At 100 TB: the filter
    and the 2-column group key reach the parquet scan (PushedFilters +
    ReadSchema pruning); only 4-6 groups survive, so the shuffle is tiny
    regardless of input size.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_having",
    category="aggregation",
    sql="""
    SELECT c_mktsegment, COUNT(*) AS n_customers, ROUND(AVG(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    HAVING COUNT(*) > 20
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter). Threshold 20 so the
    result is non-empty at every testdata scale factor."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
        .filter(F.col("n_customers") > 20)
    )


@query(
    "q_agg_countdistinct",
    category="aggregation",
    sql="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_agg_countdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — expands to a two-phase agg in
    Spark (distinct on (status, custkey) then count), shuffling only key
    pairs; at 100 TB this stays one shuffle wide."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_agg_approx_distinct",
    category="aggregation",
    sql="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_rel_error
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct, verified the bounds-contract way
    (the q_cms_token_freq / q_heavy_hitters convention): the raw
    estimate is engine-specific (DuckDB's approx_count_distinct uses a
    different sketch) so it cannot be hashed cross-engine, but the
    sketch's GUARANTEE can — the output carries the exact
    COUNT(DISTINCT) plus ``within_rel_error`` the oracle expects TRUE:
    |estimate − exact| ≤ 0.10·exact, a 5σ bound for rsd=0.02 (measured
    ≤ 1.03% at sf0.001/0.01/0.1; the slack is deliberate — the bound is
    part of the ORACLE hash, so a legitimate sketch tail must not read
    as a correctness failure). Given fixed data and Spark's fixed HLL
    hashing the check is deterministic per SF.

    The 100 TB answer to COUNT(DISTINCT): constant memory,
    partial-aggregatable, no key-pair shuffle — the exact column here
    is the sf-level verification baseline, the sketch is what moves at
    scale (same split as q_sketch_theta's exact-vs-KMV columns)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
            F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx") - F.col("exact_parts"))
                <= 0.10 * F.col("exact_parts")
            ).alias("within_rel_error"),
        )
    )


@query(
    "q_pivot",
    category="aggregation",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority × status as columns. Explicit
    pivot values keep it a single-pass agg (no extra distinct-values
    job) — the required form at scale."""
    o = load(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


@query(
    "q_scalar_subquery",
    category="aggregation",
    sql="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate via the SQL entry point — Catalyst
    plans the subquery once and broadcasts the scalar."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


_REVENUE_SQL = "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)"


@query(
    "q_rollup",
    category="grouping-sets",
    sql=f"""
    SELECT l_returnflag, l_linestatus, {_REVENUE_SQL} AS revenue, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (flag, status) → (flag) → ()."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_cube",
    category="grouping-sets",
    sql=f"""
    SELECT l_returnflag, l_linestatus, {_REVENUE_SQL} AS revenue, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 4 key subsets in one pass (Spark expands
    rows once per grouping set before the hash agg)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_grouping_sets",
    category="grouping-sets",
    sql=f"""
    SELECT l_returnflag, l_linestatus, {_REVENUE_SQL} AS revenue, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL entry point (the engine's
    second, equivalent query language — same Catalyst plan)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        """
    )
