"""Window-function queries: ranking, dedup-by-rownum, lag, running frames,
top-k sort.

All window queries use deterministic tie-breaks ((o_orderdate, o_orderkey)
or totalprice+orderkey) so the DuckDB oracle hash-matches exactly.

Scale: a window partitioned by a high-cardinality key (custkey) shuffles
once on that key and sorts within partitions — the same plan at 100 TB,
with AQE handling skewed customers. Top-k uses TakeOrderedAndProject
(per-partition heap + driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "q_window_rank",
    category="window",
    bench=True,
    sql="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
      FROM orders
    ) WHERE rnk = 1
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's top order by totalprice via RANK (ties kept —
    deterministic)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        o.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@query(
    "q_window_rownum_dedup",
    category="window",
    sql="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_window_rownum_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-row-per-key dedup via ROW_NUMBER()=1 — the standard
    LLM-pipeline pattern for 'best representative per cluster/key'.
    Tie-broken on orderkey for determinism."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@query(
    "q_window_lag",
    category="window",
    sql="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - LAG(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
    FROM orders
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-value delta vs previous order (LAG analytic).
    First order per customer yields NULL on both engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta_prev"),
    )


@query(
    "q_window_running",
    category="window",
    sql="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer — explicit ROWS frame with a
    deterministic order."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "q_sort_topk",
    category="sort",
    sql="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price (tie-break orderkey). Spark plans this as
    TakeOrderedAndProject — per-partition top-k heaps merged on the
    driver; no global sort even at 100 TB."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@query(
    "q_window_range_frame",
    category="window",
    sql="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
           ), 2) AS trailing_90d_spend
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, trailing-90-day spend at each
    order — a VALUE-based frame (all rows within 90 days of the current
    row's time), not a row-count frame; rows sharing a timestamp share
    one frame. Same single shuffle + sort as any window; the frame scan
    is a sliding two-pointer over the sorted partition."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-90 * 86400, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_90d_spend"),
    )
