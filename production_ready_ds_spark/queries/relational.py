"""Scan / projection / filter / set-operation queries.

Mirrors of the reference's core surface (SURVEY.md §2a S4, P1-P7, Q1)
made relational over the testdata tables, plus the set operations the
contract adds (EXT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "q_scan_project",
    category="scan",
    sql="""
    SELECT l_orderkey, l_partkey, l_linenumber,
           ROUND(l_quantity, 2)      AS l_quantity,
           ROUND(l_extendedprice, 2) AS l_extendedprice
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan (reference P1, 01_classification_pipeline.py:52).

    Column pruning reaches the parquet reader: ReadSchema carries exactly
    these 5 columns — at 100 TB the other 6 lineitem columns are never
    deserialized."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("l_quantity"),
        F.round("l_extendedprice", 2).alias("l_extendedprice"),
    )


@query(
    "q_filter_like",
    category="filter",
    sql="""
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_type LIKE '%ECONOMY%'
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE predicate (reference P3, 00_training_pipeline.py:135 uses a
    degenerate LIKE-as-equality; here a real wildcard). StringContains is
    pushed to the parquet row-group level."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type").like("%ECONOMY%"))
        .select("p_partkey", "p_name", "p_type", "p_brand")
    )


@query(
    "q_filter_range",
    category="filter",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range predicate — the relational twin of the reference's
    source-side time-interval pushdown (S2,
    01_classification_pipeline.py:44-47). Min/max row-group stats prune
    most of the table before any row is read."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


@query(
    "q_cast_label",
    category="projection",
    sql="""
    SELECT o_orderkey,
           CAST(o_orderstatus LIKE 'F' AS DOUBLE) AS label
    FROM orders
    """,
)
def q_cast_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE → boolean → CAST double label column — exact mirror of the
    reference's training-label derivation (P3+P4,
    00_training_pipeline.py:135)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").like("F").cast("double").alias("label"),
    )


@query(
    "q_case_when",
    category="projection",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'done' END AS status_label
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN labeling — mirror of the reference's prediction→label
    mapping (P5+P6, 01_classification_pipeline.py:195-198)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open").otherwise("done").alias("status_label"),
    )


@query(
    "q_null_fill",
    category="projection",
    sql="""
    SELECT o_orderkey,
           COALESCE(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderpriority END,
                    '') AS priority_filled
    FROM orders
    """,
)
def q_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-defaulting (reference P7 ``fillna('')``,
    00_training_pipeline.py:79): manufacture a nullable expression, then
    coalesce to '' — same semantics as ``df.na.fill("")``."""
    o = load(spark, sf_dir, "orders")
    nullable = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(F.col("o_orderpriority"))
    return o.select(
        "o_orderkey",
        F.coalesce(nullable, F.lit("")).alias("priority_filled"),
    )


# Two deliberately-overlapping customer slices used by all four set ops.
_SLICE_A = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SLICE_B = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000"


def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a, b


@query(
    "q_union_all",
    category="set-op",
    sql=f"{_SLICE_A} UNION ALL {_SLICE_B}",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with duplicates kept (reference Q1's reduce-append,
    00_training_pipeline.py:33-42). Union is a zero-shuffle operator in
    Spark — partitions are simply concatenated."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b)


@query(
    "q_union_distinct",
    category="set-op",
    sql=f"{_SLICE_A} UNION {_SLICE_B}",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — union + hash-dedup (one shuffle on the row key)."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b).distinct()


@query(
    "q_intersect",
    category="set-op",
    sql=f"{_SLICE_A} INTERSECT {_SLICE_B}",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics both engines)."""
    a, b = _slices(spark, sf_dir)
    return a.intersect(b)


@query(
    "q_except",
    category="set-op",
    sql=f"{_SLICE_A} EXCEPT {_SLICE_B}",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics both engines)."""
    a, b = _slices(spark, sf_dir)
    return a.subtract(b)


# Two deliberately-overlapping MULTISET slices (o_custkey repeats per
# order) — the ALL set-op pair needs real duplicate multiplicities,
# which the customer slices above (unique c_custkey) cannot exercise.
_MSLICE_A = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
_MSLICE_B = "SELECT o_custkey FROM orders WHERE o_totalprice > 150000"


def _multiset_slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    return a, b


@query(
    "q_intersect_all",
    category="set-op",
    sql=f"{_MSLICE_A} INTERSECT ALL {_MSLICE_B}",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection keeping MIN(multiplicity A,
    multiplicity B) copies of each key, the SQL-standard semantics
    DISTINCT intersect erases. Physically one hash aggregation per
    side computing per-key counts plus one key-to-key join — a
    two-shuffle plan whose traffic is the distinct-key count, not the
    row count (Spark plans intersectAll exactly so; duplicates are
    re-expanded after the counts meet)."""
    a, b = _multiset_slices(spark, sf_dir)
    return a.intersectAll(b)


@query(
    "q_except_all",
    category="set-op",
    sql=f"{_MSLICE_A} EXCEPT ALL {_MSLICE_B}",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference keeping MAX(0, mult A − mult B)
    copies, the multiplicity-aware complement of q_except. Same
    counts-then-rebalance physical shape as q_intersect_all."""
    a, b = _multiset_slices(spark, sf_dir)
    return a.exceptAll(b)
