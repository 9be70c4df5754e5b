"""Extended analytics surface: statistical aggregates, percentiles,
arg-min/max, date arithmetic, regex scalars, collected arrays, window
variants, the salted-skew-join pattern, and a TPC-H Q3-shaped classic.

All oracle-checked; all built-in JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..tables import load
from . import query


@query(
    "q_stats_agg",
    category="aggregation",
    sql="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS price_stddev,
           ROUND(VAR_SAMP(l_extendedprice), 2)    AS price_var,
           ROUND(CORR(l_extendedprice, l_quantity), 4) AS price_qty_corr,
           ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS price_qty_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar) — all
    partial-aggregatable, one shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("price_qty_covar"),
    )


@query(
    "q_percentiles",
    category="aggregation",
    sql="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 2)  AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``). At 100 TB swap for approx_percentile
    (t-digest, partial-aggregatable) — declared here exact so the
    oracle can verify the math."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95"),
    )


@query(
    "q_argminmax",
    category="aggregation",
    sql="""
    SELECT c_mktsegment,
           arg_min(c_name, c_acctbal) AS poorest_customer,
           arg_max(c_name, c_acctbal) AS richest_customer,
           ROUND(MAX(c_acctbal), 2)   AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (SQL arg_min/arg_max): single-pass 'row achieving
    the extreme' — replaces a self-join + window at any scale.
    (c_acctbal values are unique in this data, so the result is
    deterministic.)"""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.min_by("c_name", "c_acctbal").alias("poorest_customer"),
        F.max_by("c_name", "c_acctbal").alias("richest_customer"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@query(
    "q_date_arith",
    category="scalar-date",
    sql="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 90 DAY                        AS due_date,
           date_diff('day', o_orderdate, TIMESTAMP '2001-12-31 00:00:00') AS age_days,
           date_trunc('quarter', o_orderdate)                   AS quarter_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP)             AS month_end
    FROM orders
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: interval add, datediff, quarter trunc, last_day.
    All outputs kept as timestamp_ntz — DATE round-trips differently
    through Arrow on the two engines."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.lit("2001-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("age_days"),
        F.date_trunc("quarter", "o_orderdate").cast("timestamp_ntz").alias("quarter_start"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
    )


@query(
    "q_regex_funcs",
    category="scalar-string",
    sql=r"""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1)            AS type_head,
           regexp_replace(p_name, '[aeiou]', '_', 'g')       AS name_devoweled,
           regexp_matches(p_brand, '#1[0-9]$')               AS brand_teens
    FROM part
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract / global replace / match test."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("name_devoweled"),
        F.col("p_brand").rlike(r"#1[0-9]$").alias("brand_teens"),
    )


@query(
    "q_collect_sorted",
    category="scalar-array",
    sql="""
    SELECT n_regionkey,
           list(n_name ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + sort_array ≡ SQL ordered list() — deterministic
    array aggregation (the building block for per-key feature vectors)."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list("n_name")).alias("nations")
    )


@query(
    "q_window_variants",
    category="window",
    sql="""
    SELECT o_orderkey, o_custkey,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS best_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / ntile / percent_rank / first_value over one window
    spec (shared sort — Spark evaluates all four in a single pass)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.first("o_totalprice").over(w), 2).alias("best_price"),
    )


@query(
    "q_join_salted",
    category="join",
    sql="""
    SELECT c.c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: the fact side gets a random-free deterministic
    salt (orderkey % 8); the dim side explodes ×8 so every (key, salt)
    pair still matches. Result is provably identical to the plain join
    (the oracle IS the plain join) while a hot custkey's rows spread
    over 8 reducers instead of 1. At 100 TB this is the manual fallback
    when AQE's skew splitting can't apply (e.g. pre-agg joins)."""
    n_salt = 8
    o = load(spark, sf_dir, "orders").withColumn(
        "salt", (F.col("o_orderkey") % n_salt).cast("int")
    )
    c = (
        load(spark, sf_dir, "customer")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_tpch_q3",
    category="join",
    bench=True,
    sql="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): selective dim filter → two equi
    joins → agg → top-10. Catalyst pushes all three predicates to their
    scans; the filtered customer side broadcasts at any SF where it
    fits, and the final top-k is TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", F.col("o_orderdate").alias("orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate")
    )


@query(
    "q_tpch_q5",
    category="join",
    sql="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the 6-table star-plus-snowflake
    join with the extra local-supplier constraint (customer and supplier
    share a nation). Fact tables join on their keys; nation/region/
    supplier are BROADCASTABLE dims so the only big shuffles are
    orders⋈customer and lineitem⋈orders — both on keys Catalyst already
    co-partitions; the local-supplier equality rides the supplier join
    as a residual, never a second shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = broadcast(load(spark, sf_dir, "supplier"))
    n = broadcast(load(spark, sf_dir, "nation"))
    r = broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q_tpch_q6",
    category="aggregation",
    bench=True,
    sql="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-predicate-
    aggregate query — every predicate reaches the parquet scan as a
    pushed filter, no join, no wide shuffle, one partial+final agg of a
    single row. The canonical test that pushdown and vectorized
    scanning are actually wired: at 100 TB this query's cost IS the
    scan, so any plan regression shows up as raw read amplification."""
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q_unpivot",
    category="scalar",
    sql="""
    SELECT p_partkey, 'p_size' AS metric,
           ROUND(CAST(p_size AS DOUBLE), 2) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', ROUND(p_retailprice, 2) FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long): the inverse of q_pivot, via the
    native ``DataFrame.unpivot`` (UNPIVOT in SQL) — a zero-shuffle
    narrow transform (each input row expands to k output rows in place),
    so it scales embarrassingly; the oracle states the same reshape as
    UNION ALL."""
    p = load(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    )
    return wide.unpivot(
        "p_partkey", ["p_size", "p_retailprice"], "metric", "raw"
    ).select("p_partkey", "metric", F.round("raw", 2).alias("value"))


@query("q_percentiles_approx", category="aggregation", sql=None)
def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``approx_percentile`` (Greenwald-
    Khanna sketch, accuracy 1/10000) — partial-aggregatable, so each
    partition contributes a small sketch and the merge costs bytes, not
    rows (exact percentile must materialize every group value). Declared
    rows-only (sketch internals are engine-specific); the estimate is
    held to the GK error bound against the exact percentile in
    tests/test_llm_ops.py."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile_approx("o_totalprice", 0.5, 10000), 2).alias("p50"),
        F.round(F.percentile_approx("o_totalprice", 0.95, 10000), 2).alias("p95"),
    )


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@query(
    "q_profile_stats",
    category="aggregation",
    sql="\n    UNION ALL ".join(
        f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: per-column row/null/distinct counts over
    ``orders`` — the table-health scan every ingestion pipeline runs
    before trusting a new drop of data.

    Single pass: ONE aggregate computes every column's counts (Catalyst
    plans the multi-column distinct via one Expand, so the table is
    still scanned once), then the single result row is exploded into
    one row per column. At 100 TB the Expand multiplies shuffle rows by
    the column count — there the per-column ``approx_count_distinct``
    sketch (see q_agg_approx_distinct) replaces the exact distinct and
    the whole profile degenerates to one narrow partial-agg pass; exact
    counts are kept here for cross-engine verifiability."""
    o = load(spark, sf_dir, "orders")
    row = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count(c).alias(f"nn_{c}") for c in _PROFILE_COLS],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in _PROFILE_COLS],
    )
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n").alias("n_rows"),
                (F.col("n") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
