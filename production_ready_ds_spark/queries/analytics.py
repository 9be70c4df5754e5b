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
    "q_dq_checks",
    category="aggregation",
    sql="""
    SELECT 'orders_orphan_custkey' AS check_name,
           CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS n_violations,
           CAST(COUNT(*) AS BIGINT) AS n_checked
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'orders_duplicate_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_totalprice',
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'customer_blank_name',
           CAST(COUNT(*) FILTER (WHERE c_name IS NULL OR trim(c_name) = '') AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM customer
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: the expectation checks a production pipeline
    runs before promoting a new data drop — referential integrity
    (orphan foreign keys), key uniqueness, value ranges, and
    blank-field rates — emitted as one (check, violations, checked)
    report the orchestrator can assert on (the relational
    generalization of the reference's fillna-then-trust ingestion,
    `00_training_pipeline.py:79`).

    Scale shape: each check is a conditional aggregate over one scan —
    counts flow through map-side partials, so every check costs one
    linear pass and a few bytes of shuffle; the referential check is
    the only join and aggregates COUNT(missing) on a left join that
    AQE broadcasts when the dimension fits. Checks over the same table
    could share a scan via a single multi-output aggregate if scan
    cost ever dominates (the q_profile_stats pattern)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")

    def one(name: str, viol, base: DataFrame) -> DataFrame:
        return base.agg(
            F.lit(name).alias("check_name"),
            F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias("n_violations"),
            F.count(F.lit(1)).cast("long").alias("n_checked"),
        )

    orphan = one(
        "orders_orphan_custkey",
        F.col("c_custkey").isNull(),
        o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left"),
    )
    dup = o.agg(
        F.lit("orders_duplicate_orderkey").alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("long").alias("n_violations"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
    )
    price = one("orders_nonpositive_totalprice", F.col("o_totalprice") <= 0, o)
    disc = one(
        "lineitem_discount_out_of_range",
        (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
        li,
    )
    blank = one(
        "customer_blank_name",
        F.col("c_name").isNull() | (F.trim("c_name") == ""),
        c,
    )
    return orphan.unionByName(dup).unionByName(price).unionByName(disc).unionByName(blank)


N_HIST_BUCKETS = 20


@query(
    "q_histogram",
    category="aggregation",
    sql=f"""
    WITH b AS (
      -- GREATEST guard: a constant column gives width 0 and (x-lo)/0 is
      -- NaN — every row then lands in one garbage bucket (or errors on
      -- the bigint cast). With width clamped to 1 the degenerate case
      -- collapses cleanly into bucket 0.
      SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
             GREATEST((CAST(MAX(o_totalprice) AS DOUBLE) - CAST(MIN(o_totalprice) AS DOUBLE))
               / {N_HIST_BUCKETS}.0, 1e-12) AS w
      FROM orders
    )
    SELECT bucket,
           ROUND(lo + bucket * w, 2) AS bucket_lo,
           COUNT(*) AS n,
           ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct
    FROM (
      SELECT LEAST(CAST(FLOOR((CAST(o_totalprice AS DOUBLE) - b.lo) / b.w) AS BIGINT),
                   {N_HIST_BUCKETS - 1}) AS bucket,
             b.lo AS lo, b.w AS w
      FROM orders CROSS JOIN b
    )
    GROUP BY bucket, lo, w
    ORDER BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice with data-driven bounds —
    the distribution profile every data-quality report draws.

    Two-pass shape that stays linear at any scale: pass 1 is a one-row
    min/max aggregate, broadcast as a literal cross join; pass 2 assigns
    buckets map-side (pure arithmetic, no UDF) and hash-aggregates
    {N_HIST_BUCKETS} rows. The percentage column is a window over the
    {N_HIST_BUCKETS}-row result, not the data. Both engines compute the
    bucket in IEEE double arithmetic so the hash compare is exact."""
    o = load(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_totalprice").cast("double").alias("lo"),
        # greatest(..., 1e-12) guards the constant-column case: width 0
        # would make every bucket NaN (see the oracle SQL comment).
        F.greatest(
            (F.max("o_totalprice").cast("double") - F.min("o_totalprice").cast("double"))
            / F.lit(float(N_HIST_BUCKETS)),
            F.lit(1e-12),
        ).alias("w"),
    )
    bucket = F.least(
        F.floor((F.col("o_totalprice").cast("double") - F.col("lo")) / F.col("w")).cast("long"),
        F.lit(N_HIST_BUCKETS - 1),
    )
    hist = (
        o.crossJoin(broadcast(b))
        .select(bucket.alias("bucket"), "lo", "w")
        .groupBy("bucket", "lo", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy()
    return (
        hist.select(
            "bucket",
            F.round(F.col("lo") + F.col("bucket") * F.col("w"), 2).alias("bucket_lo"),
            "n",
            F.round(100.0 * F.col("n") / F.sum("n").over(total), 2).alias("pct"),
        )
        .orderBy("bucket")
    )


@query(
    "q_tpch_q4",
    category="join",
    sql="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (priority checking), adapted: the reference schema has
    no l_commitdate/l_receiptdate, so "late" is l_shipdate more than 90
    days after o_orderdate — the same correlated-EXISTS-with-non-equi-
    predicate shape Q4 exercises. Catalyst decorrelates the EXISTS into
    a LEFT SEMI join on l_orderkey = o_orderkey with the date
    comparison as a residual — one key shuffle, no row duplication (a
    plain inner join would multiply orders by their matching lines and
    need a re-distinct). The quarter filter is pushed to the orders
    scan. Grounding: SURVEY §2b EXT; reference temporal predicate S2
    (`01_classification_pipeline.py:44-47`)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q12",
    category="join",
    sql="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority), adapted: no l_shipmode in
    the reference schema, so lines group by l_returnflag and the
    priority split keeps Q12's conditional-aggregation core — SUM(CASE
    WHEN priority) computed in the same pass as the join, no second
    scan. The year filter prunes lineitem at the scan; the join
    shuffles both sides on orderkey once, and the tiny 3-row result
    aggregates map-side first. Grounding: SURVEY §2b EXT; CASE-WHEN is
    reference P5 (`01_classification_pipeline.py:195-198`)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_tpch_q14",
    category="join",
    sql="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one-month lineitem slice joined to
    ``part`` (p_type = 'PROMO' — the reference schema's p_type is a
    plain category, no 'PROMO%' prefix family), promo revenue as a
    percentage of total. ``part`` is the smaller side and is broadcast
    explicitly — at 100 TB the month filter makes lineitem the pruned
    probe side and the dimension hash table still fits per executor;
    both conditional sums ride one pass, so the query is a single
    broadcast-hash-join stage with a scalar result. Grounding: SURVEY
    §2b EXT (star-schema revenue family, q_join_star)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 2).alias("promo_revenue_pct"))
    )


@query(
    "q_tpch_q18",
    category="join",
    bench=True,
    sql="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           o.o_orderdate AS orderdate, ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total line
    quantity exceeds 300, with customer attribution. The plan
    aggregates lineitem by orderkey FIRST and filters to the ~0.3 % of
    orders over the threshold, then joins the survivors to orders and
    customer — so the expensive fact-fact join touches only qualifying
    keys, and at 100 TB the qualifying set is small enough that AQE
    converts both attribution joins to broadcasts at runtime. (The
    naive IN-subquery shape the SQL states is exactly what Catalyst
    rewrites to this agg-then-semi-join plan.) Top-100 is
    TakeOrderedAndProject. Grounding: SURVEY §2b EXT (q_agg_having +
    q_sort_topk composed)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 300)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("raw_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q_tpch_q22",
    category="join",
    sql="""
    SELECT c.c_nationkey, COUNT(*) AS n_cust, ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: no c_phone in the
    reference schema, so the report groups by c_nationkey, and "never
    placed an order" becomes "no order since 2000-01-01" (every
    synthetic customer has some historical order). Keeps both of Q22's
    planner shapes: an uncorrelated scalar subquery (positive-balance
    average — computed once and broadcast as a 1-row literal join) and
    an anti join against date-filtered orders (shuffle on custkey; the
    date filter prunes the orders scan before the shuffle). Grounding:
    SURVEY §2b EXT (q_scalar_subquery + q_join_anti composed)."""
    c = load(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        c.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
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


#: rank-error budget for the q_percentiles_approx contract booleans —
#: 50× the GK sketch's 1e-4 accuracy, because at small group sizes
#: (δ·n < 1) the slack must also absorb the ±1 rank-convention
#: difference between quantile definitions; the sketch itself is
#: orders of magnitude inside this at any n
PCT_RANK_DELTA = 0.005


@query(
    "q_percentiles_approx",
    category="aggregation",
    sql="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           TRUE AS p50_within_rank_bound,
           TRUE AS p95_within_rank_bound
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``approx_percentile`` (Greenwald-
    Khanna sketch, accuracy 1/10000) — partial-aggregatable, so each
    partition contributes a small sketch and the merge costs bytes, not
    rows (exact percentile must materialize every group value).

    Verified the bounds-contract way (q_agg_approx_distinct /
    q_cms_token_freq): the estimate value is sketch-internal and
    cannot hash cross-engine, but GK's RANK guarantee can — for each
    group the output carries the exact count plus booleans the oracle
    expects TRUE: the estimate's rank interval [#(< est), #(≤ est)]
    must intersect (p ± {PCT_RANK_DELTA})·n. The rank audit is one
    broadcast join of the 3-row estimate frame back onto orders plus
    one aggregate — the exact-side verification baseline, same split
    as the theta sketch's exact columns; the estimate quality itself
    is additionally held within 1% of exact in tests/test_llm_ops.py."""
    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    est = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
    )
    joined = o.join(F.broadcast(est), "o_orderstatus")

    def within(p: float, col: str):
        lt = F.sum((F.col("o_totalprice") < F.col(col)).cast("long"))
        le = F.sum((F.col("o_totalprice") <= F.col(col)).cast("long"))
        n = F.count(F.lit(1))
        return (lt <= (p + PCT_RANK_DELTA) * n) & (le >= (p - PCT_RANK_DELTA) * n)

    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        within(0.5, "p50").alias("p50_within_rank_bound"),
        within(0.95, "p95").alias("p95_within_rank_bound"),
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


SKEW_TOP_K = 10


@query(
    "q_skew_profile",
    category="aggregation",
    sql=f"""
    WITH k AS (
      SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ),
    stats AS (
      SELECT MAX(n) AS max_n, ROUND(AVG(n), 4) AS avg_n,
             quantile_cont(n, 0.99) AS p99_n, COUNT(*) AS n_keys
      FROM k
    )
    SELECT k.key, CAST(k.n AS BIGINT) AS n,
           ROUND(k.n / s.avg_n, 2) AS x_mean,
           CAST(s.n_keys AS BIGINT) AS n_keys,
           ROUND(s.p99_n, 2) AS p99_n
    FROM k CROSS JOIN stats s
    ORDER BY k.n DESC, k.key
    LIMIT {SKEW_TOP_K}
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the top-{SKEW_TOP_K} heaviest values of
    a prospective join/shuffle key with their multiple-of-mean and the
    key distribution's p99 — the pre-flight check that decides between
    a plain shuffle join, AQE skew split, and manual salting
    (q_join_salted). A key at 100× the mean means one reducer does
    100× the work; this query is how you find it BEFORE the 4-hour
    stage tail does.

    Scale shape: one hash-agg on the key (map-side combined), a
    one-row stats aggregate over the per-key counts broadcast back as
    a literal, and a top-k that is TakeOrderedAndProject — cost is one
    pass over the fact table plus |distinct keys| for the stats, with
    nothing proportional to row count after the first aggregate."""
    o = load(spark, sf_dir, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(F.count(F.lit(1)).alias("n"))
    stats = k.agg(
        F.round(F.avg("n"), 4).alias("avg_n"),
        F.expr("percentile(n, 0.99)").alias("p99_raw"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        k.crossJoin(broadcast(stats))
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("avg_n"), 2).alias("x_mean"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.round("p99_raw", 2).alias("p99_n"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(SKEW_TOP_K)
    )


# ----------------------------------------------------- TPC-H round 3 --
# Q7/Q8/Q10/Q13/Q15/Q17/Q19/Q21 — with Q1/Q3-Q6/Q12/Q14/Q18/Q22 this
# is every TPC-H query expressible over the reference schema (Q2, Q9,
# Q11, Q16, Q20 need the partsupp table, which the testdata generator
# does not produce; columns absent from the slimmed schema — comments,
# containers, ship/commit/receipt details — are adapted as noted, per
# the q_tpch_q12 precedent).


@query(
    "q_tpch_q7",
    category="join",
    sql="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           YEAR(l.l_shipdate) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year. The disjunctive nation-pair predicate rides the
    two BROADCAST nation joins as a residual — the fact tables shuffle
    only on their join keys (lineitem⋈orders, orders⋈customer), the
    shipdate range is pushed to the lineitem scan, and the grouped
    result is |nations|²·|years| — constant."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q8",
    category="join",
    sql="""
    SELECT YEAR(o.o_orderdate) AS o_year,
           ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'EUROPE'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the target nation's share of a
    region's volume in one part type, by year — the conditional-sum /
    total-sum ratio computed in ONE pass (no self-join of the volume
    table). part, supplier, nation, region all broadcast; the only big
    shuffles are the two fact joins on their keys."""
    p = broadcast(load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY"))
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load(spark, sf_dir, "customer")
    n1 = broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    ))
    r = broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    s = broadcast(load(spark, sf_dir, "supplier"))
    n2 = broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    ))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == F.col("r_regionkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q10",
    category="join",
    bench=True,
    sql="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(MIN(c.c_acctbal), 2) AS acctbal,
           MIN(n.n_name) AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): the quarter's top-20
    customers by revenue lost to returns. The returnflag and date
    predicates both push to their scans; nation broadcasts; the final
    top-k is TakeOrderedAndProject with c_custkey as the deterministic
    tie-break. Address/phone/comment of the classic output don't exist
    in the slimmed schema; the dependent dims ride as MIN() aggregates
    rather than GROUP BY keys so no double ever becomes a grouping
    key."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = broadcast(load(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.min("c_acctbal"), 2).alias("acctbal"),
            F.min("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_q13",
    category="join",
    sql="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): two stacked
    aggregations over a LEFT OUTER join — customers with zero
    qualifying orders must appear in the c_count=0 bucket, which an
    inner join silently drops. The classic comment NOT-LIKE exclusion
    is adapted to o_orderpriority (no o_comment in the slimmed schema)
    and rides the JOIN CONDITION, not a WHERE (a post-join filter would
    delete the zero-order customers the outer join just preserved).
    First agg shuffles on custkey; the second is distribution-sized."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q_tpch_q15",
    category="join",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r.total, 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total = (SELECT MAX(total) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the quarter's max-revenue supplier(s).
    The classic view + scalar subquery decorrelates to ONE aggregation
    and an unpartitioned max window over the per-supplier totals (a
    |suppliers|-sized frame, not the fact table) — no second scan of
    lineitem. The max comparison happens on the UNROUNDED total within
    one engine's own sums, so cross-engine ulp noise cannot split the
    argmax; output rounds for the hash compare."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total")
    )
    w = Window.partitionBy()
    top = rev.withColumn("mx", F.max("total").over(w)).filter(
        F.col("total") == F.col("mx")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(broadcast(top), s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", F.round("total", 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q17",
    category="aggregation",
    sql="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#9'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines under 20% of
    their part's average quantity. The correlated scalar subquery
    decorrelates to a per-part AVG joined back on partkey — and the
    average is computed AFTER the broadcast brand semi-restriction, so
    the aggregate runs over the brand's lines only (identical result:
    the subquery is only ever evaluated for brand parts; container
    filter of the classic form dropped — no p_container in the slimmed
    schema). Quantities are integral, so 0.2*AVG compares identically
    in both engines (exact sums / correctly-rounded division)."""
    p = broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#9")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        p, F.col("l_partkey") == F.col("p_partkey")
    )
    cut = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(cut, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@query(
    "q_tpch_q19",
    category="aggregation",
    sql="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 11 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 26 AND 50
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunctive-predicate query.
    The three OR branches mix part-side and lineitem-side conditions,
    so neither side's predicate is a simple conjunct — Catalyst still
    extracts the per-side implied disjunctions (brand/size on the part
    scan, quantity range on the lineitem scan) as pushed filters, and
    the full disjunction evaluates as the broadcast join's residual.
    Ship-mode/instruction conjuncts of the classic form don't exist in
    the slimmed schema."""
    p = broadcast(load(spark, sf_dir, "part"))
    li = load(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(11, 25) & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(26, 50) & F.col("l_quantity").between(20, 35))
    )
    return j.filter(branch).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q_tpch_q21",
    category="join",
    bench=True,
    sql="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey AND l1.l_returnflag = 'R'
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: the
    slimmed schema has no commit/receipt dates, so "late" is marked by
    l_returnflag='R' — the sole-blame structure is intact: count a
    supplier's R-lines on multi-supplier 'F' orders where NO other
    supplier returned a line.

    Decorrelation is the point: the classic EXISTS + NOT-EXISTS pair
    (two correlated scans of lineitem) collapses into per-order counts
    — n_supp = |distinct suppkey|, n_r_supp = |distinct suppkey over
    R-lines| — carried by TWO collect_set windows over ONE shuffle of
    lineitem on orderkey (a groupBy-and-join-back formulation reads
    lineitem twice and pays an Expand for the dual countDistinct —
    measured 2× slower; both windows share the partition spec so
    Catalyst evaluates them in a single Window operator, and per-order
    supplier sets are tiny, ≤7 entries). Since the blamed line is
    itself an R-line of the order, EXISTS(other supplier) ⇔ n_supp ≥ 2
    and NOT EXISTS(other R supplier) ⇔ n_r_supp = 1. Supplier (a true
    dimension) broadcasts; the status-F order keys are deliberately
    NOT hinted — F-orders are ~half the orders table and grow with the
    corpus, so the join is left size-adaptive (AQE broadcasts it at
    small SF, shuffles it at 100 TB)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    w = Window.partitionBy("l_orderkey")
    li2 = li.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_r_supp",
        F.size(
            F.collect_set(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).over(w)
        ),
    )
    l1 = li2.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("n_supp") >= 2)
        & (F.col("n_r_supp") == 1)
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = broadcast(load(spark, sf_dir, "supplier"))
    return (
        l1.join(o.select("o_orderkey"), l1.l_orderkey == F.col("o_orderkey"))
        .join(s, l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H completion set (Q2 / Q9 / Q11 / Q16 / Q20). The slimmed schema has
# no partsupp table, so every query below derives the part-supplier
# relationship from lineitem — the distinct (l_partkey, l_suppkey) pairs ARE
# the catalog, and per-pair facts (min unit price, shipped quantity) stand in
# for ps_supplycost / ps_availqty. The derivation is one groupBy over
# lineitem's join keys (the same shuffle the classic partsupp join would
# pay), so the plan shapes — and the decorrelation patterns the queries
# exist to exercise — are unchanged. With q_agg_pricing standing in for Q1,
# this completes all 22 TPC-H query structures.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q2",
    category="join",
    sql="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p.p_partkey, eu.s_name, eu.s_acctbal, eu.n_name, ps.supplycost,
             MIN(ps.supplycost) OVER (PARTITION BY p.p_partkey) AS min_cost
      FROM ps
      JOIN part p ON p.p_partkey = ps.l_partkey
                 AND p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 25
      JOIN eu ON eu.s_suppkey = ps.l_suppkey
    )
    SELECT ROUND(s_acctbal, 2) AS acctbal, s_name, n_name AS nation,
           p_partkey, ROUND(supplycost, 2) AS cost
    FROM cand WHERE supplycost = min_cost
    ORDER BY acctbal DESC, nation, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: supplycost :=
    MIN(l_extendedprice / l_quantity) per (part, supplier) pair derived
    from lineitem (no partsupp in the slimmed schema). The classic
    correlated MIN subquery decorrelates to a per-part MIN WINDOW over
    the already-joined candidate rows — one pass, no second scan of the
    pair table. part (filtered) and the EUROPE supplier→nation→region
    snowflake both BROADCAST; the only big work is the one lineitem
    groupBy that builds the pair table. Cross-engine safety: IEEE
    division is correctly rounded, so both engines derive bit-identical
    costs, and the min-equality filter selects the same rows (ties keep
    every min-cost supplier, as the classic does); output rounds."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    p = broadcast(
        load(spark, sf_dir, "part").filter(
            (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 25)
        )
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = broadcast(
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(eu, ps.l_suppkey == F.col("s_suppkey"))
        .withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            F.round("supplycost", 2).alias("cost"),
        )
        .orderBy(F.desc("acctbal"), F.asc("nation"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


@query(
    "q_tpch_q9",
    category="join",
    bench=True,
    sql="""
    SELECT n.n_name AS nation, YEAR(o.o_orderdate) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: unit supply cost :=
    0.6 * p_retailprice (part-carried constant — no ps_supplycost in the
    slimmed schema), so profit = revenue − cost·quantity, grouped by the
    SUPPLIER's nation and order year exactly as the classic. The
    name-LIKE filter prunes part BEFORE its broadcast; supplier and
    nation broadcast too, so the single big shuffle is lineitem⋈orders
    on orderkey (then one |nations|·|years|-sized agg). The profit
    expression is evaluated per-line BEFORE partial aggregation —
    map-side combine sees the final addend, not two parallel sums."""
    p = broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load(spark, sf_dir, "lineitem")
    s = broadcast(load(spark, sf_dir, "supplier"))
    n = broadcast(load(spark, sf_dir, "nation"))
    o = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q_tpch_q11",
    category="aggregation",
    sql="""
    WITH region_value AS (
      SELECT l.l_partkey, SUM(l.l_extendedprice * l.l_quantity) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, ROUND(value, 2) AS value
    FROM region_value
    WHERE value > (SELECT 3 * AVG(value) FROM region_value)
    ORDER BY value DESC, p_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted: a part's held value in one
    REGION := SUM(l_extendedprice · l_quantity) over that region's
    suppliers' lineitems (ps_supplycost·ps_availqty has no source
    table; region rather than the classic single nation so the filter
    is non-empty at every test SF — sf0.001 holds only 10 suppliers).
    The classic FRACTION-OF-TOTAL threshold scales its constant by 1/SF
    in the spec; a scale-free 3×AVG cut keeps the scalar-subquery
    structure without per-SF parameters. It decorrelates to an
    unpartitioned window AVG over the per-part aggregate — a
    |parts|-sized frame, never a second lineitem scan. The region's
    supplier keys broadcast into the scan-side join, so the one big
    shuffle is the per-part groupBy.

    Cross-engine boundary-tie risk (documented, measured): the 3×AVG
    threshold compares two float sums whose addition orders differ
    between engines; a part whose value sits within ulp of the
    threshold could flip membership. Values here are ~1e4 while doubles
    carry ~16 significant digits — the boundary band is ~12 orders of
    magnitude narrower than inter-part value gaps, and the sf0.001/0.01
    oracles hash-match. The same reasoning bounds q_tpch_q15's argmax."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = broadcast(
        load(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem")
    per_part = (
        li.join(s, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    w = Window.partitionBy()
    return (
        per_part.withColumn("cut", F.lit(3.0) * F.avg("value").over(w))
        .filter(F.col("value") > F.col("cut"))
        .select(
            F.col("l_partkey").alias("p_partkey"), F.round("value", 2).alias("value")
        )
        .orderBy(F.desc("value"), F.asc("p_partkey"))
    )


@query(
    "q_tpch_q16",
    category="aggregation",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the
    relationship table is lineitem's distinct (partkey, suppkey) pairs;
    the classic complaint-comment exclusion becomes the negative-balance
    suppliers (no s_comment in the slimmed schema). The NOT-IN
    decorrelates to a broadcast LEFT-ANTI join (safe here: s_suppkey is
    never null, so NOT-IN's three-valued-logic trap is void — noted
    because a null-able key would silently empty the classic NOT IN).
    Filters prune part before broadcast; the distinct and the
    countDistinct share the pair shuffle's key prefix."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = broadcast(
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = broadcast(
        load(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@query(
    "q_tpch_q20",
    category="join",
    sql="""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS qty,
             SUM(SUM(l.l_quantity)) OVER (PARTITION BY l.l_partkey) AS part_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT DISTINCT s.s_name, n.n_name AS nation
    FROM shipped sh
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE sh.qty > 0.3 * sh.part_qty AND n.n_regionkey < 3
    ORDER BY s.s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: with no
    ps_availqty, a supplier qualifies by DOMINANCE — shipping > 30 % of
    a red part's total 1996 volume (the classic's availqty > ½·shipped
    inverted onto the one fact we have). The classic's nested IN-chain
    (partsupp ⊂ parts, qty ⊂ correlated lineitem sum) decorrelates to
    one groupBy on (part, supplier) plus a per-part window SUM — the
    window reads the |pairs|-sized aggregate, not lineitem. Quantities
    are integral doubles, so qty and 0.3·part_qty are EXACT in both
    engines — the share comparison cannot ulp-flip (contrast
    q_tpch_q11's float-value threshold, where the band argument is
    needed). Red parts broadcast into the scan; the final DISTINCT
    dedups a supplier dominating several parts."""
    p = broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    w = Window.partitionBy("l_partkey")
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > F.lit(0.3) * F.col("part_qty"))
    )
    s = broadcast(load(spark, sf_dir, "supplier"))
    n = broadcast(load(spark, sf_dir, "nation").filter(F.col("n_regionkey") < 3))
    return (
        shipped.join(s, shipped.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("s_name")
    )


# ------------------------------------------------------- data layout --

_ZORDER_BITS = 8
_ZORDER_TOP = (1 << _ZORDER_BITS) - 1


def _zkey_sql(p0: str, p1: str) -> str:
    """Morton-interleave SQL for two already-scaled [0, 2^bits) BIGINT
    expressions — the DuckDB twin of operators/layout.zorder_key
    (dim j's bit i lands at position i·ndims + j), generated from the
    same bit walk so the two engines can never disagree on the key."""
    terms = []
    for i in range(_ZORDER_BITS):
        terms.append(f"((({p0} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({p1} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# The min-max scaling shared by BOTH clustering-layout oracles — ONE
# text (and one Spark twin, _scaled_lineitem_keys below) so a future
# change to the scaling (the span==0 guard, the LEAST clamp) can never
# drift between the z-order and Hilbert twins and their oracles.
_SCALED_KEYS_CTES = f"""g AS (
      SELECT CAST(MIN(l_partkey) AS DOUBLE) AS mn_p,
             CAST(MAX(l_partkey) AS DOUBLE) AS mx_p,
             CAST(MIN(l_suppkey) AS DOUBLE) AS mn_s,
             CAST(MAX(l_suppkey) AS DOUBLE) AS mx_s
      FROM lineitem
    ),
    s AS (
      SELECT l_partkey, l_suppkey,
             CAST(LEAST({_ZORDER_TOP}, FLOOR(
               (CAST(l_partkey AS DOUBLE) - mn_p)
               / (CASE WHEN mx_p - mn_p = 0 THEN 1.0 ELSE mx_p - mn_p END)
               * {_ZORDER_TOP})) AS BIGINT) AS p0,
             CAST(LEAST({_ZORDER_TOP}, FLOOR(
               (CAST(l_suppkey AS DOUBLE) - mn_s)
               / (CASE WHEN mx_s - mn_s = 0 THEN 1.0 ELSE mx_s - mn_s END)
               * {_ZORDER_TOP})) AS BIGINT) AS p1
      FROM lineitem, g
    )"""

# The shared per-bucket report both layout queries aggregate to.
_LAYOUT_REPORT_SQL = """
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS pk_lo,
           CAST(MAX(l_partkey) AS BIGINT) AS pk_hi,
           CAST(MIN(l_suppkey) AS BIGINT) AS sk_lo,
           CAST(MAX(l_suppkey) AS BIGINT) AS sk_hi
    """


def _scaled_lineitem_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE Spark twin of _SCALED_KEYS_CTES: lineitem with both keys
    min-max scaled into [0, 2^bits) as p0/p1 — consumed by the z-order
    and Hilbert layout queries alike. Bounds are one tiny broadcast
    aggregate; scaling is map-side codegen."""
    li = load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").cast("double").alias("mn_p"),
        F.max("l_partkey").cast("double").alias("mx_p"),
        F.min("l_suppkey").cast("double").alias("mn_s"),
        F.max("l_suppkey").cast("double").alias("mx_s"),
    )

    def scaled(c: str, mn: str, mx: str):
        span = F.when(F.col(mx) - F.col(mn) == 0, F.lit(1.0)).otherwise(
            F.col(mx) - F.col(mn)
        )
        return F.least(
            F.lit(_ZORDER_TOP),
            F.floor((F.col(c).cast("double") - F.col(mn)) / span * _ZORDER_TOP),
        ).cast("long")

    return li.crossJoin(broadcast(bounds)).select(
        "l_partkey",
        "l_suppkey",
        scaled("l_partkey", "mn_p", "mx_p").alias("p0"),
        scaled("l_suppkey", "mn_s", "mx_s").alias("p1"),
    )


def _layout_report(keyed: DataFrame) -> DataFrame:
    """The ONE Spark twin of _LAYOUT_REPORT_SQL's aggregate."""
    return (
        keyed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("l_partkey").cast("long").alias("pk_lo"),
            F.max("l_partkey").cast("long").alias("pk_hi"),
            F.min("l_suppkey").cast("long").alias("sk_lo"),
            F.max("l_suppkey").cast("long").alias("sk_hi"),
        )
        .orderBy("bucket")
    )


_ZORDER_SQL = f"""
    WITH {_SCALED_KEYS_CTES},
    z AS (
      SELECT l_partkey, l_suppkey, ({_zkey_sql("p0", "p1")}) >> 12 AS bucket
      FROM s
    )
    {_LAYOUT_REPORT_SQL}
    FROM z GROUP BY bucket ORDER BY bucket
    """


@query("q_zorder_layout", category="layout", sql=_ZORDER_SQL)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) clustering assignment — the multi-dimension
    data-layout operator behind Delta OPTIMIZE ZORDER / Iceberg
    z-ordered rewrites, surfaced as an oracle-checked query: every
    lineitem row's (l_partkey, l_suppkey) is min-max scaled into
    [0, 2^8), bit-interleaved into a 16-bit Morton key by the SAME
    zorder_key kernel operators/layout.write_zorder_clustered writes
    files with, and the top 4 key bits (= 2 high bits per dimension)
    become the file bucket. The per-bucket output makes the layout
    win VISIBLE: each bucket's [pk_lo, pk_hi] × [sk_lo, sk_hi] box
    covers ~1/4 of EACH dimension's domain (a hyper-rectangle), where
    single-column range clustering leaves the second dimension
    spanning its whole domain — the reason a predicate on EITHER
    column prunes ~3/4 of z-ordered files. tests/test_layout.py
    verifies the write path's actual file-level pruning; this query
    pins the key math cross-engine.

    Scale shape: bounds are ONE tiny aggregate broadcast back (no
    driver collect in the query path), scaling + interleaving are
    map-side integer expressions inside whole-stage codegen, and the
    per-bucket aggregate groups 16 keys. At 100 TB the same pass
    feeds repartitionByRange(zkey) + sortWithinPartitions — one
    shuffle to a clustered layout."""
    from ..operators.layout import zorder_key

    j = _scaled_lineitem_keys(spark, sf_dir)
    zkey = zorder_key([F.col("p0"), F.col("p1")], bits=_ZORDER_BITS)
    return _layout_report(
        j.select(
            F.shiftright(zkey, 12).cast("long").alias("bucket"),
            "l_partkey",
            "l_suppkey",
        )
    )


_HILBERT_N = 1 << _ZORDER_BITS  # 256: same 8-bit grid as the z-order twin

# The same per-level fold hilbert_key unrolls, as a recursive CTE: state
# (x, y, d, s) per row, s halving 128 -> 1; the s = 0 rows are final.
# Both engines implement the identical walk (Wikipedia xy2d: quadrant
# digit d += s*s*((3*rx) XOR ry), then ry=0 swaps axes with rx=1 also
# reflecting through the full grid), so the key can never drift.
_HILBERT_SQL = f"""
    WITH RECURSIVE {_SCALED_KEYS_CTES},
    hwalk(l_partkey, l_suppkey, x, y, d, lvl) AS (
      SELECT l_partkey, l_suppkey, p0, p1, CAST(0 AS BIGINT),
             {_ZORDER_BITS - 1}
      FROM s
      UNION ALL
      SELECT l_partkey, l_suppkey,
             CASE WHEN ((y >> lvl) & 1) = 1 THEN x
                  WHEN ((x >> lvl) & 1) = 1 THEN {_HILBERT_N - 1} - y
                  ELSE y END,
             CASE WHEN ((y >> lvl) & 1) = 1 THEN y
                  WHEN ((x >> lvl) & 1) = 1 THEN {_HILBERT_N - 1} - x
                  ELSE x END,
             d + (CAST(1 AS BIGINT) << (2 * lvl))
               * xor(3 * ((x >> lvl) & 1), (y >> lvl) & 1),
             lvl - 1
      FROM hwalk WHERE lvl >= 0
    ),
    h AS (
      SELECT l_partkey, l_suppkey, d >> 12 AS bucket
      FROM hwalk WHERE lvl = -1
    )
    {_LAYOUT_REPORT_SQL}
    FROM h GROUP BY bucket ORDER BY bucket
    """


@query("q_hilbert_layout", category="layout", sql=_HILBERT_SQL)
def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT-curve clustering assignment — the locality-preserving
    refinement of q_zorder_layout (Iceberg rewrite_data_files' hilbert
    sort strategy): the same min-max scaling of (l_partkey, l_suppkey)
    into [0, 2^8), mapped to the Hilbert distance by
    operators/layout.with_hilbert_key (the per-level quadrant-digit +
    rotate/flip fold, staged through Generate barriers — see its
    docstring for the two rejected single-expression forms), top 4
    bits = file bucket. Where consecutive Morton keys take diagonal
    jumps at power-of-two boundaries (a file can own two far-apart
    rectangles), consecutive Hilbert distances are always
    grid-adjacent, so every bucket owns ONE compact region — tighter
    min/max boxes, better pruning on both dimensions. The oracle
    replays the identical walk as a recursive CTE over the levels, so
    the key math is pinned cross-engine; tests/test_layout.py pins the
    Spark expression against a pure-Python xy2d exhaustively and
    checks the adjacency property.

    Scale shape: identical to the z-order twin — one tiny broadcast
    bounds aggregate, map-side codegen integer stages (8 levels
    separated by 1:1 Generate barriers; measured 0.6 s vs the HOF
    fold's 5.5 s at sf0.1), 16-key group. At 100 TB the same key feeds
    repartitionByRange + sortWithinPartitions: one shuffle to the
    clustered layout."""
    from ..operators.layout import with_hilbert_key

    j = _scaled_lineitem_keys(spark, sf_dir)
    keyed = with_hilbert_key(
        j, "p0", "p1", bits=_ZORDER_BITS, keep=("l_partkey", "l_suppkey")
    )
    return _layout_report(
        keyed.select(
            F.shiftright(F.col("hkey"), 12).cast("long").alias("bucket"),
            "l_partkey",
            "l_suppkey",
        )
    )


# Batch timestamps straddle the o_orderdate domain (1995..2001) so the
# as-of consumer query has facts in every validity era.
_SCD2_T0 = "1995-01-01"
_SCD2_T1 = "1997-01-01"
_SCD2_T2 = "1999-01-01"

# The derived history as a closed-form CTE body — shared by the
# history query, its streaming twin, and the as-of consumer.
_SCD2_HIST_SELECT = f"""
    SELECT k AS c_custkey, seg AS c_mktsegment,
           TIMESTAMP '{_SCD2_T0} 00:00:00' AS valid_from,
           CASE WHEN k % 7 = 0 THEN TIMESTAMP '{_SCD2_T1} 00:00:00' END
             AS valid_to
    FROM c
    UNION ALL
    SELECT k, 'SEG_B1', TIMESTAMP '{_SCD2_T1} 00:00:00',
           CASE WHEN k % 14 = 0 THEN TIMESTAMP '{_SCD2_T2} 00:00:00' END
    FROM c WHERE k % 7 = 0
    UNION ALL
    SELECT k, seg, TIMESTAMP '{_SCD2_T2} 00:00:00',
           CAST(NULL AS TIMESTAMP)
    FROM c WHERE k % 14 = 0
    """

_SCD2_SQL = f"""
    WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer)
    {_SCD2_HIST_SELECT}
    """


@query("q_scd2_history", category="layout", sql=_SCD2_SQL)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history under the driver hash gate — the
    row-level versioning a warehouse runs where a transactional table
    format is unavailable (operators/scd2.py carries the single-writer
    contract; Delta/Iceberg MERGE is this exact rewrite with a commit
    protocol). Two deterministic update batches fold through
    scd2_merge over the customer dimension: batch 1 (_SCD2_T1) moves
    every c_custkey % 7 == 0 to segment SEG_B1; batch 2 (_SCD2_T2)
    re-delivers ALL % 7 keys but only the % 14 keys actually change
    (reverting to their original segment) — so the oracle's closed
    form pins every merge rule at once: open-on-new-attr,
    close-the-predecessor, AND the no-op on equal attributes
    (idempotent re-delivery must not churn rows). Validity intervals
    chain gap-free: [T0, T1) → [T1, T2) → [T2, NULL), with the stamps
    inside the o_orderdate domain so q_scd2_asof has facts in every
    era.

    Scale shape: each merge is one equi-join of the batch against
    CURRENT rows only on the business key plus a union of
    untouched/closed/opened — no windows, no per-key state; history
    rows are never rewritten (scd2.py module docstring carries the
    archival-partition guidance at 100 TB)."""
    return _scd2_history_frame(spark, sf_dir)


def _scd2_history_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE deterministic SCD2 history builder (seed + two merges)
    behind q_scd2_history and the q_scd2_asof consumer."""
    from ..operators.scd2 import VALID_FROM, VALID_TO, scd2_merge

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    hist = cust.withColumn(
        VALID_FROM, F.lit(_SCD2_T0).cast("timestamp_ntz")
    ).withColumn(VALID_TO, F.lit(None).cast("timestamp_ntz"))
    b1 = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_mktsegment", F.lit("SEG_B1")
    )
    hist = scd2_merge(hist, b1, ["c_custkey"], ["c_mktsegment"], F.lit(_SCD2_T1))
    b2 = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 14 == 0, F.col("c_mktsegment")).otherwise(
            F.lit("SEG_B1")
        ),
    )
    hist = scd2_merge(hist, b2, ["c_custkey"], ["c_mktsegment"], F.lit(_SCD2_T2))
    return hist.select("c_custkey", "c_mktsegment", VALID_FROM, VALID_TO)


_SCD2_ASOF_SQL = f"""
    WITH c AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
    hist AS ({_SCD2_HIST_SELECT}),
    cur AS (
      SELECT c_custkey, c_mktsegment AS cur_seg FROM hist
      WHERE valid_to IS NULL
    )
    SELECT h.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN h.c_mktsegment <> cu.cur_seg
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_retro
    FROM orders o
    JOIN hist h ON h.c_custkey = o.o_custkey
               AND h.valid_from <= o.o_orderdate
               AND (h.valid_to IS NULL OR h.valid_to > o.o_orderdate)
    JOIN cur cu ON cu.c_custkey = o.o_custkey
    GROUP BY h.c_mktsegment
    """


@query("q_scd2_asof", category="layout", sql=_SCD2_ASOF_SQL)
def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONSUMING side of SCD2 — the reason the history exists:
    every order joins the customer dimension AS OF its own event time
    (half-open [valid_from, valid_to) interval containment on the
    business key), so a fact is attributed to the segment that was
    TRUE when it happened, not today's. The report counts orders per
    as-of segment and, per segment, how many land on a HISTORICAL
    attribution (as-of ≠ current segment) — exactly the rows a
    current-slice-only join would silently misattribute; nonzero
    n_retro is the whole point of keeping Type-2 history. The oracle
    derives the identical history closed-form (the shared
    _SCD2_HIST_SELECT) and replays the interval join.

    Scale shape: the history is dimension-sized and rides a broadcast
    (each fact matches EXACTLY one interval per key, so no row
    explosion); at 100 TB with a dimension too big to broadcast the
    same join shuffle-sorts on the business key, and the as-of
    operator family (operators/asof.py) carries the union+window
    alternative that avoids the join entirely."""
    from pyspark.sql.functions import broadcast as _bcast

    from ..operators.scd2 import VALID_FROM, VALID_TO, scd2_current

    hist = _scd2_history_frame(spark, sf_dir)
    cur = scd2_current(hist).select(
        "c_custkey", F.col("c_mktsegment").alias("cur_seg")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp_ntz").alias("ts")
    )
    j = orders.join(
        _bcast(hist),
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col(VALID_FROM) <= F.col("ts"))
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > F.col("ts"))),
    ).join(_bcast(cur), "c_custkey")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.when(F.col("c_mktsegment") != F.col("cur_seg"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_retro"),
    )
