"""Join queries: every join shape the contract declares (SURVEY.md §2b).

The reference has no dataset-to-dataset joins (its only join-like ops are
the stopword anti-join T4 and the model lookup M4); these are the EXT
surface, designed for 100 TB:

- small dims (region/nation/supplier) are explicitly broadcast — no
  shuffle of the big side, ever;
- big-big joins (orders⋈customer, lineitem⋈orders) shuffle on the join
  key and let AQE pick SMJ vs shuffled-hash and split skewed partitions;
- the star query broadcasts the whole dimension arm into a single
  pass over lineitem;
- the range join keeps the small side broadcast so the theta predicate
  runs as BroadcastNestedLoop over 100-row × N — never N×N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..tables import load
from . import query


@query(
    "q_join_inner",
    category="join",
    bench=True,
    sql="""
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_totalprice,
           c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer. Both sides large at scale →
    shuffle on custkey; AQE converts to shuffled-hash / splits skew."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "c_name",
        "c_mktsegment",
    )


@query(
    "q_join_broadcast",
    category="join",
    sql="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast join of the two tiny dims — zero shuffle."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "q_join_left",
    category="join",
    sql="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (COUNT of a
    nullable column skips nulls on both engines)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "q_join_semi",
    category="join",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having ≥1 order — EXISTS without
    materializing the right side's columns."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    category="join",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no order since 2000 — the
    reference's stopword anti-join (T4, 00_training_pipeline.py:87) made
    relational. (The date filter keeps the result non-empty at every
    scale factor; an unfiltered anti join is empty on this data.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_star",
    category="join",
    bench=True,
    sql="""
    SELECT r.r_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema revenue per region (north-star query).

    100 TB shape: nation+region broadcast (always tiny); lineitem⋈orders
    shuffles on orderkey; orders⋈customer on custkey. Catalyst reorders
    the dimension arm; final agg on 5 regions is free."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q_join_range",
    category="join",
    sql="""
    SELECT s.s_suppkey, COUNT(*) AS n_close_customers
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 100 AND s.s_acctbal + 100
    GROUP BY s.s_suppkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: customers whose balance is within
    ±100 of each supplier's. The supplier side is broadcast, so this is
    BroadcastNestedLoop over |supplier| × |customer| with a tiny left
    side — the only sane physical shape for a pure theta join at scale
    (a banded equi-key prejoin would be the next step if both sides were
    huge)."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    cond = (c.c_acctbal >= s.s_acctbal - 100) & (c.c_acctbal <= s.s_acctbal + 100)
    return (
        c.join(broadcast(s), cond, "inner")
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_close_customers"))
    )


@query(
    "q_join_asof",
    category="join",
    bench=True,
    sql="""
    WITH u AS (
      SELECT o_custkey AS k, o_orderdate AS t, 1 AS is_order,
             o_orderkey, o_totalprice, CAST(NULL AS BIGINT) AS event_id
      FROM orders
      UNION ALL
      SELECT user_id, ts, 0, NULL, NULL, event_id FROM events
    ), w AS (
      SELECT *,
             last_value(o_orderkey IGNORE NULLS) OVER win AS asof_orderkey,
             last_value(o_totalprice IGNORE NULLS) OVER win AS asof_totalprice
      FROM u
      WINDOW win AS (PARTITION BY k ORDER BY t, is_order DESC, o_orderkey
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, k AS user_id, asof_orderkey,
           ROUND(asof_totalprice, 2) AS asof_totalprice
    FROM w WHERE is_order = 0
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the latest order of the same
    customer with o_orderdate <= ts (ties on date broken by max
    o_orderkey; events before any order get NULL).

    Delegates to operators.asof.asof_join — the union-and-window shape
    (one shuffle on the key + per-partition sort, linear at 100 TB; the
    naive "max(t′) <= t per row" range join is quadratic per key). The
    operator's tie column is the first value column (o_orderkey), giving
    the same max-orderkey tie-break the oracle states."""
    from ..operators.asof import asof_join

    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        e, o, on="user_id", left_time="ts", right_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.round("o_totalprice", 2).alias("asof_totalprice"),
    )


@query(
    "q_join_fuzzy",
    category="join",
    bench=True,
    sql="""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_parts,
             split_part(p_name, ' ', 2) AS blk
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
    """,
)
def q_join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): near-identical part names
    paired by edit distance 1-3, candidate pairs bounded by a blocking
    key (the name's last token — the product noun), the classic
    record-linkage blocking+verify shape.

    100 TB design: resolve on the DISTINCT name vocabulary, not the row
    stream — one hash agg collapses the fact table to its name
    vocabulary (bounded by the entity space, not the data volume), the
    vocabulary self-joins on the blocking key (pair work Σ block², same
    bound family as the LSH band join), and ``F.levenshtein`` verifies
    candidates inside whole-stage codegen. The deduped side is tiny →
    broadcast, so the verify pass never shuffles. An unblocked fuzzy
    join is O(V²) on the vocabulary and does not exist at scale."""
    p = load(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("blk", F.split(F.col("p_name"), " ").getItem(1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a"), "blk"
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b"), "blk"
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(broadcast(b), "blk")
        .filter((F.col("name_a") < F.col("name_b")) & dist.between(1, 3))
        .select(
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_dist"),
            "n_parts_a",
            "n_parts_b",
        )
    )


@query(
    "q_join_nullsafe",
    category="join",
    sql="""
    WITH a AS (
      SELECT CASE WHEN c_nationkey = 13 THEN NULL ELSE c_nationkey END AS nk,
             COUNT(*) AS n_customers
      FROM customer GROUP BY 1
    ), b AS (
      SELECT CASE WHEN n_nationkey = 13 THEN NULL ELSE n_nationkey END AS nk,
             n_name
      FROM nation
    )
    SELECT a.nk, b.n_name, a.n_customers
    FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of dropping out — the semantics SQL
    inner joins silently lose. Physically identical to a plain equi-join
    (hashable key, broadcast/shuffle as usual); nation key 13 is
    NULLed on both sides to exercise the NULL-matches-NULL row."""
    nk_c = F.when(F.col("c_nationkey") == 13, F.lit(None)).otherwise(F.col("c_nationkey"))
    a = (
        load(spark, sf_dir, "customer")
        .groupBy(nk_c.alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    nk_n = F.when(F.col("n_nationkey") == 13, F.lit(None)).otherwise(F.col("n_nationkey"))
    b = load(spark, sf_dir, "nation").select(nk_n.alias("nk"), "n_name")
    return a.join(broadcast(b), a["nk"].eqNullSafe(b["nk"])).select(
        a["nk"].alias("nk"), "n_name", "n_customers"
    )


@query(
    "q_join_full",
    category="join",
    sql="""
    WITH a AS (
      SELECT o_custkey, COUNT(*) AS cnt_1995 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY o_custkey
    ),
    b AS (
      SELECT o_custkey, COUNT(*) AS cnt_1996 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey, cnt_1995, cnt_1996
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the year-over-year activity diff: customers
    who ordered only in 1995 (right side NULL), only in 1996 (left
    side NULL), or in both. Completes the outer-join family next to
    q_join_left; NULL count columns are the signal, not an accident.

    Scale shape: both inputs are already aggregates (one map-side
    combined count each), so the outer join runs key-to-key on frames
    ≤ |customers| — the year filters prune at the parquet row-group
    level before anything shuffles. Full outer cannot broadcast
    (either side may need to emit unmatched rows), so the shuffle on
    o_custkey is the floor for this semantics; AQE coalesces the
    post-agg partitions."""
    o = load(spark, sf_dir, "orders")

    def year_counts(year: int, key: str, out: str) -> DataFrame:
        # per-side key aliases: both arms derive from the same scan, so
        # unaliased keys trip Spark's ambiguous-self-join analyzer
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp_ntz"))
            )
            .groupBy(F.col("o_custkey").alias(key))
            .agg(F.count(F.lit(1)).alias(out))
        )

    a = year_counts(1995, "ck_a", "cnt_1995")
    b = year_counts(1996, "ck_b", "cnt_1996")
    return a.join(b, F.col("ck_a") == F.col("ck_b"), "full").select(
        F.coalesce(F.col("ck_a"), F.col("ck_b")).alias("custkey"),
        "cnt_1995",
        "cnt_1996",
    )
