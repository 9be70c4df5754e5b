"""Scalar-function queries: string / date / math / json / array surface,
plus the reference's tokenize→stopword chain made relational.

Everything here is built-in ``pyspark.sql.functions`` — JVM-side inside
WholeStageCodegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokens_expr
from ..tables import load
from . import query


@query(
    "q_string_funcs",
    category="scalar-string",
    sql="""
    SELECT p_partkey,
           LOWER(p_name)                 AS name_lower,
           LENGTH(p_name)                AS name_len,
           SUBSTRING(p_type, 1, 7)       AS type_prefix,
           CONCAT_WS('-', p_brand, p_type) AS brand_type
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/length/substr/concat_ws (reference T1/T3 made relational)."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 7).alias("type_prefix"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
    )


# DuckDB-side tokenizer identical to functions.text.tokens_expr:
# lowercase, split on non-word runs, drop empties.
_DUCK_TOKENS = "list_filter(regexp_split_to_array(lower(text), '\\W+'), t -> t <> '')"


@query(
    "q_tokenize_explode",
    category="scalar-string",
    sql=f"""
    SELECT t.token, COUNT(*) AS freq
    FROM documents, UNNEST({_DUCK_TOKENS}) AS t(token)
    GROUP BY t.token
    """,
)
def q_tokenize_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenize + explode + frequency count (reference T2,
    00_training_pipeline.py:85, made relational). At scale: explode
    happens map-side; only (token, partial count) pairs shuffle."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q_stopword_filter",
    category="scalar-string",
    sql=f"""
    SELECT t.token, COUNT(*) AS freq
    FROM documents, UNNEST({_DUCK_TOKENS}) AS t(token)
    WHERE t.token NOT IN ({_STOP_SQL})
    GROUP BY t.token
    """,
)
def q_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequencies after stopword removal via array_except — the
    reference's NLTK stopword filter (T4, 00_training_pipeline.py:87)
    expressed as a broadcast array op (no join needed for a ~40-word
    list)."""
    d = load(spark, sf_dir, "documents")
    # NB: array_except would dedup within a doc and break frequencies;
    # F.filter keeps multiplicity.
    toks = F.filter(tokens_expr(F.col("text")), lambda t: ~t.isin(list(STOPWORDS)))
    return (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


@query(
    "q_date_funcs",
    category="scalar-date",
    sql="""
    SELECT CAST(YEAR(o_orderdate) AS INT)  AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month bucketing — the reference's per-day path partitioning
    (S7/O4) made a first-class date dimension."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_math_funcs",
    category="scalar-math",
    sql="""
    SELECT p_partkey,
           ROUND(p_retailprice, 1)                    AS price_round,
           ROUND(ABS(p_retailprice - 1000), 2)        AS price_abs_dev,
           CAST(FLOOR(p_retailprice) AS BIGINT)       AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT)        AS price_ceil
    FROM part
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil on prices."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_round"),
        F.round(F.abs(F.col("p_retailprice") - 1000), 2).alias("price_abs_dev"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
    )


@query(
    "q_json_extract",
    category="scalar-json",
    sql="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the semi-structured ``props`` column
    (the multimodal-metadata pattern: typed columns + an opaque payload)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(F.get_json_object("props", "$.k").cast("int")), 2).alias("avg_k"),
        )
    )


@query(
    "q_array_funcs",
    category="scalar-array",
    sql=f"""
    SELECT doc_id,
           CAST(len({_DUCK_TOKENS}) AS INT)                          AS n_tokens,
           list_contains({_DUCK_TOKENS}, 'data')                     AS has_data,
           array_to_string(list_slice({_DUCK_TOKENS}, 1, 3), ' ')    AS first3
    FROM documents
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / array_contains / slice / array_join over tokenized text
    (reference T2/T6 array handling)."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
    )


@query(
    "q_json_schema",
    category="scalar-json",
    sql="""
    SELECT event_type,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           CAST(COUNT(*) - COUNT(k) AS BIGINT) AS n_unparsed
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events)
    GROUP BY event_type
    """,
)
def q_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd JSON parse (``from_json`` into a typed struct) — the
    strict sibling of q_json_extract's per-path extraction: one parse
    per row yields every field typed, malformed rows become NULL structs
    (counted here), and downstream code reads struct fields instead of
    re-parsing. The 100 TB rule: parse once, project many."""
    e = load(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "struct<k:int>"))
    return parsed.groupBy("event_type").agg(
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
        (F.count(F.lit(1)) - F.count("p.k")).cast("long").alias("n_unparsed"),
    )


@query(
    "q_map_funcs",
    category="scalar-map",
    sql="""
    WITH tok AS (
      SELECT doc_id, t AS token
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\W+'),
                               x -> x <> '') AS ts
            FROM documents WHERE lang = 'en'),
           UNNEST(ts) AS u(t)
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS cnt
      FROM tok GROUP BY doc_id, token
    ),
    flagged AS (
      -- the 'the' probe sees the FULL map (any count), matching the
      -- Spark side where map_contains_key runs before map_filter
      SELECT doc_id, token, cnt,
             BOOL_OR(token = 'the') OVER (PARTITION BY doc_id) AS doc_has_the
      FROM tf
    )
    SELECT doc_id, token, cnt, doc_has_the
    FROM flagged
    WHERE cnt >= 2
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per-doc term-frequency MAPs built with
    ``map_from_entries``, pruned map-side with the ``map_filter`` HOF
    (keep tokens appearing ≥2×), probed with ``map_contains_key``, and
    exploded back to rows. The oracle computes identical rows with
    plain SQL (DuckDB 1.0's MAP surface lacks the HOFs), proving the
    map pipeline is a faithful relational transform, not an opaque
    blob. Plan shape: the map construction rides the per-doc groupBy's
    single shuffle; ``map_filter``/``explode`` are map-side JVM
    expressions (no Python) — at 100 TB the map column is a per-doc
    K-V payload that never shuffles after construction."""
    d = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    tf = (
        d.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = tf.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("token", "cnt"))).alias("m")
    )
    pruned = per_doc.select(
        "doc_id",
        F.map_filter("m", lambda k, v: v >= F.lit(2)).alias("m"),
        F.map_contains_key(F.col("m"), "the").alias("doc_has_the"),
    )
    return (
        pruned.select("doc_id", "doc_has_the", F.explode("m").alias("token", "cnt"))
        .filter(F.col("cnt").isNotNull())
        .select("doc_id", "token", F.col("cnt").cast("long").alias("cnt"), "doc_has_the")
    )


@query(
    "q_try_funcs",
    category="scalar-try",
    sql="""
    WITH t AS (
      SELECT event_type, value,
             TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             props IS NOT NULL AS has_props,
             list_extract(string_split(event_type, 'u'), 2) AS frag
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN has_props AND k IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_parse_fail,
           ROUND(AVG(value / NULLIF(k % 7 - 3, 0)), 4) AS avg_ratio,
           CAST(COUNT(frag) AS BIGINT) AS n_frag
    FROM t GROUP BY event_type
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: ``try_cast`` (malformed input →
    NULL instead of a failed job), ``try_divide`` (zero denominator →
    NULL), ``try_element_at`` (out-of-bounds index → NULL). At 100 TB
    this is the difference between a report column going NULL for the
    0.001 % of malformed rows and a 6-hour job dying at hour 5 on the
    first bad record (ANSI mode's behavior). The oracle expresses the
    identical semantics in DuckDB's vocabulary — TRY_CAST, NULLIF-
    guarded division, and list_extract's native NULL-on-OOB — so the
    NULL propagation of every branch is hash-checked, not assumed.
    All map-side JVM expressions + one partial-aggregated groupBy."""
    e = load(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS int)")
    t = e.select(
        "event_type",
        "value",
        k.alias("k"),
        F.col("props").isNotNull().alias("has_props"),
        F.try_element_at(F.split("event_type", "u"), F.lit(2)).alias("frag"),
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("has_props") & F.col("k").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_parse_fail"),
        F.round(F.avg(F.try_divide(F.col("value"), F.col("k") % 7 - 3)), 4).alias(
            "avg_ratio"
        ),
        F.count("frag").cast("long").alias("n_frag"),
    )
