"""Event-stream queries (batch form). The reference's daily-backfill
semantics (O4: RangeDailyBase --days-back 4, run_pipeline.sh:6-11) become
real time-window operators here; `streaming/` holds the Structured
Streaming twins, tested by batch-equivalence.

All use the ``events`` table through the tables.py nanos shim (ts arrives
as TIMESTAMP_NTZ in exact microseconds, matching DuckDB's read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..tables import load
from . import query


@query(
    "q_event_tumbling",
    category="events",
    bench=True,
    sql="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_event_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × event_type — the batch form of a
    streaming tumbling-window agg (and of the reference's per-day
    partitioned outputs, S7). One hash-agg shuffle on (hour, type)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "q_event_sliding",
    category="events",
    sql="""
    SELECT w_start, COUNT(*) AS n_events
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
    )
    GROUP BY w_start
    """,
)
def q_event_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide) via ``F.window`` — each
    event lands in exactly 2 windows. The oracle replicates membership
    with two shifted 30-min buckets unioned (window start = the bucket
    and the bucket minus one slide)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("w_start"), "n_events")
    )


@query(
    "q_event_session",
    category="events",
    bench=True,
    sql="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    ), per_sess AS (
      SELECT user_id, sess_id, COUNT(*) AS n_events,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS dur_sec
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           ROUND(AVG(dur_sec), 2) AS avg_session_sec
    FROM per_sess
    GROUP BY user_id
    """,
)
def q_event_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap, expressed as
    lag → new-session flag → running sum (the classic batch-SQL session
    window; the streaming twin uses F.session_window). One shuffle on
    user_id; windows sort within user partitions — the 100 TB shape."""
    e = load(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Gap compared in MICROseconds: casting to long would truncate
    # sub-second precision, mis-sessionizing gaps in (1800, 1801) s and
    # diverging from both the exact-interval oracle and the native
    # session_window twin (events.ts carries sub-second precision).
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(order_w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(order_w).cast("timestamp"))
                > 1_800_000_000
            ),
            1,
        ).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(run_w))
    per_sess = flagged.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp")))
            / F.lit(1_000_000.0)
        ).alias("dur_sec"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(F.avg("dur_sec"), 2).alias("avg_session_sec"),
    )


@query(
    "q_event_late",
    category="events",
    sql="""
    WITH mx AS (SELECT date_trunc('day', MAX(ts)) AS last_day FROM events)
    SELECT date_trunc('day', ts) AS day_start, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events, mx
    WHERE ts >= last_day - INTERVAL '3 days'
    GROUP BY 1
    """,
)
def q_event_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 4-calendar-day recomputation window — the reference's
    ``--days-back 4`` backfill (O4, run_pipeline.sh:8) as a query: only
    the trailing window is re-aggregated, idempotently. The scalar max
    is broadcast, so the filter prunes row groups before the agg."""
    e = load(spark, sf_dir, "events")
    last_day = e.agg(F.date_trunc("day", F.max("ts")).alias("last_day"))
    return (
        e.crossJoin(broadcast(last_day))
        .filter(F.col("ts") >= F.col("last_day") - F.expr("INTERVAL 3 DAYS"))
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "q_event_rollup",
    category="events",
    bench=True,
    sql="""
    SELECT date_trunc('day', ts) AS day_start,
           date_trunc('hour', ts) AS hour_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
    """,
)
def q_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass produces
    hourly buckets, daily super-aggregates, and the grand total
    (GROUP BY ROLLUP over two time_bucket granularities). At 100 TB this
    is the materialized-rollup pattern — partial aggregation is map-side
    per granularity, one shuffle; coarser tiers roll up from finer ones
    instead of re-scanning raw data."""
    e = load(spark, sf_dir, "events")
    return (
        e.rollup(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day_start"),
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "q_sketch_hll",
    category="events",
    bench=True,
    sql="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_rel_error
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_rel_error
    FROM events
    """,
)
def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog sketches (Apache DataSketches, built into
    Spark 3.5+): per-event_type user-count sketch via hll_sketch_agg,
    then a re-aggregable union across types via hll_union_agg — the
    100 TB cardinality pattern (sketches are small, associative, and
    partial-aggregate map-side; the union tier costs bytes-per-sketch,
    not rows; the '__all__' row's estimate comes from MERGED sketches,
    never a second scan).

    Verified the bounds-contract way (the q_agg_approx_distinct /
    q_cms_token_freq convention): the raw estimate is engine-specific
    so it cannot hash cross-engine, but the sketch guarantee can — the
    output carries the exact COUNT(DISTINCT) (per type AND global for
    the merged row) plus ``within_rel_error`` the oracle expects TRUE:
    |estimate − exact| ≤ 0.10·exact, generous headroom over the ~1.6%
    rsd of the default lgConfigK=12 sketch (tests/test_oracle.py still
    holds the estimates to 5%). Deterministic given fixed data."""
    from ..tables import compact_checkpoint

    e = load(spark, sf_dir, "events")
    # per_type feeds TWO consumers (the per-type output rows and the
    # merged '__all__' row) — without a materialization each consumer
    # re-executes the full events scan + count_distinct shuffle, i.e.
    # two corpus passes at 100 TB for a |event_types|-row frame of
    # ~1.5 KB sketches (guide §1.2 pass structure; the round-11
    # q_sketch_theta / tfidf lesson). The global exact count stays its
    # own pass by necessity: users overlap across types, so the global
    # COUNT(DISTINCT) cannot be derived from the per-type frame.
    per_type = compact_checkpoint(
        e.groupBy("event_type").agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.count_distinct("user_id").alias("exact_users"),
        )
    )
    merged = (
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
        )
        .join(F.broadcast(e.agg(F.count_distinct("user_id").alias("exact_users"))))
        .select(F.lit("__all__").alias("event_type"), "approx_users", "exact_users")
    )
    both = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "exact_users",
    ).unionByName(merged)
    return both.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.10 * F.col("exact_users")
        ).alias("within_rel_error"),
    )


#: the q_sketch_cube serving window — days [Jan 8, Jan 15) of the
#: fixed 30-day event range
CUBE_WINDOW_LO = "2024-01-08 00:00:00"
CUBE_WINDOW_HI = "2024-01-15 00:00:00"


@query(
    "q_sketch_cube",
    category="events",
    sql=f"""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users_7d,
           TRUE AS within_rel_error
    FROM events
    WHERE ts >= TIMESTAMP '{CUBE_WINDOW_LO}'
      AND ts <  TIMESTAMP '{CUBE_WINDOW_HI}'
    GROUP BY event_type
    """,
)
def q_sketch_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKETCH CUBE — the distinct-count dashboard pattern: build
    HLL sketches once at a fine grain (event_type × day), then answer
    any date-range distinct-users question by MERGING the covered daily
    sketches, never re-scanning events. q_sketch_hll proves the
    sketches merge across the type dimension; this proves the
    production serving shape — re-aggregation along a DIFFERENT axis
    (time) than a query would group by, the 'continuous aggregate'
    q_event_rollup builds for sums applied to the one aggregate sums
    cannot answer (distinct users are not additive across days: the
    same user appears on many days, so a per-day exact count cube
    OVERCOUNTS any range; only a mergeable sketch cube serves ranges).

    Verified the bounds-contract way: the 7-day window's estimate from
    merged daily sketches must sit within 10% of the exact
    COUNT(DISTINCT) the oracle recomputes (HLL union is state-lossless
    at equal lgConfigK, so merged accuracy equals single-sketch
    accuracy — measured ≤ 2% here; deterministic given fixed data).

    Scale shape: the cube build is ONE map-side-combinable aggregate
    (types × 30 days rows of ~1.5 KB sketches); serving reads the cube
    frame only — at 100 TB the cube persists as a tiny table and every
    dashboard range-query costs O(days·types) sketch merges, zero
    event scans. The exact column is the sf-level verification
    baseline, same split as q_sketch_theta."""
    e = load(spark, sf_dir, "events")
    lo = F.lit(CUBE_WINDOW_LO).cast("timestamp_ntz")
    hi = F.lit(CUBE_WINDOW_HI).cast("timestamp_ntz")
    cube = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    served = (
        cube.filter((F.col("day") >= lo) & (F.col("day") < hi))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx"))
    )
    exact = (
        e.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users_7d"))
    )
    return served.join(exact, "event_type").select(
        "event_type",
        "exact_users_7d",
        (
            F.abs(F.col("approx") - F.col("exact_users_7d"))
            <= 0.10 * F.col("exact_users_7d")
        ).alias("within_rel_error"),
    )


@query(
    "q_event_session_native",
    category="events",
    sql="""
    WITH ordered AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def q_event_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native dynamic-gap session windows (``F.session_window`` in
    batch): events within 30 min of each other merge into one session
    whose end = last event + gap. Semantically identical to the
    lag+cumsum formulation (q_event_session) — the oracle derives the
    same boundaries relationally — but executes as a single
    session-merging aggregation, the exact operator the streaming twin
    uses, so batch and streaming share session semantics by
    construction."""
    e = load(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        e.groupBy("user_id", sw.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


_FUNNEL_WINDOW = "1 day"  # max gap allowed between consecutive stages


@query(
    "q_event_funnel",
    category="events",
    bench=True,
    sql=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
        AND e.ts >= v.t1 AND e.ts < v.t1 + INTERVAL '{_FUNNEL_WINDOW}'
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
        AND e.ts >= c.t2 AND e.ts < c.t2 + INTERVAL '{_FUNNEL_WINDOW}'
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL SELECT '2_click', COUNT(*) FROM c
    UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    converts a stage only with an event of the right type AFTER their
    previous stage's timestamp and within the stage window (1 day) —
    the sequential-constraint analytics every event warehouse runs.

    Scale shape: one events scan per stage (the survivor frames v and c
    are materialized — see the inline comment), each stage one filtered
    min-agg plus an equi-join on ``user_id`` with the range condition as
    a join residual. The checkpointed survivor frames drop their hash
    partitioning (UnknownPartitioning), so each stage join re-exchanges
    the |survivors|-row side — an O(|survivors|) shuffle per stage,
    events ≫ survivors at every scale. No broadcast dependence (works
    when the stage-1 survivor set is itself huge), no windows over the
    full event stream, no per-user state."""
    from ..tables import compact_checkpoint

    e = load(spark, sf_dir, "events")
    day = F.expr(f"INTERVAL {_FUNNEL_WINDOW}")
    # v and c each feed TWO consumers (their stage-count row and the
    # next stage's join); without a materialization the v subtree
    # (events scan + filter + user_id shuffle + min-agg) re-executes
    # THREE times (under v, c, p) and c's twice — six event-scan passes
    # instead of three at 100 TB (guide §1.2 pass structure; the
    # round-11 curation-chain lesson). The checkpoint trades the reused
    # co-partitioning for one O(|survivors|)-row exchange per join —
    # events ≫ survivors, so the trade wins as the corpus grows. Cost
    # honesty: the survivor frames are O(|users|) rows held via
    # localCheckpoint in executor-local (non-reliable) storage with
    # lineage truncated — storage scales with the user population, and
    # at cluster scale an executor loss is unrecoverable mid-query;
    # a production deployment would gate this to a reliable persist
    # (the compact_checkpoint caller's documented trade-off).
    v = compact_checkpoint(
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = compact_checkpoint(
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") < F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") < F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return stage(v, "1_view").unionByName(stage(c, "2_click")).unionByName(
        stage(p, "3_purchase")
    )


@query(
    "q_event_retention",
    category="events",
    sql="""
    WITH first AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cohort, d) AS BIGINT) AS offset_days,
           COUNT(*) AS n_users
    FROM act JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later day they were active — the (cohort × day-offset)
    triangle behind every retention curve.

    Scale shape: first-seen is one min-agg on user_id; activity is one
    distinct on (user, day) — both shuffle on user_id and the join that
    follows is co-partitioned on the same key. The output is
    |cohorts| × |offsets| (days², tiny) however large the event stream,
    so the plan has no large intermediate after the two aggs. No
    windows, no per-user state, no skew sensitivity beyond what AQE's
    skew-join split already handles for a power-law user."""
    e = load(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort")
    )
    act = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort").cast("long").alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q_event_anomaly",
    category="events",
    sql="""
    WITH s AS (
      -- guard degenerate types: a single-event type has sd NULL (and a
      -- constant type sd = 0); Spark's stddev_samp returns NaN for the
      -- former and NaN > 3 is TRUE under its NaN-is-largest ordering,
      -- so without the filter the engines diverge and constant streams
      -- flag 100 % anomalies.
      SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY event_type
      HAVING STDDEV_SAMP(value) IS NOT NULL AND STDDEV_SAMP(value) > 0
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE ABS((e.value - s.m) / s.sd) > 3) AS n_anomalies,
           ROUND(MAX(ABS((e.value - s.m) / s.sd)), 2) AS max_abs_z
    FROM events e JOIN s USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly screening per event type: flag values more than
    3 sample standard deviations from their type's mean — the cheap
    first-pass outlier detector monitoring pipelines run on every
    metric stream.

    Two narrow aggregates instead of a window: per-type stats collapse
    to |types| rows (map-side combined), broadcast back onto the
    stream, and the flag is a map-side expression into the final
    per-type count — so the full event table is never shuffled, at any
    scale. A per-type stddev window would shuffle every event row on
    event_type AND hold whole types in single partitions (skew); the
    broadcast-stats join has neither problem."""
    e = load(spark, sf_dir, "events")
    # sd NULL (single event) → NaN z-scores, and Spark orders NaN above
    # every number so NaN > 3 flags the row; sd = 0 (constant type)
    # flags 100 % of a perfectly healthy stream. Degenerate types carry
    # no screening signal — drop them (mirrored in the oracle HAVING).
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    ).filter(
        # NOT isnan first: Spark's NaN also satisfies sd > 0 (NaN sorts
        # above every number), so the range check alone would keep it.
        F.col("sd").isNotNull() & ~F.isnan("sd") & (F.col("sd") > 0)
    )
    z = F.abs((F.col("value") - F.col("m")) / F.col("sd"))
    return (
        e.join(broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(z > 3).alias("n_anomalies"),
            F.round(F.max(z), 2).alias("max_abs_z"),
        )
    )


@query(
    "q_event_resample",
    category="events",
    sql="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT s.hour_start, t.event_type,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM spine s CROSS JOIN types t
    LEFT JOIN counts c ON c.hour_start = s.hour_start AND c.event_type = t.event_type
    """,
)
def q_event_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling resample: a dense (hour × event_type) grid with
    zero-filled counts for silent hours — the calendar-spine join every
    time-series chart and forecasting feature pipeline needs (absence
    of events is signal; a plain groupBy silently drops empty buckets).

    Scale shape: the spine is generated, not scanned — hours in range ×
    event types, bounded however large the stream is — and built from a
    one-row min/max aggregate. The observed counts collapse map-side to
    |buckets| rows before their shuffle; the spine side then left-joins
    counts on (hour, type). Nothing here is proportional to raw event
    rows except the initial aggregates."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    types = e.select("event_type").distinct()
    counts = e.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.crossJoin(broadcast(types))
        .join(counts, ["hour_start", "event_type"], "left")
        .select(
            "hour_start",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


@query(
    "q_event_interpolate",
    category="events",
    sql="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    hourly AS (
      -- FLOOR(x*100 + 0.5)/100, not ROUND: Spark rounds doubles via
      -- their decimal string (HALF_UP), DuckDB rounds the binary value;
      -- at a .xx5 tie they disagree. The floor form is the same IEEE
      -- op sequence on both engines.
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
             FLOOR(AVG(value) * 100 + 0.5) / 100.0 AS avg_value
      FROM events GROUP BY 1, 2
    )
    SELECT hour_start, event_type, observed, filled_value
    FROM (
      SELECT s.hour_start, t.event_type,
             h.avg_value IS NOT NULL AS observed,
             last_value(h.avg_value IGNORE NULLS) OVER (
               PARTITION BY t.event_type ORDER BY s.hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS filled_value
      FROM spine s CROSS JOIN types t
      LEFT JOIN hourly h ON h.hour_start = s.hour_start AND h.event_type = t.event_type
    )
    """,
)
def q_event_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill interpolation (LOCF — last observation carried
    forward): hourly average ``value`` per event_type over the dense
    calendar spine, with silent hours inheriting the most recent
    observed hour's average. The companion of q_event_resample for
    continuous metrics, where a gap means "unchanged", not "zero"
    (sensor readings, prices, gauge metrics).

    Scale shape: raw events collapse map-side to one row per (hour,
    type) bucket before any shuffle, the generated spine left-joins
    those buckets, and the fill is ``last(ignorenulls)`` over an
    unbounded-preceding window PARTITIONED BY event_type — partition
    size is hours-in-range (spine rows), never raw events, so the
    single-partition-per-type sort is bounded regardless of stream
    volume. Hours before a type's first observation stay NULL on both
    engines. Grounding: extension of O4's gap semantics
    (run_pipeline.sh:6-11 re-examines silent days)."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_start")
    )
    types = e.select("event_type").distinct()
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start"),
        "event_type",
    ).agg(
        # floor(x*100+0.5)/100, not round(): see the oracle SQL comment.
        (F.floor(F.avg("value") * 100 + F.lit(0.5)) / F.lit(100.0)).alias("avg_value")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.crossJoin(broadcast(types))
        .join(hourly, ["hour_start", "event_type"], "left")
        .select(
            "hour_start",
            "event_type",
            F.col("avg_value").isNotNull().alias("observed"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@query(
    "q_event_transitions",
    category="events",
    bench=True,
    sql="""
    WITH t AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS from_type
      FROM events
    ),
    g AS (
      SELECT from_type, event_type AS to_type, COUNT(*) AS n_trans
      FROM t WHERE from_type IS NOT NULL
      GROUP BY from_type, event_type
    )
    SELECT from_type, to_type, n_trans,
           CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS n_from
    FROM g
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event streams: for every
    (from_type, to_type) pair, how many times a user's event of
    from_type was immediately followed by to_type (ordered by event
    time, ties broken by event_id), plus the from-state row total — the
    session-flow / next-action model behind product analytics and
    behavioral anomaly scoring. Counts are emitted as exact integers;
    the transition probability n_trans/n_from is left to the consumer
    (a rounded double can tie differently across engines — the
    FLOOR-trick lesson from the verify notes applied by NOT rounding).

    Scale shape: the lag window shuffles once on user_id (per-user
    partitions, bounded by a user's event count); the (from, to) agg is
    map-side-combined onto at most |types|² rows, and the row-total
    window runs on that constant-size frame. Nothing downstream of the
    first shuffle scales with event volume."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select("user_id", "event_type", F.lag("event_type").over(w).alias("from_type"))
    g = (
        t.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    w2 = Window.partitionBy("from_type")
    return g.withColumn("n_from", F.sum("n_trans").over(w2))


@query(
    "q_user_journey",
    category="events",
    sql="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o
    ),
    r AS (
      SELECT user_id, sess_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, sess_id
                                ORDER BY ts, event_id) AS rn
      FROM s
    ),
    p AS (
      SELECT user_id, sess_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id, sess_id
    ),
    c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path)
    SELECT path, n_sessions,
           CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rnk
    FROM c ORDER BY n_sessions DESC, path LIMIT 10
    """,
)
def q_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening journeys: the 10 most common first-3-event
    paths across 30-minute-gap sessions (same gap rule as
    q_event_session, microsecond-exact) — the "how do users start a
    session" view that complements the funnel (fixed stage order) and
    the transition matrix (memoryless single steps) with actual ordered
    prefixes. Ties in frequency rank alphabetically so both engines
    agree on the cutoff.

    Scale shape: ONE shuffle of raw events onto user_id drives the
    session flag, session id, and within-session rank — all three
    windows share the same partitioning and sort, so Catalyst plans a
    single exchange + sort. The per-session path agg re-shuffles on
    (user, session) but rows are already one-per-event trimmed to
    rn<=3; path frequencies collapse to at most |types|³ rows, and the
    final top-10 window runs on that constant-size frame."""
    e = load(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(order_w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(order_w).cast("timestamp"))
                > 1_800_000_000
            ),
            1,
        ).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(run_w))
    rn_w = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    r = flagged.withColumn("rn", F.row_number().over(rn_w)).filter(F.col("rn") <= 3)
    p = r.groupBy("user_id", "sess_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    c = p.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    top_w = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        c.withColumn("rnk", F.row_number().over(top_w).cast("long"))
        .filter(F.col("rnk") <= 10)
    )


@query(
    "q_join_interval",
    category="events",
    sql="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END
               AS new_sess
      FROM ordered
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    ), iv AS (
      SELECT user_id, sess_id,
             epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT a.user_id AS user_a, CAST(a.sess_id AS BIGINT) AS sess_a,
           b.user_id AS user_b, CAST(b.sess_id AS BIGINT) AS sess_b,
           CAST(LEAST(a.mx, b.mx) - GREATEST(a.mn, b.mn) AS BIGINT)
             AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.mn <= b.mx AND b.mn <= a.mx
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join — the range-join class the equi-join
    family can't express: which session intervals of DIFFERENT users
    overlap in time (co-presence analysis; the same shape answers
    genomic range joins and temporal conflict detection). Intervals
    are the 30-minute-gap sessions of q_event_session, so the two
    queries share one sessionization definition.

    Scale shape — the interval-BUCKETING trick instead of an unbounded
    theta join: each interval explodes into the hour buckets it spans
    (short sessions → 1-2 buckets), candidates equi-join on the bucket
    id, the TRUE overlap predicate filters inside the bucket, and
    DISTINCT collapses pairs that share several buckets. Work is
    Σ per-bucket concurrency², bounded by simultaneous-user counts —
    never |intervals|²; at 100 TB the bucket width tunes against
    interval length exactly like the shingle/sign-bucket blockings
    elsewhere in this engine. The overlap length is integer micros, so
    nothing floating crosses the oracle."""
    e = load(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(order_w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(order_w).cast("timestamp"))
                > 1_800_000_000
            ),
            1,
        ).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(run_w))
    iv = flagged.groupBy("user_id", "sess_id").agg(
        F.unix_micros(F.min("ts").cast("timestamp")).alias("mn"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("mx"),
    )
    hour = 3_600_000_000
    buckets = F.sequence(
        (F.col("mn") / hour).cast("long"), (F.col("mx") / hour).cast("long")
    )
    ebv = iv.select(
        "user_id", "sess_id", "mn", "mx", F.explode(buckets).alias("hb")
    ).localCheckpoint(eager=True)  # both join sides read one materialization
    a = ebv.select(
        F.col("user_id").alias("user_a"), F.col("sess_id").alias("sess_a"),
        F.col("mn").alias("mna"), F.col("mx").alias("mxa"), "hb",
    )
    b = ebv.select(
        F.col("user_id").alias("user_b"), F.col("sess_id").alias("sess_b"),
        F.col("mn").alias("mnb"), F.col("mx").alias("mxb"), "hb",
    ).hint("shuffle_hash")
    pairs = (
        a.join(b, "hb")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("mna") <= F.col("mxb"))
            & (F.col("mnb") <= F.col("mxa"))
        )
        .select(
            "user_a",
            F.col("sess_a").cast("long").alias("sess_a"),
            "user_b",
            F.col("sess_b").cast("long").alias("sess_b"),
            (
                F.least("mxa", "mxb") - F.greatest("mna", "mnb")
            ).cast("long").alias("overlap_us"),
        )
        .distinct()
    )
    return pairs
