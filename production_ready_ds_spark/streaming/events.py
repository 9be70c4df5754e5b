"""Streaming event operators.

All operators take an unbounded DataFrame (from :func:`stream_events`
or any source with the same schema) and return a transformed streaming
DataFrame; sinks are the caller's choice. At scale these run unchanged:
state store size is bounded by the watermark horizon, and every
aggregation is keyed so state shards across executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import _ensure_nanos_conf

#: watermark mirroring the reference's --days-back 4 late-data budget
#: (run_pipeline.sh:8): events older than 4 days past the max seen
#: event-time no longer update state.
DEFAULT_WATERMARK = "4 days"

# ts is requested as TIMESTAMP: Spark 4.1 reads the testdata's INT64
# TIMESTAMP(NANOS) physical type directly into a micros timestamp when
# the requested type is a timestamp. Do NOT request `ts bigint` here —
# that path hands back MICROS-as-long (not raw nanos, despite
# nanosAsLong=true), so a `ts div 1000` shim on top divides twice and
# compresses the whole time axis 1000× (30 days → 43 min), silently
# voiding every event-time bound. Caught by the q_stream_join oracle:
# the 1-hour attribution window suddenly spanned the full dataset.
_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _as_stream_dir(path: str) -> str:
    """The file-stream source requires a DIRECTORY to monitor. The
    testdata stores each table as a single parquet file, so stage a
    stable symlink directory next to the OS tmpdir (a real deployment
    streams an appended directory or Kafka and never hits this)."""
    if os.path.isdir(path):
        return path
    import hashlib
    import tempfile

    digest = hashlib.md5(path.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"spark-graft-stream-{digest}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, os.path.basename(path))
    if not os.path.exists(link):
        os.symlink(path, link)
    return stage


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the events parquet (each file = one
    micro-batch under availableNow; on a cluster this is a directory
    being appended to, or a Kafka source with the same projection).

    ``ts`` arrives as a micros TIMESTAMP via the requested-schema read
    (see _EVENTS_SCHEMA note); TIMESTAMP (not NTZ) because watermarks
    require the LTZ event-time type. The session runs UTC and the
    window operators cast their output bounds to NTZ, so results line
    up with the batch twins."""
    _ensure_nanos_conf(spark)
    return (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .format("parquet")
        .load(_as_stream_dir(os.path.join(sf_dir, "events.parquet")))
    )


def tumbling_counts(stream: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Tumbling 1-hour windows × event_type (streaming twin of
    q_event_tumbling)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(stream: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """1-hour windows sliding every 30 minutes (twin of q_event_sliding)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("w_start"), "n_events")
    )


def session_counts(stream: DataFrame, gap: str = "30 minutes",
                   watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Per-user session windows with an inactivity gap —
    ``F.session_window`` is the native streaming form of the batch
    lag/cumulative-sum sessionization in q_event_session."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("sess_start"),
            F.col("w.end").cast("timestamp_ntz").alias("sess_end"),
            "n_events",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Exactly-once event ids within the watermark horizon
    (``dropDuplicates`` with bounded state — the streaming form of the
    exact-dedup operator)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    cumulative event count + value total, carried across micro-batches
    in the state store (the arbitrary-stateful-processing surface — what
    you reach for when watermarked windows can't express the logic).

    State is one (count, total) pair per user — O(distinct users)
    across the cluster, sharded by the group key. Each batch emits the
    user's updated running totals (update output mode)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_totals(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_totals,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_v2(stream: DataFrame) -> DataFrame:
    """State-v2 form of :func:`running_user_totals` via
    ``transformWithStateInPandas`` (Spark 4 arbitrary stateful
    processing): a :class:`StatefulProcessor` with an explicitly
    declared typed ValueState variable instead of the implicit v1 state
    tuple. The v2 surface is what new custom stateful operators should
    target — it adds named state variables, state TTL, timers, and
    schema evolution; same O(distinct users) sharded state footprint.

    Requires the RocksDB state store provider (set by the caller or
    test; the HDFS-backed default does not support v2 state) and the
    ``google.protobuf`` package (Spark's v2 state protocol serializes
    handle messages with protobuf; tests skip where it is absent)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            stored = self._totals.get()
            n, total = stored if stored is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )


def foreach_batch_daily_sink(out_root: str):
    """foreachBatch sink writing each micro-batch as day-partitioned
    parquet — the streaming twin of the reference's per-day directory
    sinks (S7, 01_classification_pipeline.py:203-207), idempotent per
    (batch, day) partition via dynamic partition overwrite."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("date", F.to_date("ts"))
            .write.mode("append")
            .partitionBy("date")
            .parquet(out_root)
        )

    return write_batch


def click_purchase_join(
    stream: DataFrame, *, window: str = "1 hour", watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Stream-stream interval join: every (click, purchase) pair of the
    same user where the purchase lands within ``window`` after the
    click — the attribution join, run as two live streams.

    Both sides carry watermarks and the join condition bounds
    purchase_ts relative to click_ts from BOTH directions, so Spark can
    compute each side's state retention: clicks are dropped once no
    future purchase can match them (watermark + window), purchases once
    their click horizon passes. State is sharded by the equi-join key
    (user_id); at 100 TB the same operator runs with the state store on
    RocksDB and scales with distinct active users in the horizon, not
    stream length. Inner join ⇒ results emit as soon as both sides
    arrive (no watermark-close latency, exactly like the batch twin in
    tests/test_streaming.py)."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {window}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )
