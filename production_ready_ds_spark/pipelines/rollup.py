"""Incremental metric-rollup maintenance: per-day ALGEBRAIC partial
aggregates merged into corpus totals without rescanning history.

The reference's daily pattern (one task instance per day, complete days
pruned — reference `01_classification_pipeline.py:28-48`,
`run_pipeline.sh:6-11`) applied to AGGREGATION STATE: each day's events
fold into a tiny partial-state row per event_type (count, sum, min,
max, and a DataSketches HLL register blob for distinct users), and the
corpus-lifetime report is a merge over partials only.

Why this is the 100 TB shape: the history is touched exactly once,
ever. A refreshed report re-reads |days|·|event_types| partial rows
(kilobytes), not the fact table; a late-arriving day overwrites ONE
day's partial and the merge is again partial-sized. This works
precisely because every carried statistic is algebraic or mergeable:

- count/sum merge by +, min/max by min/max, avg is DERIVED at merge
  time as sum/count (carrying avg itself would make the state
  non-mergeable — the classic partial-aggregation mistake);
- distinct users merge through the HLL sketch union (register-wise
  max), which is LOSSLESS with respect to the sketch: the union of
  per-day sketches is bit-equivalent to one sketch built over the whole
  span, so incremental maintenance costs zero extra accuracy
  (asserted exactly in tests/test_rollup.py);
- double SUMS are exact only up to addition order: the merged path adds
  per-day subtotals where the direct path adds raw values, so the two
  can differ in the last ulp — count/min/max/sketch compare EXACTLY in
  tests, monetary totals to the cent with an ulp-tolerant bound. (An
  exactness-critical pipeline sums scaled integers instead.)

Exact distinct counts are the one statistic that does NOT fit this
shape (their state is the full value set); at 100 TB the sketch IS the
production answer (SCALE.md "Sketches").
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ..workflow import DateParameter, Parameter, ParquetTarget, SparkTask


def _day_dir(root: str, date: _dt.date) -> str:
    return os.path.join(str(root), "rollup", f"date={date.isoformat()}")


class DailyRollup(SparkTask):
    """Fold one day of events into per-event_type partial state.

    Output is |event_types| rows of fixed-width state — the day's
    1-in-a-million reduction. The temporal predicate pushes to the
    parquet scan (reference S2 time-range semantics), and the fold is
    one map-side-combined groupBy of the day's slice."""

    date = DateParameter()
    data_root = Parameter()
    sf_dir = Parameter()

    def output(self):
        return ParquetTarget(_day_dir(self.data_root, self.date))

    def main(self, spark: SparkSession) -> None:
        start = self.date.isoformat()
        end = (self.date + _dt.timedelta(days=1)).isoformat()
        e = load(spark, str(self.sf_dir), "events").filter(
            (F.col("ts") >= F.lit(start).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(end).cast("timestamp_ntz"))
        )
        partial = e.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.hll_sketch_agg("user_id").alias("users_sketch"),
        )
        partial.write.mode("overwrite").parquet(self.output().path)


def merge_rollup(spark: SparkSession, data_root: str) -> DataFrame:
    """Corpus-lifetime totals from the partial store only.

    Reads every COMPLETE date= partition of partial state (never the
    fact table) and merges: + for count/sum, min/max for extremes,
    hll_union_agg for the user sketches, avg derived as sum/count.
    Completeness honors the workflow's target contract: a day directory
    without its _SUCCESS marker is a crashed half-write and is skipped,
    exactly as the scheduler would re-run it — reading the partition
    root directly would silently fold partial days into the report.
    The input is |days|·|event_types| rows, so this runs in
    milliseconds regardless of fact-table size."""
    base = os.path.join(str(data_root), "rollup")
    complete = [
        os.path.join(base, d)
        for d in sorted(os.listdir(base))
        if d.startswith("date=")
        and os.path.exists(os.path.join(base, d, "_SUCCESS"))
    ]
    if not complete:
        raise ValueError(f"no complete rollup partitions under {base}")
    partials = spark.read.option("basePath", base).parquet(*complete)
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum("cnt").cast("long").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("total_value"),
            F.round(F.min("min_value"), 2).alias("min_value"),
            F.round(F.max("max_value"), 2).alias("max_value"),
            F.round(F.sum("sum_value") / F.sum("cnt"), 4).alias("avg_value"),
            F.hll_sketch_estimate(F.hll_union_agg("users_sketch")).alias(
                "approx_users"
            ),
        )
        .orderBy("event_type")
    )


def direct_rollup(spark: SparkSession, sf_dir: str, *, start: _dt.date, days: int) -> DataFrame:
    """The same report computed the non-incremental way (one full scan
    of the span) — the test oracle for merge_rollup equivalence."""
    end = start + _dt.timedelta(days=days)
    e = load(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit(start.isoformat()).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(end.isoformat()).cast("timestamp_ntz"))
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.sum("value") / F.count(F.lit(1)), 4).alias("avg_value"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"),
        )
        .orderBy("event_type")
    )
