"""Semantic tests for funnel and retention cohort queries beyond the
oracle gate: ordering/window constraints on a constructed event log, and
retention-triangle invariants on testdata."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from production_ready_ds_spark.queries.events import q_event_funnel, q_event_retention


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    out = str(tmp_path / "ev")
    df.write.parquet(out + "/events.parquet")
    return out


def test_funnel_stage_counts_monotone(spark, sf_small):
    got = {r["stage"]: r["n_users"] for r in q_event_funnel(spark, sf_small).collect()}
    assert set(got) == {"1_view", "2_click", "3_purchase"}
    assert got["1_view"] >= got["2_click"] >= got["3_purchase"] >= 0


def test_funnel_order_and_window_constraints(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    d = dt.timedelta(days=1)
    rows = [
        # user 1: clean view → click → purchase inside the windows
        (t0, 1, "view"), (t0 + h, 1, "click"), (t0 + 2 * h, 1, "purchase"),
        # user 2: click BEFORE the first view — must not count as stage 2
        (t0, 2, "click"), (t0 + h, 2, "view"),
        # user 3: click more than 1 day after the first view — out of window
        (t0, 3, "view"), (t0 + d + h, 3, "click"),
        # user 4: purchase before the click — ordering violated at stage 3
        (t0, 4, "view"), (t0 + 2 * h, 4, "click"), (t0 + h, 4, "purchase"),
    ]
    got = {
        r["stage"]: r["n_users"]
        for r in q_event_funnel(spark, _write_events(spark, tmp_path, rows)).collect()
    }
    assert got == {"1_view": 4, "2_click": 2, "3_purchase": 1}


def test_retention_triangle_invariants(spark, sf_small):
    rows = q_event_retention(spark, sf_small).collect()
    assert rows, "retention matrix must not be empty"
    day0 = {r["cohort_day"]: r["n_users"] for r in rows if r["offset_days"] == 0}
    by_cohort: dict[str, int] = {}
    for r in rows:
        assert r["offset_days"] >= 0  # activity never precedes first-seen
        by_cohort[r["cohort_day"]] = max(
            by_cohort.get(r["cohort_day"], 0), r["n_users"]
        )
    for cohort, peak in by_cohort.items():
        # every cohort has an offset-0 row, and it is the cohort's peak:
        # a user is active on their own first day by definition.
        assert cohort in day0
        assert day0[cohort] == peak


def test_retention_cohort_sizes_partition_users(spark, sf_small, monkeypatch):
    from production_ready_ds_spark.tables import load

    rows = q_event_retention(spark, sf_small).collect()
    total_day0 = sum(r["n_users"] for r in rows if r["offset_days"] == 0)
    n_users = load(spark, sf_small, "events").select("user_id").distinct().count()
    assert total_day0 == n_users


def test_anomaly_flags_injected_outlier(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(t0, 1, "view")] * 50
    df = spark.createDataFrame(
        [
            (i, ts, uid, et, 1.0 + (i % 7) * 0.01, "{}")
            for i, (ts, uid, et) in enumerate(rows)
        ]
        + [(999, t0, 2, "view", 1000.0, "{}")],  # the outlier
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    out = str(tmp_path / "ev_anom")
    df.write.parquet(out + "/events.parquet")

    from production_ready_ds_spark.queries.events import q_event_anomaly

    got = {r["event_type"]: r for r in q_event_anomaly(spark, out).collect()}
    assert got["view"]["n_anomalies"] == 1
    assert got["view"]["max_abs_z"] > 3


def test_resample_fills_silent_hours_with_zeros(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        (t0, 1, "view"),  # hour 00
        (t0 + dt.timedelta(hours=3), 1, "view"),  # hour 03 — 01,02 silent
    ]
    df = spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    out = str(tmp_path / "ev_rs")
    df.write.parquet(out + "/events.parquet")

    from production_ready_ds_spark.queries.events import q_event_resample

    got = {
        (r["hour_start"].hour, r["event_type"]): r["n_events"]
        for r in q_event_resample(spark, out).collect()
    }
    assert got == {(0, "view"): 1, (1, "view"): 0, (2, "view"): 0, (3, "view"): 1}


def test_join_interval_finds_bucket_straddling_overlaps(spark, tmp_path):
    """Constructed co-presence: overlaps must be found even when the
    two sessions START in different hour buckets (the case a naive
    same-bucket-start join misses), and disjoint sessions produce no
    pair."""
    import datetime as dt
    import os

    from production_ready_ds_spark.queries import catalog

    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(i, user, minutes):
        return (i, user, base + dt.timedelta(minutes=minutes), "click", 1.0)

    rows = [
        # user A: one session 10:50 -> 11:10 (straddles the 11:00 bucket edge)
        ev(1, 1, 50), ev(2, 1, 60), ev(3, 1, 70),
        # user B: one session 11:05 -> 11:20 (starts in the NEXT hour bucket)
        ev(4, 2, 65), ev(5, 2, 80),
        # user C: far later, overlaps nobody
        ev(6, 3, 600), ev(7, 3, 610),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string, value double"
    )
    sf_dir = str(tmp_path / "iv_sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))
    got = catalog()["q_join_interval"].fn(spark, sf_dir).collect()
    assert len(got) == 1, got
    r = got[0]
    assert (r.user_a, r.user_b) == (1, 2)
    assert r.overlap_us == 5 * 60 * 1_000_000  # 11:05 -> 11:10
