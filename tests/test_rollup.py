"""Incremental rollup maintenance (pipelines/rollup.py): merged
per-day partial state must equal the direct full-scan report EXACTLY —
including the HLL distinct-user estimates, because sketch union is
register-wise max and therefore lossless vs one sketch over the span.
Plus the reference's incremental semantics: complete days prune, a new
day folds in alone, a late-data day recomputes alone.
"""

from __future__ import annotations

import datetime as dt
import shutil

from production_ready_ds_spark.pipelines.rollup import (
    DailyRollup,
    direct_rollup,
    merge_rollup,
)
from production_ready_ds_spark.workflow import build, range_daily

START = dt.date(2024, 1, 10)


def _tasks(root, sf, stop, days):
    return range_daily(
        DailyRollup, stop=stop, days_back=days, data_root=root, sf_dir=sf
    )


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _assert_reports_match(merged, direct):
    """count/min/max/HLL-estimate compare EXACTLY (algebraic or
    register-wise-max merges); double SUMS are exact only up to
    addition order (merged adds per-day subtotals, direct adds raw
    values), so total/avg compare to the cent / 1e-4."""
    assert len(merged) == len(direct)
    for m, d in zip(merged, direct):
        assert (m[0], m[1], m[3], m[4], m[6]) == (d[0], d[1], d[3], d[4], d[6]), (m, d)
        assert abs(m[2] - d[2]) <= 0.011, (m, d)  # total_value (2 dp)
        assert abs(m[5] - d[5]) <= 0.00011, (m, d)  # avg_value (4 dp)


def test_merged_partials_equal_direct_report(spark, sf_small, tmp_path):
    root = str(tmp_path)
    build(_tasks(root, sf_small, START + dt.timedelta(days=3), 4))
    merged = _rows(merge_rollup(spark, root))
    direct = _rows(direct_rollup(spark, sf_small, start=START, days=4))
    _assert_reports_match(merged, direct)
    # the sketch columns really carried information (nonzero estimates)
    assert all(r[-1] > 0 for r in merged)


def test_new_day_folds_in_without_touching_history(spark, sf_small, tmp_path):
    root = str(tmp_path)
    build(_tasks(root, sf_small, START + dt.timedelta(days=2), 3))
    report = build(_tasks(root, sf_small, START + dt.timedelta(days=3), 4))
    assert len(report["ran"]) == 1, "only the new day computes"
    assert len(report["skipped"]) == 3, "history is pruned, never rescanned"
    merged = _rows(merge_rollup(spark, root))
    direct = _rows(direct_rollup(spark, sf_small, start=START, days=4))
    _assert_reports_match(merged, direct)


def test_late_data_day_recomputes_alone_and_totals_update(spark, sf_small, tmp_path):
    root = str(tmp_path)
    build(_tasks(root, sf_small, START + dt.timedelta(days=3), 4))
    before = _rows(merge_rollup(spark, root))
    # late data arrives for day 2: the reference O4 move is to delete
    # that day's target and re-run the trailing window — only day 2
    # recomputes, and the merged report is unchanged (same inputs)
    shutil.rmtree(f"{root}/rollup/date={(START + dt.timedelta(days=1)).isoformat()}")
    report = build(_tasks(root, sf_small, START + dt.timedelta(days=3), 4))
    assert len(report["ran"]) == 1
    assert _rows(merge_rollup(spark, root)) == before


def test_crashed_half_written_day_is_skipped_not_folded(spark, sf_small, tmp_path):
    """A day directory without its _SUCCESS marker is a crashed write:
    the merge must skip it (matching the scheduler, which would re-run
    the task) rather than silently folding partial state in."""
    import os

    root = str(tmp_path)
    build(_tasks(root, sf_small, START + dt.timedelta(days=2), 3))
    before = _rows(merge_rollup(spark, root))
    # simulate a crash mid-write of a 4th day: files exist, no _SUCCESS
    crashed = f"{root}/rollup/date={(START + dt.timedelta(days=3)).isoformat()}"
    complete = f"{root}/rollup/date={START.isoformat()}"
    os.makedirs(crashed)
    for f in os.listdir(complete):
        if f != "_SUCCESS":
            os.link(os.path.join(complete, f), os.path.join(crashed, f))
    assert _rows(merge_rollup(spark, root)) == before
