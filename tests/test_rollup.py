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


def test_merged_partials_equal_direct_report(spark, sf_small, tmp_path):
    root = str(tmp_path)
    build(_tasks(root, sf_small, START + dt.timedelta(days=3), 4))
    merged = _rows(merge_rollup(spark, root))
    direct = _rows(direct_rollup(spark, sf_small, start=START, days=4))
    assert merged == direct, "merge over partials must equal the full scan"
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
    assert merged == direct


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
