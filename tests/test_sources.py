"""Custom DataSource tests: executor-side partitioned fetch,
deterministic output, time-range option pushdown."""

from __future__ import annotations


def _read(spark, **options):
    from production_ready_ds_spark.sources import register_posts_api

    register_posts_api(spark)
    r = spark.read.format("posts_api")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def test_posts_api_basic(spark):
    df = _read(spark, subreddits="datascience,gameofthrones", limit=100, slices=4)
    assert df.count() == 200  # limit per subreddit
    assert set(df.columns) == {"id", "title", "selftext", "subreddit", "created_ts"}
    subs = {r.subreddit for r in df.select("subreddit").distinct().collect()}
    assert subs == {"datascience", "gameofthrones"}


def test_posts_api_parallel_partitions(spark):
    df = _read(spark, limit=100, slices=8)
    # 2 subreddits × 8 slices fetched as independent partitions
    assert df.rdd.getNumPartitions() == 16


def test_posts_api_deterministic(spark):
    a = sorted(map(str, _read(spark, limit=50).collect()))
    b = sorted(map(str, _read(spark, limit=50).collect()))
    assert a == b


def test_posts_api_cross_process_deterministic():
    """Rows must be identical from a FRESH interpreter: builtin hash()
    is PYTHONHASHSEED-salted per process, so _fetch_slice must not use
    it (a restarted driver / foreign executor would see new data)."""
    import subprocess
    import sys

    script = (
        "from production_ready_ds_spark.sources.api_source import _fetch_slice;"
        "print(_fetch_slice('datascience', 1, 5, 0, 1000))"
    )
    from pathlib import Path

    repo_root = str(Path(__file__).resolve().parents[1])
    outs = {
        subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, check=True, cwd=repo_root,
        ).stdout
        for _ in range(2)
    }
    assert len(outs) == 1
    from production_ready_ds_spark.sources.api_source import _fetch_slice

    assert outs.pop().strip() == str(_fetch_slice("datascience", 1, 5, 0, 1000))


def test_posts_api_time_range_pushdown(spark):
    lo, hi = 1_500_000_000, 1_500_086_400  # one day
    df = _read(spark, limit=200, start_ts=lo, end_ts=hi)
    ts = [r.created_ts for r in df.select("created_ts").collect()]
    assert ts and all(lo <= t < hi for t in ts)
