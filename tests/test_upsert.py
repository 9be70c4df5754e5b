"""Keyed parquet upsert: replace-on-key, insert-new, and the
partitioned path's only-touched-partitions guarantee."""

from __future__ import annotations

import glob
import os

import pytest

from production_ready_ds_spark.operators.upsert import UpsertError, upsert_parquet


def _rows(spark, path):
    return {
        (r.k, r.part): r.v
        for r in spark.read.parquet(path).collect()
    }


def _mk(spark, data):
    return spark.createDataFrame(data, "k long, part string, v string")


def test_upsert_unpartitioned(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    upsert_parquet(spark, path, _mk(spark, [(1, "a", "v1"), (2, "a", "v2")]), ["k"])
    upsert_parquet(spark, path, _mk(spark, [(2, "a", "V2"), (3, "b", "v3")]), ["k"])
    assert _rows(spark, path) == {(1, "a"): "v1", (2, "a"): "V2", (3, "b"): "v3"}
    # no stray temp/old directories left behind
    assert glob.glob(path + ".*") == []


def test_upsert_partitioned_touches_only_affected(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    upsert_parquet(
        spark, path,
        _mk(spark, [(1, "a", "v1"), (2, "a", "v2"), (10, "b", "v10")]),
        ["k"], partition_col="part",
    )
    before = {f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=b/*.parquet")}
    assert before

    upsert_parquet(
        spark, path,
        _mk(spark, [(2, "a", "V2"), (3, "a", "v3")]),
        ["k"], partition_col="part",
    )
    assert _rows(spark, path) == {
        (1, "a"): "v1", (2, "a"): "V2", (3, "a"): "v3", (10, "b"): "v10",
    }
    # partition b was not rewritten: same files, same mtimes
    after = {f: os.path.getmtime(f) for f in glob.glob(f"{path}/part=b/*.parquet")}
    assert after == before


def test_upsert_idempotent(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    up = _mk(spark, [(1, "a", "v1")])
    upsert_parquet(spark, path, up, ["k"], partition_col="part")
    upsert_parquet(spark, path, up, ["k"], partition_col="part")
    assert _rows(spark, path) == {(1, "a"): "v1"}


def test_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    with pytest.raises(UpsertError, match="duplicate key"):
        upsert_parquet(spark, path, _mk(spark, [(1, "a", "x"), (1, "a", "y")]), ["k"])


def test_upsert_rejects_schema_mismatch(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    upsert_parquet(spark, path, _mk(spark, [(1, "a", "v1")]), ["k"])
    bad = spark.createDataFrame([(1, "a")], "k long, part string")
    with pytest.raises(UpsertError, match="schema mismatch"):
        upsert_parquet(spark, path, bad, ["k"])
