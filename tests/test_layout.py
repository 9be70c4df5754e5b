"""Layout operators: compaction preserves data while right-sizing
files; range-clustered writes produce disjoint per-file key ranges
(the property parquet min/max pruning needs)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from production_ready_ds_spark.operators.layout import (
    compact_parquet,
    write_range_clustered,
)
from production_ready_ds_spark.tables import load


def _parquet_files(path):
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    ]


def test_compact_parquet_right_sizes_and_preserves_data(spark, sf_small, tmp_path):
    out = str(tmp_path / "frag")
    src = load(spark, sf_small, "lineitem")
    # simulate micro-batch fragmentation: 64 splinter files
    src.repartition(64).write.parquet(out)
    assert len(_parquet_files(out)) == 64
    before = sorted(map(tuple, spark.read.parquet(out).collect()))

    n_rows = len(before)
    n_files = compact_parquet(spark, out, target_rows_per_file=n_rows // 3 + 1)
    assert n_files == 3
    assert len(_parquet_files(out)) == 3
    after = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert after == before


def test_range_clustered_write_gives_disjoint_file_ranges(spark, sf_small, tmp_path):
    out = str(tmp_path / "clustered")
    orders = load(spark, sf_small, "orders")
    write_range_clustered(orders, out, ["o_orderkey"], n_files=6)

    ranges = []
    for f in _parquet_files(out):
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {(lo_a, hi_a)} vs {(lo_b, hi_b)}"

    # data intact and a point predicate is satisfiable
    got = spark.read.parquet(out)
    assert got.count() == orders.count()
    key = orders.select(F.min("o_orderkey")).collect()[0][0]
    assert got.filter(F.col("o_orderkey") == key).count() >= 1
