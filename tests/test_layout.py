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


def _file_prune_fraction(path, col, lo, hi):
    """Fraction of files whose (col) min/max intersects [lo, hi] — what
    footer-stats pruning would read for that range predicate."""
    files = _parquet_files(path)
    hit = 0
    for f in files:
        md = pq.read_metadata(f)
        ci = md.schema.names.index(col)
        fmin = min(md.row_group(i).column(ci).statistics.min for i in range(md.num_row_groups))
        fmax = max(md.row_group(i).column(ci).statistics.max for i in range(md.num_row_groups))
        if fmin <= hi and fmax >= lo:
            hit += 1
    return hit / len(files)


def test_zorder_prunes_both_dimensions(spark, sf_small, tmp_path):
    """Z-order clustering must make file stats selective on BOTH
    clustered columns, where single-dim range clustering leaves the
    second column unprunable; data must survive byte-for-byte."""
    from production_ready_ds_spark.operators.layout import write_zorder_clustered

    orders = load(spark, sf_small, "orders")
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder_clustered(orders, zpath, ["o_custkey", "o_orderkey"], n_files=16)
    write_range_clustered(orders, rpath, ["o_custkey"], n_files=16)

    before = sorted(map(tuple, orders.collect()))
    assert sorted(map(tuple, spark.read.parquet(zpath).collect())) == before

    ck = orders.agg(F.max("o_custkey"), F.max("o_orderkey")).first()
    ck_hi, ok_hi = ck[0], ck[1]
    # narrow range on each dimension (~6% of its domain)
    z_cust = _file_prune_fraction(zpath, "o_custkey", 0, ck_hi // 16)
    z_order = _file_prune_fraction(zpath, "o_orderkey", 0, ok_hi // 16)
    r_cust = _file_prune_fraction(rpath, "o_custkey", 0, ck_hi // 16)
    r_order = _file_prune_fraction(rpath, "o_orderkey", 0, ok_hi // 16)

    # range clustering: lead column prunes hard, second column not at all
    assert r_cust <= 0.25, r_cust
    assert r_order == 1.0, r_order
    # z-order: BOTH dimensions prune meaningfully
    assert z_cust <= 0.5, z_cust
    assert z_order <= 0.5, z_order


def test_dynamic_partition_pruning_on_date_partitioned_lake(spark, sf_small, tmp_path):
    """The date-partitioned lake layout (S7/O4 made relational) must get
    Catalyst DYNAMIC partition pruning: joining the fact against a
    filtered dim on the partition column plants a dynamicpruning
    subquery in the fact scan's PartitionFilters, so only the matching
    day directories are read — the scan primitive that makes a
    backfill-shaped query touch days, not the lake, at 100 TB."""
    import pyspark.sql.functions as F

    from production_ready_ds_spark.tables import load

    lake = str(tmp_path / "events_by_day")
    ev = load(spark, sf_small, "events").withColumn("date", F.to_date("ts"))
    ev.write.partitionBy("date").mode("overwrite").parquet(lake)

    fact = spark.read.parquet(lake)
    dim = (
        ev.select("date").distinct()
        .withColumn("flag", F.dayofmonth("date"))
        .filter(F.col("flag") <= 3)  # non-foldable dim filter → DPP candidate
    )
    joined = fact.join(dim.hint("broadcast"), "date").groupBy("date").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_spread_widens_narrow_scans_only(spark):
    from production_ready_ds_spark.tables import spread

    df = spark.range(1000).coalesce(1)
    assert spread(df, parts=4).rdd.getNumPartitions() == 4
    wide = spark.range(1000).repartition(8)
    # already at/above target → returned untouched, no exchange added
    assert spread(wide, parts=4) is wide
    # default target tracks the session parallelism
    assert spread(df).rdd.getNumPartitions() == max(
        2, spark.sparkContext.defaultParallelism // 4
    )


def test_zorder_rank_scale_prunes_skewed_dimension(spark, tmp_path):
    """Linear min/max scaling concentrates a skewed dimension into a
    handful of z-buckets, so a predicate INSIDE the dense region reads
    almost every file; rank_scale buckets by approxQuantile rank
    (equal row mass per bucket) and must prune that same predicate
    substantially, without hurting the uniform dimension. Data must
    survive byte-for-byte."""
    from production_ready_ds_spark.operators.layout import write_zorder_clustered

    df = spark.range(20000).select(
        (F.pow(F.col("id") / 20000.0, 8) * 1e6).alias("skewed"),
        (F.col("id") % 1000).alias("uni"),
    )
    q10, q30 = df.approxQuantile("skewed", [0.1, 0.3], 0.001)
    lin, rank = str(tmp_path / "lin"), str(tmp_path / "rank")
    write_zorder_clustered(df, lin, ["skewed", "uni"], n_files=16)
    write_zorder_clustered(df, rank, ["skewed", "uni"], n_files=16, rank_scale=True)

    before = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, spark.read.parquet(rank).collect())) == before

    lin_dense = _file_prune_fraction(lin, "skewed", q10, q30)
    rank_dense = _file_prune_fraction(rank, "skewed", q10, q30)
    assert lin_dense >= 0.85, lin_dense  # linear cannot see inside the dense region
    assert rank_dense <= 0.70, rank_dense  # rank scaling spreads it
    assert rank_dense < lin_dense - 0.2, (lin_dense, rank_dense)
    # the uniform dimension still prunes on both layouts
    assert _file_prune_fraction(rank, "uni", 0, 62) <= 0.5
    assert _file_prune_fraction(lin, "uni", 0, 62) <= 0.5


def _xy2d_ref(n, x, y):
    """Pure-Python Wikipedia xy2d — the independent reference the JVM
    expression fold is pinned against."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_exhaustively(spark):
    """Every cell of the 16x16 grid (bits=4): the staged JVM walk
    equals the reference, the mapping is a bijection, and consecutive
    distances are grid-adjacent (the locality property that motivates
    Hilbert over Morton)."""
    from production_ready_ds_spark.operators.layout import with_hilbert_key

    n = 16
    cells = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(cells, "x long, y long")
    rows = with_hilbert_key(df, "x", "y", bits=4, keep=("x", "y")).collect()
    got = {(r.x, r.y): r.hkey for r in rows}
    pos = {}
    for (x, y), d in got.items():
        assert d == _xy2d_ref(n, x, y), (x, y)
        pos[d] = (x, y)
    assert len(pos) == n * n, "bijection"
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, "adjacent steps"


def test_hilbert_buckets_are_compact_boxes(spark, sf_small):
    """The layout win, measured: every Hilbert bucket's bounding box
    covers at most ~half of each key domain (consecutive curve
    segments are compact regions), and bucket row counts are nonzero
    for a spread of buckets."""
    from production_ready_ds_spark.queries import catalog

    out = catalog()["q_hilbert_layout"].fn(spark, sf_small).collect()
    assert len(out) >= 8
    pk_span = max(r.pk_hi for r in out) - min(r.pk_lo for r in out)
    sk_span = max(r.sk_hi for r in out) - min(r.sk_lo for r in out)
    for r in out:
        assert r.n_rows > 0
        assert (r.pk_hi - r.pk_lo) <= 0.6 * pk_span or r.n_rows < 50, r
        assert (r.sk_hi - r.sk_lo) <= 0.6 * sk_span or r.n_rows < 50, r


def test_hilbert_write_prunes_both_dimensions(spark, sf_small, tmp_path):
    """The Hilbert WRITE path (q_hilbert_layout's key math landing in
    real files): data survives byte-for-byte and file min/max stats
    prune narrow ranges on BOTH clustered columns, like the z-order
    writer it refines."""
    from production_ready_ds_spark.operators.layout import write_hilbert_clustered

    orders = load(spark, sf_small, "orders")
    hpath = str(tmp_path / "h")
    write_hilbert_clustered(orders, hpath, ["o_custkey", "o_orderkey"], n_files=16)

    before = sorted(map(tuple, orders.collect()))
    assert sorted(map(tuple, spark.read.parquet(hpath).collect())) == before

    ck = orders.agg(F.max("o_custkey"), F.max("o_orderkey")).first()
    h_cust = _file_prune_fraction(hpath, "o_custkey", 0, ck[0] // 16)
    h_order = _file_prune_fraction(hpath, "o_orderkey", 0, ck[1] // 16)
    assert h_cust <= 0.5, h_cust
    assert h_order <= 0.5, h_order

    import pytest as _pytest

    with _pytest.raises(ValueError, match="two cluster columns"):
        write_hilbert_clustered(orders, hpath, ["o_custkey"])
