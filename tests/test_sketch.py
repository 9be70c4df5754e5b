"""Misra-Gries heavy-hitters operator (operators/sketch.py): candidate
superset guarantee, bounded output, and the two-pass query's exactness
(the oracle equivalence in test_oracle covers the real corpus; here an
adversarial synthetic distribution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_ready_ds_spark.operators.sketch import misra_gries_candidates


def test_candidates_contain_every_true_heavy_hitter(spark):
    # 3 heavy values (>N/k for k=10) buried in a long tail of uniques,
    # deliberately interleaved and split across partitions
    rows = []
    for i in range(3000):
        rows.append((f"tail_{i}",))
        if i % 5 == 0:
            rows.append(("heavy_a",))
        if i % 7 == 0:
            rows.append(("heavy_b",))
        if i % 9 == 0:
            rows.append(("heavy_c",))
    df = spark.createDataFrame(rows, "token string").repartition(8)
    n = df.count()
    k = 10
    cands = {r.token for r in misra_gries_candidates(df, "token", k=k).collect()}
    true_heavy = {
        r.token
        for r in df.groupBy("token")
        .count()
        .filter(F.col("count") > n / k)
        .collect()
    }
    assert true_heavy  # the fixture actually has heavy hitters
    assert true_heavy <= cands, f"missing: {true_heavy - cands}"


def test_candidate_count_bounded_per_partition(spark):
    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(5000)], "token string"
    ).repartition(4)
    k = 16
    out = misra_gries_candidates(df, "token", k=k).count()
    assert out <= 4 * k, "each partition must emit at most k candidates"
