"""Schema-evolution reads (sources/evolution.py): merged reads union
additive generations, contract reads upcast widened generations while
staying pruned+pushed, and an incompatible retype fails at submit time
instead of mid-job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from production_ready_ds_spark.plans import pushed_filters, read_schema_columns
from production_ready_ds_spark.sources.evolution import (
    SchemaContractError,
    read_evolved,
    read_with_contract,
)

CONTRACT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("score", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("quality", T.DoubleType()),  # not yet written anywhere
    ]
)


@pytest.fixture()
def evolved_store(spark, tmp_path):
    """Three writer generations: v1 (id, score int32), v2 adds source,
    v3 widens score to int64."""
    p = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, score int"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(3, 30, "web")], "id long, score int, source string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(4, 40, "api")], "id long, score long, source string"
    ).write.mode("append").parquet(p)
    return p


def test_merged_read_unions_additive_generations(spark, tmp_path):
    p = str(tmp_path / "additive")
    spark.createDataFrame([(1, 10)], "id long, score int").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(3, 30, "web")], "id long, score int, source string"
    ).write.mode("append").parquet(p)
    df = read_evolved(spark, p)
    rows = {r.id: (r.score, r.source) for r in df.collect()}
    assert rows == {1: (10, None), 3: (30, "web")}


def test_merged_read_rejects_widened_store(spark, evolved_store):
    """mergeSchema does NOT widen int32 next to int64 — the documented
    reason the contract read exists. Pin the failure so a future Spark
    silently changing this behavior is noticed."""
    with pytest.raises(Exception, match="CANNOT_MERGE_SCHEMAS|merg"):
        read_evolved(spark, evolved_store).schema


def test_contract_read_upcasts_fills_prunes_and_pushes(spark, evolved_store):
    df = read_with_contract(spark, evolved_store, CONTRACT)
    rows = {r.id: (r.score, r.source, r.quality) for r in df.collect()}
    assert rows[1] == (10, None, None), "int32 generation upcast + filled"
    assert rows[4] == (40, "api", None), "int64 generation native"
    assert df.schema["score"].dataType.simpleString() == "bigint"

    # pruning: a projection of stable columns must not read evolved ones
    slim = df.filter(F.col("id") > 2).select("id")
    read = set().union(*read_schema_columns(slim))
    assert "source" not in read and "quality" not in read
    assert any("id" in p for p in pushed_filters(slim)), "filter pushed"


def test_incompatible_retype_raises(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.createDataFrame([(1, "abc")], "id long, score string").write.parquet(p)
    contract = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("score", T.LongType())]
    )
    with pytest.raises(SchemaContractError, match="score"):
        read_with_contract(spark, p, contract)
    # non-strict: the same mismatch surfaces only at EXECUTION time as
    # a per-file task failure — on a real backfill that is mid-job,
    # which is exactly why strict (submit-time) is the default
    df = read_with_contract(spark, p, contract, strict=False)
    with pytest.raises(Exception, match="PARQUET_COLUMN_DATA_TYPE_MISMATCH"):
        df.collect()


def test_unsupported_widenings_rejected_at_submit_time(spark, tmp_path):
    """int64→double and date32→timestamp(LTZ) LOOK like widenings but
    the vectorized parquet reader rejects them at execution — the
    contract check must reject them up front (empirically pinned; if a
    future Spark learns these conversions, loosen _WIDENINGS)."""
    import datetime

    p1 = str(tmp_path / "longs")
    spark.createDataFrame([(1, 10)], "id long, x long").write.parquet(p1)
    with pytest.raises(SchemaContractError, match="x"):
        read_with_contract(
            spark,
            p1,
            T.StructType(
                [T.StructField("id", T.LongType()), T.StructField("x", T.DoubleType())]
            ),
        )

    p2 = str(tmp_path / "dates")
    spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1))], "id long, x date"
    ).write.parquet(p2)
    with pytest.raises(SchemaContractError, match="x"):
        read_with_contract(
            spark,
            p2,
            T.StructType(
                [T.StructField("id", T.LongType()), T.StructField("x", T.TimestampType())]
            ),
        )
    # the supported sibling: date32 reads through a timestamp_ntz contract
    ok = read_with_contract(
        spark,
        p2,
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("x", T.TimestampNTZType())]
        ),
    )
    assert ok.collect()[0].x == datetime.datetime(2024, 1, 1, 0, 0)
