"""End-to-end pipeline tests on sf0.001: the two reference-parity DAGs
(training + daily classification) through the workflow scheduler, with
the reference's operational semantics (sensor blocking, backfill,
idempotence) verified on real Spark jobs."""

from __future__ import annotations

import datetime as dt

import pytest

from production_ready_ds_spark.pipelines.classification import ClassifyDaily, ModelExists
from production_ready_ds_spark.pipelines.training import TrainModel
from production_ready_ds_spark.workflow import build, range_daily


@pytest.fixture()
def roots(tmp_path, sf_small):
    return {"data_root": str(tmp_path), "sf_dir": sf_small}


def test_training_pipeline_end_to_end(spark, roots):
    res = build([TrainModel(version=1, **roots)])
    assert len(res["ran"]) == 3 and not res["blocked"]

    # model usable
    from pyspark.ml import PipelineModel

    model = PipelineModel.load(f"{roots['data_root']}/model/1/model")
    cleaned = spark.read.parquet(f"{roots['data_root']}/model/1/cleaned")
    scored = model.transform(cleaned)
    assert scored.select("prediction").distinct().count() >= 1

    # idempotent: second build executes nothing
    res2 = build([TrainModel(version=1, **roots)])
    assert res2["ran"] == []


def test_classification_blocks_without_model(spark, roots):
    day = dt.date(2024, 1, 5)
    res = build([ClassifyDaily(date=day, version=1, **roots)])
    classify_ids = [t for t in res["blocked"] if t.startswith("ClassifyDaily")]
    sensor_ids = [t for t in res["blocked"] if t.startswith("ModelExists")]
    assert classify_ids and sensor_ids
    # upstream cleaning may run, but no ergebnis was produced
    assert not ClassifyDaily(date=day, version=1, **roots).complete()


def test_classification_backfill_end_to_end(spark, roots):
    build([TrainModel(version=1, **roots)])
    stop = dt.date(2024, 1, 4)
    tasks = range_daily(
        ClassifyDaily, stop=stop, days_back=2, version=1, **roots
    )
    res = build(tasks)
    assert not res["blocked"]

    out = spark.read.parquet(f"{roots['data_root']}/daily/ergebnis")
    assert out.count() > 0
    cols = set(out.columns)
    assert {"event_id", "doc_id", "prediction", "prediction_label", "date"} <= cols
    # Hive-partition layout: both days present as partition values
    days = {str(r.date) for r in out.select("date").distinct().collect()}
    assert days == {"2024-01-03", "2024-01-04"}

    # reference O2/O4: re-running the window recomputes nothing
    res2 = build(range_daily(ClassifyDaily, stop=stop, days_back=2, version=1, **roots))
    assert res2["ran"] == []
