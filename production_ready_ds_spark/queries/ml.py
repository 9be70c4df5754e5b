"""ML-parity queries: the reference's classify projection and training
pipeline (M1-M4, reference 00_training_pipeline.py:135-142 and
01_classification_pipeline.py:185-198) re-expressed on the testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


@query(
    "q_classify_shape",
    category="ml",
    sql="""
    SELECT doc_id, lang,
           CAST(n_chars > 250 AS DOUBLE) AS prediction,
           CASE WHEN n_chars > 250 THEN 'long' ELSE 'short' END AS prediction_label
    FROM documents
    """,
)
def q_classify_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end mirror of the reference Classify projection
    (01_classification_pipeline.py:188-198): a deterministic rule stands
    in for the model score, then boolean→double cast (P4) and CASE-WHEN
    labeling (P5) — the exact output shape (id, class, prediction,
    prediction_label) without model nondeterminism."""
    d = load(spark, sf_dir, "documents")
    pred = F.col("n_chars") > 250
    return d.select(
        "doc_id",
        "lang",
        pred.cast("double").alias("prediction"),
        F.when(pred, "long").otherwise("short").alias("prediction_label"),
    )


@query("q_train_pipeline", category="ml", sql=None)
def q_train_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer → HashingTF → DecisionTreeClassifier pipeline fit +
    transform (M1-M4, reference 00_training_pipeline.py:137-142 with the
    same stages and hyperparameter shape: numFeatures=1000, binary
    label). Rows-only: tree splits depend on engine internals. Label =
    (lang == 'en') cast double — the mirror of the reference's
    subreddit-LIKE label (00_training_pipeline.py:135)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.feature import HashingTF, Tokenizer

    d = load(spark, sf_dir, "documents").withColumn(
        "label", (F.col("lang") == "en").cast("double")
    )
    pipeline = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="tokenized"),
            HashingTF(inputCol="tokenized", outputCol="features", numFeatures=1000),
            DecisionTreeClassifier(labelCol="label", featuresCol="features", seed=42),
        ]
    )
    model = pipeline.fit(d)
    return model.transform(d).select("doc_id", "label", "prediction")
