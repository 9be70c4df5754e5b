"""Training pipeline: Ingest → Clean → TrainModel.

Rebuild of the reference's 00_training_pipeline.py DAG
(Download → Clean → TrainModel) with the same task/target semantics:

- Ingest replaces the Reddit/PRAW fetch (S1) with a deterministic
  source — the ``documents`` testdata table (no credentials, no
  network); the class label is ``lang == 'en'`` mirroring the
  subreddit-LIKE label (00_training_pipeline.py:135).
- Clean is the reference's NLTK chain (T1-T6) as native Spark:
  tokenize → stopword-filter with builtins, Porter-stem via an
  Arrow-batched pandas UDF.
- TrainModel fits the same stage pipeline (Tokenizer → HashingTF(1000)
  → DecisionTreeClassifier, 00_training_pipeline.py:137-142) and saves
  a versioned PipelineModel (S8: model/<version>/model).

All intermediate data is columnar parquet with ``_SUCCESS``-marker
targets (not the reference's single-file CSVs) so every step is
distributed and restart-safe.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..functions.stemmer import stem_tokens_udf
from ..functions.text import remove_stopwords, tokens_expr
from ..tables import load
from ..workflow import IntParameter, Parameter, ParquetTarget, SparkTask


class IngestDocuments(SparkTask):
    """Deterministic source stage (replaces reference Download,
    00_training_pipeline.py:30-42)."""

    version = IntParameter(default=1)
    data_root = Parameter()
    sf_dir = Parameter()

    def output(self):
        return ParquetTarget(os.path.join(self.data_root, f"model/{self.version}/raw"))

    def main(self, spark):
        d = load(spark, self.sf_dir, "documents")
        raw = d.select(
            "doc_id",
            "text",
            "lang",
            (F.col("lang") == "en").cast("double").alias("label"),
        )
        raw.write.mode("overwrite").parquet(self.output().path)


class CleanTraining(SparkTask):
    """Cleaning stage (reference Clean, 00_training_pipeline.py:69-89):
    tokenize → lowercase → stopword-filter → stem → re-join, as Spark
    column expressions + one pandas UDF for the stemmer."""

    version = IntParameter(default=1)
    data_root = Parameter()
    sf_dir = Parameter()

    def requires(self):
        return IngestDocuments(version=self.version, data_root=self.data_root, sf_dir=self.sf_dir)

    def output(self):
        return ParquetTarget(os.path.join(self.data_root, f"model/{self.version}/cleaned"))

    def main(self, spark):
        raw = spark.read.parquet(self.requires().output().path)
        toks = remove_stopwords(tokens_expr(F.col("text")))
        stem = stem_tokens_udf()
        cleaned = (
            raw.withColumn("tokens", toks)
            .withColumn("stemmed", stem(F.col("tokens")))
            .select(
                "doc_id",
                F.array_join("stemmed", " ").alias("cleaned_words"),
                "lang",
                "label",
            )
        )
        cleaned.write.mode("overwrite").parquet(self.output().path)


class TrainModel(SparkTask):
    """Model-fit stage (reference TrainModel,
    00_training_pipeline.py:92-142): Tokenizer → HashingTF →
    DecisionTree on the cleaned corpus, saved versioned."""

    version = IntParameter(default=1)
    data_root = Parameter()
    sf_dir = Parameter()

    def requires(self):
        return CleanTraining(version=self.version, data_root=self.data_root, sf_dir=self.sf_dir)

    def output(self):
        # the saved PipelineModel directory (metadata + stage parquet)
        return ParquetTarget(os.path.join(self.data_root, f"model/{self.version}/model/metadata"))

    @property
    def model_path(self) -> str:
        return os.path.join(self.data_root, f"model/{self.version}/model")

    def main(self, spark):
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import DecisionTreeClassifier
        from pyspark.ml.feature import HashingTF, Tokenizer

        cleaned = spark.read.parquet(self.requires().output().path)
        train, _test = cleaned.randomSplit([0.8, 0.2], seed=42)
        pipeline = Pipeline(
            stages=[
                Tokenizer(inputCol="cleaned_words", outputCol="tokenized"),
                HashingTF(inputCol="tokenized", outputCol="features", numFeatures=1000),
                DecisionTreeClassifier(labelCol="label", featuresCol="features", seed=42),
            ]
        )
        model = pipeline.fit(train)
        model.write().overwrite().save(self.model_path)
