"""Reference golden-artifact replay (SURVEY.md §5.2(2)).

The reference repo ships four days of end-to-end outputs
(daily/<MM-DD-YYYY>/{roh,cleaned,ergebnis}.csv) as de-facto fixtures.
These tests replay our rebuilt stages against them:

- multiline-CSV reading must recover the exact record count (the raw
  files have embedded newlines — 134 physical lines for 32 records);
- the Clean chain (tokenize → lower → stopword → stem) must reproduce
  the golden cleaned_words EXACTLY, token for token: the full English
  stopword list + the Snowball (Porter2) stemmer
  (functions/snowball.py) replicate the reference's NLTK chain;
- the ergebnis labeling rule (prediction==1 → positive class) is
  replayed exactly from the golden prediction column.
"""

from __future__ import annotations

import os

import pytest

from production_ready_ds_spark.sources.csv import read_reference_csv

REF = "/root/reference/daily"
DAYS = ["02-19-2018", "02-20-2018", "02-21-2018", "02-22-2018"]
GOLDEN_ROWS = {"02-19-2018": 32, "02-20-2018": 41, "02-21-2018": 39, "02-22-2018": 31}

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not present")


@pytest.mark.parametrize("day", DAYS)
def test_multiline_csv_recovers_record_count(spark, day):
    roh = read_reference_csv(spark, f"{REF}/{day}/roh.csv")
    assert roh.count() == GOLDEN_ROWS[day]
    assert roh.columns == ["id", "title", "selftext", "subreddit"]


@pytest.mark.parametrize("day", DAYS)
def test_clean_chain_replay_exact(spark, day):
    from pyspark.sql import functions as F

    from production_ready_ds_spark.functions.stemmer import stem_tokens_udf
    from production_ready_ds_spark.functions.text import (
        REFERENCE_STOPWORDS,
        remove_stopwords,
        tokens_expr_unicode,
    )

    roh = read_reference_csv(spark, f"{REF}/{day}/roh.csv").na.fill("")
    text = F.concat_ws(" ", "title", "selftext")  # reference T1
    cleaned_ours = (
        roh.withColumn(
            "tokens",
            remove_stopwords(tokens_expr_unicode(text), stopwords=REFERENCE_STOPWORDS),
        )
        .withColumn("stemmed", stem_tokens_udf()(F.col("tokens")))
        .select("id", F.array_join("stemmed", " ").alias("cleaned_words"), "subreddit")
    )
    golden = read_reference_csv(spark, f"{REF}/{day}/cleaned.csv")

    ours = {r.id: r.cleaned_words for r in cleaned_ours.collect()}
    want = {r.id: r.cleaned_words or "" for r in golden.collect()}
    assert set(ours) == set(want), "id sets must match exactly"
    mism = {k: (ours[k], want[k]) for k in want if ours[k] != want[k]}
    assert not mism, f"{len(mism)} rows differ from golden: {mism}"


@pytest.mark.parametrize("day", DAYS)
def test_ergebnis_labeling_rule_replay(spark, day):
    """The CASE-WHEN labeling (01_classification_pipeline.py:195-198)
    replayed on the golden prediction column must reproduce the golden
    prediction_label column exactly."""
    from pyspark.sql import functions as F

    erg = read_reference_csv(
        spark,
        f"{REF}/{day}/ergebnis.csv",
        schema="id string, subreddit string, probability string, prediction double, prediction_label string",
    )
    relabeled = erg.withColumn(
        "our_label",
        F.when(F.col("prediction") == 1, "datascience").otherwise("gameofthrones"),
    )
    mismatches = relabeled.filter(F.col("our_label") != F.col("prediction_label")).count()
    assert mismatches == 0
    assert erg.count() == GOLDEN_ROWS[day]
