"""UDF-surface queries: Arrow-batched pandas UDFs and grouped
applyInPandas — the sanctioned slow path (reference U1's row-wise NLTK
cleaning, 00_training_pipeline.py:80,84-89, done right: vectorized Arrow
batches instead of per-row Python).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..tables import load
from . import query


def _normalize_series(s: pd.Series) -> pd.Series:
    """lower → trim → collapse whitespace → first 12 chars.

    The 'stem-like' scalar transform of the reference's cleaning UDF
    (U1/T5), Arrow-vectorized. Defined as a plain function and wrapped
    with pandas_udf lazily — creating the UDF needs an active session."""
    return (
        s.str.lower()
        .str.strip()
        .map(lambda x: re.sub(r"\s+", " ", x) if isinstance(x, str) else x)
        .str.slice(0, 12)
    )


@query(
    "q_udf_pandas",
    category="udf",
    sql="""
    SELECT doc_id,
           SUBSTRING(regexp_replace(TRIM(LOWER(text)), '\\s+', ' ', 'g'), 1, 12) AS norm_prefix
    FROM documents
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over document text; the oracle expresses the
    identical transform in SQL, proving the UDF's semantics."""
    d = load(spark, sf_dir, "documents")
    normalize = pandas_udf(_normalize_series, "string")
    return d.select("doc_id", normalize(F.col("text")).alias("norm_prefix"))


def _center_acctbal(pdf: pd.DataFrame) -> pd.DataFrame:
    # mean-center within the group; rounding is left to Spark so the
    # rounding mode matches the oracle (pandas would use half-even).
    out = pdf[["c_custkey", "c_mktsegment"]].copy()
    out["centered_bal"] = pdf["c_acctbal"] - pdf["c_acctbal"].mean()
    return out


@query(
    "q_udaf_grouped",
    category="udf",
    sql="""
    SELECT c_custkey, c_mktsegment,
           ROUND(c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment), 2)
             AS centered_bal
    FROM customer
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise normalization via applyInPandas (UDAF/UDTF surface).

    Each segment's rows arrive as one Arrow batch; at 100 TB this is a
    single shuffle on the group key with pandas running per-group —
    appropriate only because per-group state (one mean) is tiny. The
    oracle is the equivalent window-average SQL."""
    c = load(spark, sf_dir, "customer")
    out = c.select("c_custkey", "c_mktsegment", "c_acctbal").groupBy("c_mktsegment").applyInPandas(
        _center_acctbal, schema="c_custkey long, c_mktsegment string, centered_bal double"
    )
    return out.select("c_custkey", "c_mktsegment", F.round("centered_bal", 2).alias("centered_bal"))


def _token_stats_batches(it):
    """mapInPandas iterator: per-batch token statistics (UDTF-shaped —
    one input row → one output row with derived columns, streamed by
    Arrow batch, never materializing the whole partition)."""
    for pdf in it:
        toks = pdf["text"].str.lower().str.split(r"\W+", regex=True)
        toks = toks.map(lambda ts: [t for t in ts if t])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": toks.map(len).astype("int64"),
                "n_unique": toks.map(lambda ts: len(set(ts))).astype("int64"),
            }
        )


@query(
    "q_mapinpandas_tokens",
    category="udf",
    sql="""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(text), '\\W+'), t -> t <> '')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(list_filter(regexp_split_to_array(lower(text), '\\W+'), t -> t <> ''))) AS BIGINT) AS n_unique
    FROM documents
    """,
)
def q_mapinpandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (arbitrary Python per Arrow batch) computing token
    counts; oracle = same semantics in DuckDB list functions."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_token_stats_batches, schema="doc_id long, n_tokens long, n_unique long")


class _PositionedTokens:
    """Python UDTF body: one input row (doc text) → one output row per
    token with its 0-based position. Mirrors functions.text.tokens_expr
    (lower → split on \\W+ → drop empties) so the DuckDB oracle can
    replicate it relationally."""

    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF signature
        if text is None:
            return
        for pos, tok in enumerate(t for t in re.split(r"\W+", text.lower()) if t):
            yield doc_id, pos, tok


@query(
    "q_udtf_tokens",
    category="udf",
    sql=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\W+'), x -> x <> '') AS ts
      FROM documents
    )
    SELECT doc_id, i - 1 AS pos, ts[i] AS token
    FROM t, UNNEST(range(1, len(ts) + 1)) AS r(i)
    """,
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 table function): tokenization as a
    LATERAL table-function join in SQL. The UDTF path is the escape
    hatch for one-row→many-rows Python logic the built-in generators
    can't express; here the logic IS expressible (q_tokenize_explode is
    the fast path), which is what makes it oracle-checkable."""
    from pyspark.sql.functions import udtf

    fn = udtf(_PositionedTokens, returnType="doc_id: bigint, pos: int, token: string")
    spark.udtf.register("positioned_tokens", fn)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_src")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.token
        FROM documents_udtf_src d,
             LATERAL positioned_tokens(d.doc_id, d.text) t
        """
    )
