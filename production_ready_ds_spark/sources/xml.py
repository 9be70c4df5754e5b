"""XML source/sink — Spark 4's NATIVE xml data source (the spark-xml
package merged into core as of 4.0), completing the interchange-format
family beside CSV / JSONL / ORC / parquet.

Why it earns a slot: enterprise corpora still arrive as XML (Wikipedia
dumps, PubMed, patent archives, RSS/sitemap crawls), and at 100 TB the
same discipline as JSONL applies — an explicit schema is the contract
(inference reads the input twice and widens types per file), and a
malformed element is DATA to quarantine, never a reason to kill the
job. The reader is row-oriented on ``rowTag``: every occurrence of the
tag becomes one row, so a 100 GB dump file still splits at element
boundaries into parallel tasks.

Avro, the remaining common interchange format, stays env-blocked in
this container: it is an EXTERNAL module (spark-avro jar, not baked
into this install — ``spark.read.format("avro")`` raises
FAILED_FIND_DATA_SOURCE with the deployment hint). The read/write
surface here is the drop-in shape it would take.

Reference grounding: the reference ingests CSV exports only
(`01_classification_pipeline.py:203-207`); this is the same
source-contract discipline applied to the other formats a corpus lake
actually receives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

#: default element tag for one document row
ROW_TAG = "doc"
#: default enclosing tag written around a file's rows
ROOT_TAG = "docs"


def read_xml(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    row_tag: str = ROW_TAG,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read XML with an explicit schema, one row per ``row_tag``
    element. With ``keep_corrupt``, malformed elements yield a row
    whose data columns are NULL and whose ``_corrupt_record`` holds
    the raw element text (the jsonl quarantine convention —
    :func:`split_corrupt_xml` splits it); the default path is
    DROPMALFORMED: materialized reads silently drop bad elements.
    CAVEAT (measured, not hypothetical): a fully column-pruned plan
    over a DROPMALFORMED scan — ``count()`` — tallies row-tag
    occurrences WITHOUT parsing them, so it can exceed the
    materialized row count when malformed elements exist; exact
    accounting of a dirty corpus goes through ``keep_corrupt`` +
    :func:`split_corrupt_xml`."""
    if keep_corrupt:
        return (
            spark.read.schema(f"{schema}, {CORRUPT_COL} string")
            .option("rowTag", row_tag)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .xml(path)
        )
    return (
        spark.read.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", "DROPMALFORMED")
        .xml(path)
    )


def split_corrupt_xml(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split of a ``keep_corrupt`` XML read — same
    cache-first discipline as jsonl.split_corrupt (Spark refuses plans
    referencing ONLY the internal corrupt column of a raw scan; the
    cache materializes once for both split sides)."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_element")
    )
    return clean, bad


def write_xml(
    df: DataFrame,
    path: str,
    *,
    row_tag: str = ROW_TAG,
    root_tag: str = ROOT_TAG,
    compress: bool = False,
) -> None:
    """Write a frame as XML part files (one ``row_tag`` element per
    row under ``root_tag``, directory sink — the distributed shape).
    ``compress`` emits gzip parts; like .jsonl.gz, a gz part is one
    task on read, so shard counts carry the parallelism."""
    writer = (
        df.write.mode("overwrite")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.format("xml").save(path)
