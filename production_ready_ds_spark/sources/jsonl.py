"""JSONL (newline-delimited JSON) source/sink — the de-facto corpus
interchange format (web-crawl dumps, HF dataset exports, eval suites
all ship as .jsonl / .jsonl.gz).

Reads are PERMISSIVE with corrupt-record capture: at corpus scale a
malformed line is DATA (truncated shard, encoding damage), never a
reason to kill a 1000-executor job — readers get the good rows plus a
``_corrupt_record`` column to quarantine, count, and re-crawl. An
explicit DDL schema is required: schema inference reads the input
twice and silently widens types per file at 100 TB; the schema IS the
contract. gzip round-trips transparently (Spark's text codecs), which
matters because corpus JSONL is ~4× smaller compressed and the format
stays splittable per FILE (one gz file = one task — shard accordingly,
the standard .jsonl.gz layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with an explicit schema. With ``keep_corrupt``,
    malformed lines yield a row whose data columns are NULL and whose
    ``_corrupt_record`` holds the raw line for quarantine flows (see
    :func:`split_corrupt`). The default path uses DROPMALFORMED
    instead — the scanner itself discards bad lines, so no corrupt
    column ever exists and aggregations that prune every data column
    (``count()``) don't trip Spark's only-corrupt-column scan
    restriction."""
    if keep_corrupt:
        return (
            spark.read.schema(f"{schema}, {CORRUPT_COL} string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split of a ``keep_corrupt`` read: clean rows
    without the corrupt column, plus one row per malformed line with
    its raw text — the count-and-requeue side of a corpus ingest.

    The frame is cached first: Spark refuses queries that reference
    ONLY the internal corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and cache
    is the documented workaround; both split sides then read the one
    materialization instead of re-parsing the input twice — which is
    what a quarantine pass wants anyway."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def write_jsonl(df: DataFrame, path: str, *, compress: bool = False) -> None:
    """Write a frame as JSONL (one JSON object per line, directory
    sink — the distributed shape; a single-file export is a driver
    decision, not a sink default). ``compress`` emits .json.gz parts."""
    writer = df.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)
