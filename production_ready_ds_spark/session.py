"""SparkSession factory with scale-appropriate defaults.

The reference spawns one spark-submit per Luigi task with fixed resources
(reference 00_training_pipeline.py:97-101). Here a single tuned session is
shared; per-job knobs become runtime confs.

Defaults chosen for the 100 TB design brief:
- AQE on (runtime shuffle coalescing, skew-join splitting).
- Arrow on (fast toPandas / pandas_udf batches).
- ``spark.sql.legacy.parquet.nanosAsLong`` — the testdata ``events``
  table stores INT64 TIMESTAMP(NANOS) which Spark 4 otherwise rejects
  (PARQUET_TYPE_ILLEGAL); see tables.load_events.
- UTC session timezone so timestamp semantics line up with the DuckDB
  oracle and with any cluster regardless of host TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def configure(builder: SparkSession.Builder, shuffle_partitions: int | None = None) -> SparkSession.Builder:
    """Apply engine defaults to any SparkSession builder."""
    return (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate re-inlines the generator expression into
        # a pushed-down Filter; for the explode(expensive-array-expr)
        # shapes in the dedup family that recomputes tokenize+shingle per
        # row at the scan (measured 4× slowdown at sf0.1). explode of an
        # empty/null array already yields zero rows, so the inferred
        # filter only ever costs.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # pin ORC pushdown explicitly (it is the Spark default, but a
        # deployment flipping defaults must not silently lose the
        # scan-shape contract sources/orc.py asserts)
        .config("spark.sql.orc.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
    )


def get_spark(app_name: str = "production-ready-ds-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the shared tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and no
    active session exists; on a real cluster leave it to spark-submit.
    """
    builder = configure(SparkSession.builder.appName(app_name))
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    # Local-mode heap knob: Spark's default driver heap is 1g, which is
    # the EXECUTOR memory too in local mode — 32 task threads share
    # ~360 MB of execution memory, and text-heavy aggregations at the
    # replicated stress scales die in spill-buffer allocation
    # (java.lang.OutOfMemoryError inside UnsafeSorterSpillReader, seen
    # at the 64× composed-curation stress; 16× fits). Opt-in via env so
    # the committed bench floor (measured on the default heap) stays
    # comparable; on a real cluster spark-submit owns this knob and the
    # builder conf is ignored for an already-running JVM.
    if "SPARK_GRAFT_DRIVER_MEM" in os.environ:
        builder = builder.config(
            "spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"]
        )
    # fast path: register what's imported now; queries/__init__ tops
    # this up after its module loop, ensure_runtime_confs runs the
    # full registration on the foreign-session path
    register_udf_modules(only_loaded=True)
    return builder.getOrCreate()


#: Every module that defines worker-side Python (pandas UDFs,
#: mapInPandas/applyInPandas/UDTF bodies), as dotted paths relative to
#: the package.
#: tests/test_udf_registration.py::test_udf_modules_all_registered
#: greps the source tree for worker-side markers and fails if a module
#: is missing here — the q_wordpiece_apply incident: its pandas_udf
#: referenced module globals (wordpiece_segment, the vocab set), the
#: module wasn't registered, so the closure pickled those BY REFERENCE
#: and every foreign-cwd worker died on ModuleNotFoundError while
#: repo-cwd runs (and the test suite) passed silently.
UDF_MODULES = (
    "functions.stemmer",
    "functions.snowball",
    "functions.unicode_norm",
    "operators.ann",
    "operators.ivfstore",
    "operators.multimodal",
    "operators.pq",
    "operators.sketch",
    "queries.llm",
    "queries.multimodal",
    "queries.streaming_queries",
    "queries.udfs",
    "queries.unigram",
    "queries.wordpiece",
    "sources.api_source",
    "streaming.dedup",
    "streaming.events",
)


def register_udf_modules(only_loaded: bool = False) -> None:
    """Register every module that defines worker-side Python (pandas
    UDFs, mapInPandas/applyInPandas bodies) for cloudpickle
    pickle-BY-VALUE. Without this, Spark pickles those functions by
    module reference and Python workers must be able to import
    ``production_ready_ds_spark`` — which fails whenever the driver
    process wasn't started from the repo directory (true for the
    verification driver, spark-submit from elsewhere, and any real
    cluster without the package deployed). By-value pickling ships the
    code inside the serialized task instead. NOTE: registration makes
    the CLOSURE'S module-global references by-value too — a kernel
    that instead does ``from ..x import y`` INSIDE its worker body
    still dies on a foreign cwd (the _synth_wav_grouped incident);
    capture from module scope.

    ``only_loaded=True`` registers only the modules already in
    sys.modules — the get_spark() fast path: a session built for
    operator-level use must not pay the whole query catalog's import
    (queries.llm alone is ~7k lines, and streaming_queries chain-loads
    analytics/traindata). Every flow still ends fully registered:
    queries/__init__ re-invokes this after its module loop (so
    catalog() users are covered the moment the modules exist), and
    ensure_runtime_confs — the foreign-session/driver path — runs the
    FULL registration. Hand-importing a single query submodule
    (bypassing catalog()) is covered at the @query decorator itself
    (queries._register_defining_module_by_value — import time IS
    decoration time), so no flow that can run a query is left
    by-reference.

    Import errors are deliberately NOT swallowed: a module on this
    list that cannot import must fail loudly here, not silently fall
    back to by-reference pickling (the exact incident class the list
    exists to kill). Only the registration call itself is guarded
    (already registered / old cloudpickle API)."""
    import importlib
    import sys

    from pyspark import cloudpickle

    for name in UDF_MODULES:
        full = f"{__package__}.{name}"
        if only_loaded and full not in sys.modules:
            continue
        mod = importlib.import_module(full)
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:  # pragma: no cover - already registered / old API
            pass


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set the confs this engine relies on even when handed a foreign
    session (e.g. the verification driver's). All of these are
    runtime-settable in Spark 4."""
    register_udf_modules()
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        (
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        ),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - immutable conf on some builds
            pass
    return spark
