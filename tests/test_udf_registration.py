"""Guard: every module with worker-side Python must be registered for
cloudpickle pickle-by-value (session.UDF_MODULES). The failure this
prevents is silent at test time: an unregistered module's UDF closure
pickles its module-global references BY REFERENCE, so repo-cwd runs
(the whole test suite) pass while every foreign-cwd worker — the
verification driver, spark-submit from elsewhere, any real cluster
without the package deployed — dies on ModuleNotFoundError (the
q_wordpiece_apply incident)."""

from __future__ import annotations

import re
from pathlib import Path

import production_ready_ds_spark
from production_ready_ds_spark.session import UDF_MODULES

# Call-site markers only — module docstrings and comments mention these
# names freely. applyInPandasWithState is covered by .applyInPandas(;
# bare udf(/`@udf`, the Arrow map/apply variants, and the rdd lambda
# APIs are included so a future module using any worker-side style
# cannot slip the guard.
_MARKERS = re.compile(
    r"\bpandas_udf\s*\(|\.mapInPandas\s*\(|\.applyInPandas|"
    r"\.mapInArrow\s*\(|\.applyInArrow|"
    r"\budf\s*\(|@udf\b|\budtf\s*\(|"
    # rdd TRANSFORMATIONS ship Python lambdas to workers; bare .rdd
    # metadata access (getNumPartitions) does not
    r"\.rdd\.(?:map|flatMap|filter|foreach|mapPartitions)|"
    r"\bmapPartitions\s*\(|\.foreachPartition\s*\("
)


def _strip_comments_and_docstrings(src: str) -> str:
    # cheap but sufficient: drop full-line comments and string literals
    # that span lines (docstrings); call sites survive untouched
    src = re.sub(r"(?m)^\s*#.*$", "", src)
    src = re.sub(r'"""[\s\S]*?"""', "", src)
    src = re.sub(r"'''[\s\S]*?'''", "", src)
    return src


def test_udf_modules_all_registered():
    pkg_root = Path(production_ready_ds_spark.__file__).parent
    offenders = []
    for py in sorted(pkg_root.rglob("*.py")):
        rel = py.relative_to(pkg_root).with_suffix("")
        dotted = ".".join(rel.parts)
        if dotted in ("session",):  # the registry itself
            continue
        body = _strip_comments_and_docstrings(py.read_text())
        if _MARKERS.search(body) and dotted not in UDF_MODULES:
            offenders.append(dotted)
    assert not offenders, (
        f"modules with worker-side Python missing from session.UDF_MODULES: "
        f"{offenders} — add them or their UDFs break on foreign-cwd workers"
    )


def test_registered_modules_import():
    import importlib

    for name in UDF_MODULES:
        importlib.import_module(f"production_ready_ds_spark.{name}")


def test_hand_imported_query_submodule_registers_by_value():
    """Round-8 verdict item 6: importing ONE query submodule directly
    (no catalog(), no get_spark, no ensure_runtime_confs) must leave
    that module cloudpickle-registered by value — the @query decorator
    is the hook, so decoration time is import time. Subprocess: this
    test process has long since imported everything."""
    import subprocess
    import sys
    from pathlib import Path

    repo = str(Path(production_ready_ds_spark.__file__).parent.parent)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import production_ready_ds_spark.queries.udfs as m\n"
        "from pyspark import cloudpickle\n"
        "reg = cloudpickle.list_registry_pickle_by_value()\n"
        "assert m.__name__ in {getattr(x, '__name__', x) for x in reg}\n"
        "print('BYVALUE-OK')\n" % repo
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/tmp",
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "BYVALUE-OK" in out.stdout
