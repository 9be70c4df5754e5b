"""The same workflow scenarios as tests/test_workflow.py, scheduled by
REAL Luigi through workflow.luigi_adapter — skipped when Luigi is not
installed (it is not installable in this environment; these tests keep
the adapter honest wherever Luigi exists).
"""

from __future__ import annotations

import pytest

from production_ready_ds_spark.workflow import (
    ExternalTask,
    LocalTarget,
    Parameter,
    Task,
    WorkflowError,
)
from production_ready_ds_spark.workflow.luigi_adapter import (
    HAVE_LUIGI,
    build_any,
    build_with_luigi,
)


class _Write(Task):
    path = Parameter()
    text = Parameter(default="hi")

    def output(self):
        return LocalTarget(str(self.path))

    def run(self):
        with self.output().open("w") as f:
            f.write(str(self.text))


class _Concat(Task):
    src = Parameter()
    dst = Parameter()

    def requires(self):
        return _Write(path=str(self.src))

    def output(self):
        return LocalTarget(str(self.dst))

    def run(self):
        with self.requires().output().open() as f:
            data = f.read()
        with self.output().open("w") as f:
            f.write(data * 2)


class _Sensor(ExternalTask):
    path = Parameter()

    def output(self):
        return LocalTarget(str(self.path))


def test_build_with_luigi_raises_clearly_when_absent():
    if HAVE_LUIGI:
        pytest.skip("luigi installed — covered by the tests below")
    with pytest.raises(WorkflowError, match="not installed"):
        build_with_luigi([])


def test_build_any_falls_back_to_native(tmp_path):
    """build_any must complete the DAG on whichever backend exists."""
    dst = tmp_path / "out.txt"
    build_any([_Concat(src=str(tmp_path / "in.txt"), dst=str(dst))])
    assert dst.read_text() == "hihi"


luigi_only = pytest.mark.skipif(not HAVE_LUIGI, reason="luigi not installed")


@luigi_only
def test_luigi_runs_dag_and_prunes_complete(tmp_path):
    dst = tmp_path / "out.txt"
    task = _Concat(src=str(tmp_path / "in.txt"), dst=str(dst))
    assert build_with_luigi([task])
    assert dst.read_text() == "hihi"
    # second run: everything complete → still succeeds, nothing rewritten
    before = dst.stat().st_mtime_ns
    assert build_with_luigi([task])
    assert dst.stat().st_mtime_ns == before


@luigi_only
def test_luigi_blocks_on_missing_sensor(tmp_path):
    class Dependent(_Write):
        sensor_path = Parameter()

        def requires(self):
            return _Sensor(path=str(self.sensor_path))

    t = Dependent(path=str(tmp_path / "d.txt"), sensor_path=str(tmp_path / "missing"))
    assert not build_with_luigi([t])  # sensor unsatisfied → DAG not complete
    assert not t.complete()
