"""Workflow-layer semantics (reference O1-O4 behaviors, SURVEY.md §5.2-4):
completeness pruning, idempotence, backfill windows, sensor blocking,
atomic writes, cycle detection. Pure Python — no Spark session."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from production_ready_ds_spark.workflow import (
    DateParameter,
    ExternalTask,
    LocalTarget,
    Parameter,
    Task,
    WorkflowError,
    build,
    range_daily,
)


class Emit(Task):
    name = Parameter()
    root = Parameter()
    needs = Parameter(default="")

    def requires(self):
        return [
            Emit(name=d, root=self.root) for d in self.needs.split("+") if d
        ]

    def output(self):
        return LocalTarget(os.path.join(self.root, f"{self.name}.txt"))

    def run(self):
        with self.output().open("w") as f:
            f.write(self.name)


def test_build_runs_dependencies_first(tmp_path):
    root = str(tmp_path)
    res = build([Emit(name="c", root=root, needs="a+b")])
    assert res["ran"].index("Emit(name=a,needs=,root=%s)" % root) < res["ran"].index(
        "Emit(name=c,needs=a+b,root=%s)" % root
    )
    assert (tmp_path / "c.txt").read_text() == "c"


def test_completeness_pruning_and_idempotence(tmp_path):
    root = str(tmp_path)
    first = build([Emit(name="c", root=root, needs="a+b")])
    assert len(first["ran"]) == 3
    second = build([Emit(name="c", root=root, needs="a+b")])
    assert second["ran"] == []
    assert len(second["skipped"]) == 3


def test_partial_recompute_only_missing_target(tmp_path):
    """Reference O2: delete one day's output → only that task re-runs."""
    root = str(tmp_path)
    build([Emit(name="c", root=root, needs="a+b")])
    (tmp_path / "a.txt").unlink()
    res = build([Emit(name="c", root=root, needs="a+b")])
    assert [t for t in res["ran"]] == [f"Emit(name=a,needs=,root={root})"]


class Sensor(ExternalTask):
    root = Parameter()

    def output(self):
        return LocalTarget(os.path.join(self.root, "external.txt"))


class NeedsSensor(Task):
    root = Parameter()

    def requires(self):
        return Sensor(root=self.root)

    def output(self):
        return LocalTarget(os.path.join(self.root, "dependent.txt"))

    def run(self):
        with self.output().open("w") as f:
            f.write("ok")


def test_sensor_blocks_instead_of_triggering(tmp_path):
    """Reference O3: missing external artifact blocks dependents."""
    root = str(tmp_path)
    res = build([NeedsSensor(root=root)])
    assert res["ran"] == []
    assert len(res["blocked"]) == 2
    assert not (tmp_path / "dependent.txt").exists()

    # satisfy the sensor out-of-band → DAG proceeds
    (tmp_path / "external.txt").write_text("model")
    res2 = build([NeedsSensor(root=root)])
    assert res2["ran"] == [f"NeedsSensor(root={root})"]


class Daily(Task):
    date = DateParameter()
    root = Parameter()

    def output(self):
        return LocalTarget(os.path.join(self.root, f"{self.date.isoformat()}.txt"))

    def run(self):
        with self.output().open("w") as f:
            f.write(str(self.date))


def test_range_daily_backfill_window(tmp_path):
    """Reference O4: 4-day trailing window, newest first; complete days
    are pruned on re-run."""
    root = str(tmp_path)
    stop = dt.date(2024, 1, 10)
    tasks = range_daily(Daily, stop=stop, days_back=4, root=root)
    assert [t.date for t in tasks] == [
        dt.date(2024, 1, 10), dt.date(2024, 1, 9), dt.date(2024, 1, 8), dt.date(2024, 1, 7),
    ]
    res = build(tasks)
    assert len(res["ran"]) == 4

    # late-data semantics: day N-2 invalidated → only it recomputes
    (tmp_path / "2024-01-08.txt").unlink()
    res2 = build(range_daily(Daily, stop=stop, days_back=4, root=root))
    assert res2["ran"] == [f"Daily(date=2024-01-08,root={root})"]
    assert len(res2["skipped"]) == 3


def test_atomic_write_no_partial_output(tmp_path):
    class Boom(Task):
        root = Parameter()

        def output(self):
            return LocalTarget(os.path.join(self.root, "boom.txt"))

        def run(self):
            with self.output().open("w") as f:
                f.write("partial")
                raise RuntimeError("mid-write crash")

    with pytest.raises(RuntimeError, match="mid-write crash"):
        build([Boom(root=str(tmp_path))])
    # no partial file, no temp litter
    assert list(tmp_path.iterdir()) == []


def test_cycle_detection():
    class A(Task):
        def requires(self):
            return B()

        def output(self):
            return LocalTarget("/nonexistent/a")

    class B(Task):
        def requires(self):
            return A()

        def output(self):
            return LocalTarget("/nonexistent/b")

    with pytest.raises(WorkflowError, match="cycle"):
        build([A()])


def test_task_identity_and_params():
    t1 = Daily(date="2024-01-05", root="/r")
    t2 = Daily(date=dt.date(2024, 1, 5), root="/r")
    assert t1 == t2 and hash(t1) == hash(t2)
    with pytest.raises(TypeError, match="unknown parameter"):
        Daily(date="2024-01-05", root="/r", nope=1)
    with pytest.raises(TypeError, match="missing parameter"):
        Daily(date="2024-01-05")
