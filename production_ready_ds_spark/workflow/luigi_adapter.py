"""Run native workflow DAGs on a REAL Luigi scheduler when available.

The engine contract describes orchestration as "Spark jobs orchestrated
via Luigi DAG scheduler" (the reference imports luigi directly,
00_training_pipeline.py:6). Luigi is not installable in this
environment, so :mod:`.core` reimplements the used subset natively —
but the divergence from the stated approach should stay visible and
closable: this adapter wraps any native :class:`~.core.Task` DAG in
thin ``luigi.Task`` shims and hands scheduling to
``luigi.build(local_scheduler=True)``, exactly how the reference runs
(README.md:21-23 ``--local-scheduler``).

Semantics map 1:1:
- shim ``complete()`` delegates to the native task's target-existence
  check (O2 pruning — Luigi prunes complete tasks the same way);
- shim ``requires()`` re-wraps native ``deps()`` (O1 edges);
- shim ``run()`` calls the native ``run()`` body (SparkTask bodies run
  on the shared session exactly as under the native scheduler);
- native :class:`~.core.ExternalTask` maps to a shim with no ``run``
  (Luigi blocks dependents on incomplete external tasks — O3).

``tests/test_luigi_backend.py`` runs the same pipeline scenarios
against this adapter, skipped automatically when Luigi is absent, so an
environment WITH Luigi exercises both backends.
"""

from __future__ import annotations

from collections.abc import Iterable

from .core import ExternalTask, Task, WorkflowError

try:  # pragma: no cover - exercised only where luigi is installed
    import luigi  # type: ignore

    HAVE_LUIGI = True
except ImportError:  # pragma: no cover
    luigi = None
    HAVE_LUIGI = False

backend = "luigi" if HAVE_LUIGI else "native"

# task_id → native task instance; shims carry only the key (Luigi
# parameters must be hashable/serializable strings).
_REGISTRY: dict[str, Task] = {}
_SHIM_CLASSES: dict[str, type] = {}


def _shim_class(external: bool) -> type:  # pragma: no cover - luigi-only
    key = "external" if external else "task"
    if key in _SHIM_CLASSES:
        return _SHIM_CLASSES[key]

    base = luigi.ExternalTask if external else luigi.Task

    class _Shim(base):  # type: ignore[misc,valid-type]
        task_key = luigi.Parameter()

        def requires(self):
            return [wrap(d) for d in _REGISTRY[str(self.task_key)].deps()]

        def complete(self):
            return _REGISTRY[str(self.task_key)].complete()

        if not external:

            def run(self):
                _REGISTRY[str(self.task_key)].run()

    _Shim.__name__ = "NativeExternalShim" if external else "NativeTaskShim"
    _SHIM_CLASSES[key] = _Shim
    return _Shim


def wrap(task: Task):  # pragma: no cover - luigi-only
    """Wrap one native task instance as a luigi.Task shim (stable per
    task_id, so Luigi's own instance-caching dedups the DAG)."""
    _REGISTRY[task.task_id] = task
    return _shim_class(isinstance(task, ExternalTask))(task_key=task.task_id)


def build_with_luigi(tasks: Iterable[Task], *, workers: int = 1) -> bool:
    """Schedule a native DAG with Luigi's local scheduler; returns True
    when every requested task completed. Raises if Luigi is absent —
    callers wanting transparent fallback use :func:`build_any`."""
    if not HAVE_LUIGI:
        raise WorkflowError("luigi is not installed — use workflow.core.build")
    # Fresh registry per build: without this, task instances (and any
    # state they capture) accumulate for the life of the process, and a
    # task_id reused by a later DAG with a different instance would
    # rebind earlier shims mid-flight. Builds are sequential per process
    # (Luigi local scheduler); deps re-register through wrap() below.
    _REGISTRY.clear()
    shims = [wrap(t) for t in tasks]
    return bool(
        luigi.build(
            shims,
            local_scheduler=True,
            workers=workers,
            detailed_summary=False,
        )
    )


def build_any(tasks: Iterable[Task]) -> None:
    """Run a DAG on the best available backend: real Luigi when
    importable, the native scheduler otherwise."""
    tasks = list(tasks)
    if HAVE_LUIGI:
        if not build_with_luigi(tasks):
            raise WorkflowError("luigi.build reported failure")
        return
    from .core import build

    build(tasks)
