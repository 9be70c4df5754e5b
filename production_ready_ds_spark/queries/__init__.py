"""Declared query catalog (SURVEY.md §2b).

Every operator the engine claims is registered here as a :class:`Query`:
a PySpark builder ``fn(spark, sf_dir) -> DataFrame`` plus (when the
semantics are deterministic and SQL-expressible) the equivalent DuckDB
oracle SQL. ``__spark_entry__.py`` at the repo root is a thin adapter
over this catalog.

Hash-match discipline (every pair obeys it):
- alias every computed column identically on both sides;
- ROUND(x, n) every double-valued output on both sides;
- group only by ints/strings/dates;
- ``events.ts`` converted via the tables.py nanos shim before use.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

_MODULES = (
    "relational",
    "joins",
    "aggregates",
    "windows",
    "scalars",
    "udfs",
    "llm",
    "events",
    "ml",
    "streaming_queries",
    "multimodal",
    "analytics",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → rows-only check
    category: str
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(
    name: str,
    *,
    sql: str | None,
    category: str,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a catalog entry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(
            name=name, fn=fn, sql=sql, category=category, doc=fn.__doc__ or "", bench=bench, tags=tags
        )
        return fn

    return wrap


def catalog() -> dict[str, Query]:
    """Import all query modules and return the full registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return dict(_REGISTRY)
