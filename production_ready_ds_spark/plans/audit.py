"""Physical-plan auditing: parse .explain output into checkable facts.

The scale discipline this engine claims — filters pushed to the scan,
columns pruned, small dims broadcast, minimal shuffles, wide codegen
stages — is enforceable, not aspirational: tests/test_plans.py asserts
these properties on the headline queries so a regression that silently
de-optimizes a plan fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning proof)."""
    schemas: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    s = explain_str(df, "simple")
    return "BroadcastHashJoin" in s or "BroadcastNestedLoopJoin" in s


def broadcast_join_count(df: DataFrame) -> int:
    # simple mode lists each operator exactly once (formatted mode
    # repeats every node in the detail section → double counting)
    s = explain_str(df, "simple")
    return s.count("BroadcastHashJoin") + s.count("BroadcastNestedLoopJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (each is a full shuffle of its
    input — THE scale-limiting primitive)."""
    s = explain_str(df, "simple")
    return len(re.findall(r"\bExchange\b", s)) - len(re.findall(r"\bBroadcastExchange\b", s))


def exchange_input_columns(df: DataFrame) -> list[list[str]]:
    """Column names flowing INTO each shuffle Exchange (formatted-plan
    ``(N) Exchange`` sections' ``Input [..]`` line, attribute ids
    stripped). The shuffle-width audit: a narrow-join claim ("text
    never shuffles") is checkable as 'no Exchange input contains the
    wide column' — matching on the Exchange's partitioning ARGUMENTS
    would be vacuous, keys are narrow by construction."""
    out: list[list[str]] = []
    blocks = re.split(r"\(\d+\) Exchange", explain_str(df))
    for block in blocks[1:]:
        m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", block)
        if m:
            cols = [c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()]
            out.append(cols)
    return out


def whole_stage_codegen_ids(df: DataFrame) -> set[int]:
    """Distinct WholeStageCodegen stage ids (wider = more operators
    fused into JVM-generated loops)."""
    return {int(m) for m in re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))}
