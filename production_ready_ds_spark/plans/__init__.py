"""Physical-plan inspection helpers (scale-shape auditing)."""

from .audit import (
    broadcast_join_count,
    exchange_input_columns,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    whole_stage_codegen_ids,
)

__all__ = [
    "broadcast_join_count",
    "exchange_input_columns",
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
    "shuffle_count",
    "whole_stage_codegen_ids",
]
