"""Physical-plan assertions — the engine's "is Catalyst doing its job" gate.

The optimizer work the reference pushes to SQLite/PostgreSQL (SURVEY §4) is
free in Spark *only if the plan actually shows it*: filters reaching the
parquet scan, projections pruning columns, small dims broadcast, iterative
joins not re-shuffling the persisted edge side. These helpers turn those
properties into testable predicates so a regression (e.g. a UDF blocking
pushdown) fails CI instead of silently costing 100× at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "runtime_exchange_count",
    "wholestage_codegen_spans",
]


def physical_plan(df: DataFrame) -> str:
    """The executed-plan string (what .explain() prints)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of every scan in the plan."""
    plan = physical_plan(df)
    return " | ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan (pruning check)."""
    plan = physical_plan(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        out.append([c.split(":")[0] for c in m.split(",") if c])
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def runtime_exchange_count(df: DataFrame) -> int:
    """Exchanges outside cached (InMemoryRelation) subtrees — the shuffles a
    new action actually pays for. Cached subtrees were paid once at persist
    time; ReusedExchange is free."""
    plan = physical_plan(df)
    count = 0
    for line in plan.splitlines():
        if "ReusedExchange" in line or "Exchange hashpartitioning" not in line:
            continue
        # inside an InMemoryRelation subtree the line is indented under a
        # cached branch; those exchanges replay from cache, not recompute
        count += 1
    # subtract exchanges that sit below an InMemoryRelation marker
    lines = plan.splitlines()
    cached_depth: int | None = None
    paid = 0
    for line in lines:
        indent = len(line) - len(line.lstrip(" :+-*("))
        if "InMemoryRelation" in line:
            if cached_depth is None or indent < cached_depth:
                cached_depth = indent
            continue
        if cached_depth is not None and indent <= cached_depth and line.strip():
            cached_depth = None
        if cached_depth is None and "Exchange hashpartitioning" in line and "ReusedExchange" not in line:
            paid += 1
    return paid


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more stays JVM-side)."""
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))
