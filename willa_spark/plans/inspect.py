"""Physical-plan inspection helpers — the engine's scale guardrails.

Used by perf tests to assert plan shape, not just results: a correct
query with a wrong plan (missed broadcast, lost pushdown, extra
exchange) is a 100 TB incident waiting to happen. The reference has no
plan stage at all (SURVEY §4); these helpers are how we keep Catalyst
honest about the plans we designed for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (excluding
    AQE reused/broadcast exchanges)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange (?:hash|range|rangepartitioning|SinglePartition)", plan)) or len(
        re.findall(r"\bExchange\b(?! reuse)", plan)
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string — unlike executedPlan toString,
    scan details (PushedFilters, ReadSchema) are printed untruncated."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries that reached a file scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))
