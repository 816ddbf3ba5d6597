"""Plan-introspection helpers (SURVEY.md §2.2 B30).

Used by tests and the bench to assert the physical plans are the ones
we'd want at 100 TB: filters pushed into the parquet scan, dimension
joins broadcast, expressions inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True when the parquet scan shows a pushed filter containing
    ``fragment`` (e.g. a column name)."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line and "[]" not in line
        for line in plan.splitlines()
    )


def reads_only_columns(df: DataFrame, allowed: set[str]) -> bool:
    """True when every parquet ReadSchema in the plan touches only
    ``allowed`` columns (column pruning worked)."""
    import re

    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            cols = set(re.findall(r"(\w+):", line.split("ReadSchema")[1]))
            if not cols <= allowed:
                return False
    return True


def has_broadcast_join(df: DataFrame) -> bool:
    s = df._jdf.queryExecution().executedPlan().toString()
    return "BroadcastHashJoin" in s or "BroadcastNestedLoopJoin" in s


def codegen_stage_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return plan.count("WholeStageCodegen")
