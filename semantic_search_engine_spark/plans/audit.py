"""Physical-plan audit helpers: assert the plan you meant to write.

Used by tests and by hand while iterating (`.explain`-driven
development): a scan that doesn't push filters, a join that should
have broadcast, or a codegen break in the hot path is a perf bug even
when results are right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan reports the filter pushed (e.g. 'In(term')."""
    return f"PushedFilters: [" in physical_plan(df) and fragment in physical_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def is_take_ordered(df: DataFrame) -> bool:
    """orderBy().limit(k) lowered to the distributed top-k operator."""
    return "TakeOrderedAndProject" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages; plan toString marks codegen
    operators with '*(id)' (formatted explain spells WholeStageCodegen)."""
    import re

    plan = physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids) if ids else plan.count("WholeStageCodegen")
