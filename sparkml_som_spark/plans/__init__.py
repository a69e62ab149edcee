"""Physical-plan inspection helpers: assert that the plans we designed
for are the plans Spark actually runs (pushdown, broadcast, codegen,
no unexpected shuffles). Used by tests and by `python -m
sparkml_som_spark.plans` for ad-hoc auditing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (each operator
    appears once as a numbered detail header `(N) Exchange`)."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def assert_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan received at least one pushed filter."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "PushedFilters: []" not in line:
            return True
    return False


def has_codegen(df: DataFrame) -> bool:
    """True if the executed plan has at least one whole-stage-codegen
    span (`*(N)` stage prefixes in simple mode). AQE only finalizes
    codegen stages at execution, so this runs the query first."""
    df.collect()  # count() would build a different query execution
    simple = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    return "*(" in simple


def assert_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)
