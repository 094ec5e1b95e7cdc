"""Physical-plan assertions — make scale properties testable.

At 100 TB the difference between a broadcast join and a shuffled join, or a
pushed-down filter versus a post-scan filter, is the whole ballgame. These
helpers let tests assert plan shape (pushdown happened, the dim was
broadcast, codegen is on) instead of hoping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_contains(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    plan = explain_str(df, mode)
    return all(n in plan for n in needles)
