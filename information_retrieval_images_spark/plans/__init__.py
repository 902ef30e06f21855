"""Plan inspection helpers: assert the physical plans we designed for.

There is no custom Catalyst rule in this engine (SURVEY.md §4.2) — the
"optimizer" is data layout + declarative plans. These helpers make the
intended physical properties testable: pushed filters reach the scan,
small-side joins broadcast, codegen spans cover the relational glue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan carries a pushed filter mentioning fragment."""
    plan = formatted_plan(df)
    return any("PushedFilters" in line and fragment in line for line in plan.splitlines())


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema — verifies column pruning."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            cols += re.findall(r"(\w+):", line.split("ReadSchema")[1])
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (lower is better).

    Counts the node-detail headers ``(N) Exchange`` of the formatted plan so
    each operator is counted once (the tree rendering repeats them)."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange", line.strip()) and "Reused" not in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)
