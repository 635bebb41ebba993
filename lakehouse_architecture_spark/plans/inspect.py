"""Physical-plan inspection helpers — the 100 TB design-point guardrails.

A query that is correct at sf0.01 but plans a cartesian product or a
non-broadcast dimension join will fall over at cluster scale. These helpers
turn ``.explain("formatted")`` output into assertions the test suite runs,
so scale regressions fail CI instead of production:

* dimension joins must be BroadcastHashJoin (no shuffle of the fact table);
* parquet scans must carry PushedFilters (predicate reaches the reader);
* no BroadcastNestedLoopJoin / CartesianProduct unless explicitly intended;
* whole-stage codegen should cover the hot expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_summary(df: DataFrame) -> dict[str, int]:
    """Operator histogram of the physical plan."""
    plan = formatted_plan(df)
    ops = {}
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith(("* ", "+- ", ":- ")) or (line and line[0].isdigit()):
            name = line.split("(")[0].strip("*+-: ").split()[-1] if "(" in line else ""
            if name:
                ops[name] = ops.get(name, 0) + 1
    return ops


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    if n < min_count:
        raise AssertionError(
            f"expected >= {min_count} BroadcastHashJoin, found {n}:\n{plan[:4000]}"
        )


def assert_pushed_filters(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "PushedFilters: [" not in plan or "PushedFilters: []" in plan.replace(
        "PushedFilters: [],", "PushedFilters: []"
    ):
        # at least one scan must carry a non-empty pushed filter list
        import re

        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if not any(p.strip() for p in pushed):
            raise AssertionError(f"no pushed filters in any scan:\n{plan[:4000]}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if bad in plan:
            raise AssertionError(f"{bad} in plan — will not scale:\n{plan[:4000]}")
