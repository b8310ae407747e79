"""Physical-plan inspection helpers (the engine's self-checks).

The reference has no planner (its "plan" is a model-name string triple,
SURVEY.md §3); ours is Catalyst, and these helpers make plan properties
assertable: hot-path purity (no row-at-a-time Python), pushdown, and
broadcast placement. Used by tests/test_plan_hygiene.py and usable in
notebooks/CI against production jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ARROW_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def uses_per_row_python(df: DataFrame) -> bool:
    """True if the plan contains row-at-a-time Python (BatchEvalPython) —
    the one node class banned from this engine (BASELINE.md hot-path
    constraint)."""
    return "BatchEvalPython" in physical_plan(df)


def python_nodes(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    found = [n for n in ARROW_NODES + ("BatchEvalPython",) if n in plan]
    return found


def has_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def pushed_filters(df: DataFrame) -> str:
    plan = physical_plan(df)
    out = []
    for line in plan.splitlines():
        if "PushedFilters" in line:
            out.append(line.split("PushedFilters:")[1].split("]")[0] + "]")
    return "; ".join(out)


def assert_scalable_plan(df: DataFrame, allow_arrow: bool = True) -> None:
    """Raise if the plan violates the engine's scale contract."""
    plan = physical_plan(df)
    if "BatchEvalPython" in plan:
        raise AssertionError("per-row Python (BatchEvalPython) in plan")
    if not allow_arrow:
        for n in ARROW_NODES:
            if n in plan:
                raise AssertionError(f"unexpected Python node {n} in plan")
