"""Physical-plan introspection: capture explain() output and assert the
plan properties that matter at 100 TB (pushdown reached the scan, the
dim side is broadcast, codegen spans the hot path). Used by
tests/test_plans.py so performance regressions fail CI, not prod.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in physical plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = explain_str(df, mode)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in physical plan:\n{plan}"
    return plan


def executed_plan_str(df: DataFrame) -> str:
    """Execute the plan and return the FINAL (post-AQE) physical plan.
    Codegen markers (`*(n)`) and runtime join selections only appear
    here — unexecuted AQE plans hide them."""
    df.collect()  # count() would build a DIFFERENT QueryExecution
    return df._jdf.queryExecution().executedPlan().toString()


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    plan = explain_str(df, "formatted")
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)
