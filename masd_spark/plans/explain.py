"""Physical-plan inspection helpers.

Scale guarantees ("this filter reaches the scan", "this join broadcasts",
"this pipeline shuffles exactly once") rot silently as code evolves —
these helpers make them assertable in tests (tests/test_plans.py), the
same way correctness is asserted against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final physical plan string (post-AQE where applicable)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — those are the cheap kind)."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def count_broadcast_joins(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mention ``fragment``."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[list[str]]:
    """Column lists of every parquet scan (pruning check). Parsed from the
    FileScan output list — plan strings truncate before ReadSchema."""
    import re

    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", physical_plan(df)):
        cols = [
            c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()
        ]
        out.append(cols)
    return out


def has_take_ordered(df: DataFrame) -> bool:
    """True if order-by+limit planned as TakeOrderedAndProject (per-
    partition heaps, no global sort)."""
    return "TakeOrderedAndProject" in physical_plan(df)
