"""Plan-inspection helpers: assert the physical plan is the one we want.

Used by tests to pin scale-critical properties: parquet filter pushdown,
column pruning (ReadSchema), broadcast joins, TakeOrderedAndProject for
top-k, absence of unexpected exchanges.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in physical plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in physical plan:\n{plan}"


def count_exchanges(df: DataFrame) -> int:
    """Exchange nodes of any kind, counted once each via the formatted
    plan's detail headers ("(n) Exchange" / "(n) BroadcastExchange")."""
    plan = physical_plan(df)
    return len(re.findall(r"^\(\d+\) (?:Broadcast)?Exchange\b", plan, flags=re.M))


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges only — broadcasts move the small side, not the
    data, and don't count against a 'no-shuffle' claim."""
    plan = physical_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M))
