"""Plan advisor: static anti-pattern audit of a physical plan (★ ops
utility). `analyze(df)` returns typed findings — the checklist a reviewer
runs on `.explain("formatted")` before a 100 TB run, encoded once:

- CARTESIAN           CartesianProduct / non-broadcast nested loop: O(N·M)
                      pair generation; at scale this job never finishes.
- ROW_PYTHON          BatchEvalPython (row-at-a-time Python UDF): ~10-100×
                      slower than Arrow-batched pandas UDFs; breaks
                      whole-stage codegen around it.
- SORT_AGGREGATE      SortAggregate instead of HashAggregate/ObjectHash:
                      pays a per-partition sort on the grouping key —
                      usually a non-hashable agg buffer or exotic type.
- GLOBAL_SORT_LIMIT   Sort + GlobalLimit instead of TakeOrderedAndProject:
                      a total sort of the input to answer a top-k.
- UNPUSHED_FILTER     a parquet scan whose PushedFilters is empty while a
                      Filter sits in the plan: predicate either
                      non-convertible (UDF/regex on the filter path) or
                      blocked by a projection — row groups that could be
                      skipped will be read.
- MANY_SHUFFLES       shuffle-exchange count above `max_shuffles`: each one
                      is a full write+read of the stream; chains usually
                      mean a missed co-partitioning or an unexploited
                      broadcast.

Severity is "critical" for the first two (wrong at any scale) and "warn"
for the rest (legitimate in specific shapes — e.g. an intentional
broadcast-1-row crossJoin reads as CARTESIAN-adjacent but uses
BroadcastNestedLoopJoin with a 1-row side, which this advisor permits via
the broadcast exemption). The whole gate suite is swept in
tests/test_plan_advisor.py: zero criticals across every `queries()` plan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from penr_oz_agent_memory_rust_spark.plans.explain import physical_plan


@dataclass(frozen=True)
class Finding:
    code: str
    severity: str  # "critical" | "warn"
    detail: str


def _nodes(plan: str) -> list[str]:
    """Node names from the formatted plan's detail headers '(n) NodeName'."""
    return re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, flags=re.M)


def analyze(
    df: DataFrame,
    max_shuffles: int = 4,
    allow_global_sort: bool = False,
) -> list[Finding]:
    plan = physical_plan(df)
    return analyze_plan_text(plan, max_shuffles=max_shuffles, allow_global_sort=allow_global_sort)


def analyze_plan_text(
    plan: str, max_shuffles: int = 4, allow_global_sort: bool = False
) -> list[Finding]:
    findings: list[Finding] = []
    nodes = _nodes(plan)

    if "CartesianProduct" in nodes:
        findings.append(
            Finding("CARTESIAN", "critical", "CartesianProduct joins every pair of rows")
        )

    if "BatchEvalPython" in nodes:
        findings.append(
            Finding(
                "ROW_PYTHON",
                "critical",
                "row-at-a-time Python UDF (BatchEvalPython) in the plan — "
                "use a pandas UDF / mapInPandas",
            )
        )

    if "SortAggregate" in nodes:
        findings.append(
            Finding(
                "SORT_AGGREGATE",
                "warn",
                "SortAggregate pays a per-partition sort; check the agg "
                "buffer type (hash aggregation is the fast path)",
            )
        )

    # a global top-k should be TakeOrderedAndProject; Sort directly under
    # GlobalLimit means the whole input was sorted first
    if not allow_global_sort:
        m = re.search(r"GlobalLimit[\s\S]{0,200}?^\(\d+\) Sort\b", plan, flags=re.M)
        if m and "TakeOrderedAndProject" not in nodes:
            findings.append(
                Finding(
                    "GLOBAL_SORT_LIMIT",
                    "warn",
                    "Sort feeding GlobalLimit — a bounded-heap "
                    "TakeOrderedAndProject answers top-k without the sort",
                )
            )

    # scans with an empty PushedFilters while the plan filters somewhere
    if "Filter" in nodes:
        empty_pushes = len(re.findall(r"PushedFilters: \[\]", plan))
        if empty_pushes and "Scan parquet" in plan:
            findings.append(
                Finding(
                    "UNPUSHED_FILTER",
                    "warn",
                    f"{empty_pushes} parquet scan(s) with empty PushedFilters "
                    "below a Filter — predicate not reaching the reader",
                )
            )

    shuffles = len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.M))
    if shuffles > max_shuffles:
        findings.append(
            Finding(
                "MANY_SHUFFLES",
                "warn",
                f"{shuffles} shuffle exchanges (> {max_shuffles}) — look for a "
                "reusable partitioning, bucketed join, or broadcast",
            )
        )

    return findings


def criticals(findings: list[Finding]) -> list[Finding]:
    return [f for f in findings if f.severity == "critical"]
