"""Data-quality expectations: declarative rule checks in ONE scan
(★ beyond-reference pipeline op).

A 100 TB ingest wants "null %, range, referential shape" checks without
re-scanning per rule. Each rule is a boolean SQL predicate; all rules
evaluate as conditional aggregates in a single pass (one row out per
rule), so the check costs one table scan regardless of rule count —
never one job per expectation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def validate_expectations(
    df: DataFrame, rules: dict[str, str], round_to: int = 6
) -> DataFrame:
    """Evaluate named boolean predicates over every row in one scan.

    `rules` maps rule name -> SQL predicate that should hold. Output:
    (rule, n_rows, n_violations, violation_pct), one row per rule,
    ordered by rule name. NULL predicate results count as violations
    (an unknown is not a pass).
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(sorted(rules.items())):
        aggs.append(
            F.sum(
                F.when(F.coalesce(F.expr(pred), F.lit(False)), 0).otherwise(1)
            ).alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").cast("bigint").alias("n_rows"),
            F.col(f"__v{i}").cast("bigint").alias("n_violations"),
            F.round(F.col(f"__v{i}") * 100.0 / F.col("__n"), round_to).alias(
                "violation_pct"
            ),
        )
        for i, (name, _) in enumerate(sorted(rules.items()))
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.rule", "r.n_rows", "r.n_violations", "r.violation_pct"
    )


def observe_expectations(
    df: DataFrame, rules: dict[str, str]
):
    """The in-flight twin of validate_expectations: attach the same
    conditional aggregates to the frame via df.observe(), so the metrics
    materialize as a SIDE PRODUCT of whatever action the caller already
    runs (the shard write, the ingest count) — zero extra scans, where
    validate_expectations costs one. Returns (df, Observation); read
    `observation.get` after an action on the returned frame. Metric keys:
    `n_rows` and `violations__<rule>`.

    This is how a 100 TB export job checks itself: the write IS the scan,
    and the expectations ride along on it.
    """
    from pyspark.sql import Observation

    if not rules:
        raise ValueError("rules must be non-empty")
    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in sorted(rules.items()):
        aggs.append(
            F.sum(
                F.when(F.coalesce(F.expr(pred), F.lit(False)), 0).otherwise(1)
            ).alias(f"violations__{name}")
        )
    return df.observe(obs, *aggs), obs
