"""Ordered-funnel conversion analysis (★ beyond-reference OLAP op).

"Of the users who did A, how many then did B, then C?" — each step must
occur strictly after the user's earliest completion time of the previous
step (the standard first-touch funnel), optionally within a horizon of
the funnel's start.

Scale shape: step 1 is one groupBy(user) min-aggregate; every further
step is a hash join on user_id against that (already user-partitioned)
frame plus another min-aggregate — k steps cost k-1 co-partitioned joins,
all shuffles on the same key, so AQE/bucketing collapses them on a real
cluster. No windows, no per-user sort: only (user, ts) pairs move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_user_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each funnel prefix.

    Output: (user, t0, t1, ... t{k-1}); t_i is NULL when the user never
    completed step i after t_{i-1} (and, if `within_seconds` is set,
    within that horizon of t0). Rows are users who completed step 0.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    u = F.col(user_col)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts_col).alias("t0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = events.filter(F.col(type_col) == step).select(
            u.alias("user"), F.col(ts_col).alias("__ts")
        )
        joined = cur.join(nxt, "user", "left").withColumn(
            "__ok",
            F.col("__ts").isNotNull()
            & (F.col("__ts") > F.col(f"t{i - 1}"))
            & (
                F.lit(True)
                if within_seconds is None
                else (
                    F.unix_timestamp("__ts")
                    <= F.unix_timestamp("t0") + F.lit(within_seconds)
                )
            ),
        )
        keep = [F.first(f"t{j}").alias(f"t{j}") for j in range(i)]
        cur = joined.groupBy("user").agg(
            *keep,
            F.min(F.when(F.col("__ok"), F.col("__ts"))).alias(f"t{i}"),
        )
    return cur


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Funnel summary: (step_idx, step, n_users) — users whose earliest
    chain reaches each step. n_users is non-increasing by construction."""
    times = funnel_user_times(
        events, steps, user_col, type_col, ts_col, within_seconds
    )
    counts = times.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(len(steps))]
    )
    rows = [
        F.struct(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col(f"n{i}").cast("bigint").alias("n_users"),
        )
        for i, s in enumerate(steps)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users"
    )
