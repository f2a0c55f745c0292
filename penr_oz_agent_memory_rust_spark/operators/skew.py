"""Skew-handling utilities: key salting for hot-key joins and aggregations.

AQE's skew-join handles most runtime skew (enabled in session.py); salting
is the explicit tool for the pathological case — one key holding a double-
digit percentage of a 100 TB table — where even a split partition overwhelms
a task. The pattern: explode the small side × salt, scatter the big side's
hot keys across salts, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in `big`.

    big rows get a random-but-deterministic salt in [0, n_salts) (hash of
    the full row would break joins; a per-row monotonic id modulo works and
    keeps the plan deterministic for tests); small rows are replicated once
    per salt. Result equals big.join(small, key, how) exactly.
    """
    salt_col = (F.monotonically_increasing_id() % n_salts).cast("int")
    big_s = big.withColumn("__salt", salt_col)
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count_by_key(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group-by: partial count on
    (key, salt), then final sum on key — the manual form of the map-side
    partial aggregation Spark already does for algebraic aggregates; useful
    as the template for non-algebraic UDAF-style reductions."""
    salt_col = (F.monotonically_increasing_id() % n_salts).cast("int")
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("count"))
