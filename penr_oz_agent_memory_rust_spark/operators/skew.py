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


def skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """★ pre-flight join/agg skew diagnostic: the top_n heaviest values of
    `key` with their row count, share of the table, and skew factor
    (count / mean-count-per-key) — the number that says whether a planned
    join on `key` needs salting (skew_factor in the hundreds), AQE's
    skew-join split (tens), or nothing. Running this BEFORE a 100 TB join
    costs one partial-aggregated count; discovering skew from a straggler
    task costs the job.

    Shape: groupBy(key).count (map-side combinable; the exchange carries
    one row per distinct key), a 1-row global stats aggregate broadcast
    back, and a TakeOrderedAndProject for the top-N — no window, no sort
    of the full key set. Output: (key, cnt, frac, skew_factor), count
    desc, key asc on ties; fractions 6dp for the oracle."""
    from penr_oz_agent_memory_rust_spark.operators import topk

    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("__total"), F.count("*").alias("__n_keys")
    )
    scored = counts.crossJoin(F.broadcast(stats)).select(
        key,
        "cnt",
        F.round(F.col("cnt") * 1.0 / F.col("__total"), 6).alias("frac"),
        # cnt goes double BEFORE multiplying by n_keys: a long*long product
        # first would silently overflow at ~1e12 rows x 1e7 keys (ADVICE r7)
        F.round(
            F.col("cnt") * 1.0 / F.col("__total") * F.col("__n_keys"), 6
        ).alias("skew_factor"),
    )
    return topk.top_k(scored, "cnt", top_n, tiebreak=key)
