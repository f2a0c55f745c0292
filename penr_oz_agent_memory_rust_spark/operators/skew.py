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


def hot_key_salts(
    report: DataFrame,
    key: str,
    target_factor: float = 8.0,
    max_salts: int = 64,
) -> dict:
    """Turn a `skew_report` into the targeted-salting plan: {hot key value
    -> salt fan-out}, fan-out proportional to how far the key's
    skew_factor exceeds `target_factor` (the residual skew we are willing
    to leave for AQE), capped at `max_salts`. Keys at or under the target
    are omitted — they stay on the plain join path. The report is top-N
    by construction, so the collect is bounded."""
    out = {}
    for r in report.select(key, "skew_factor").collect():
        f = float(r["skew_factor"])
        if f > target_factor:
            out[r[key]] = int(min(max_salts, max(2, -(-f // target_factor))))
    return out


def salted_join_targeted(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_salts: dict,
    how: str = "inner",
) -> DataFrame:
    """★ TARGETED hot-key salting — the production remediation
    `skew_report` feeds: only the reported hot keys fan out; every other
    key keeps plain equi-join traffic. `hot_salts` maps hot key values to
    their salt fan-out (see `hot_key_salts`).

    Shape: the hot list broadcasts onto BOTH sides (two BroadcastHashJoins
    over a list of at most top-N keys), then ONE equi-join on (key, salt):
      - big rows of a hot key take a deterministic salt in [0, fan_out);
        everything else salt 0 — no row multiplication;
      - small rows of a hot key replicate fan_out times (explode over
        sequence); everything else replicates ONCE.
    So the shuffled volume added by salting is Σ_hot fan_out extra small
    rows — not |small| × n_salts as in the blanket `salted_join` — and
    the big side's hot partitions split fan_out ways while cold keys are
    untouched. Result equals big.join(small, key, how) exactly (inner and
    left only: per-salt replication would duplicate unmatched small rows
    under right/full outer)."""
    if how not in ("inner", "left"):
        raise ValueError(f"targeted salted join supports inner|left, got {how!r}")
    if not hot_salts:
        return big.join(small, key, how)
    spark = big.sparkSession
    key_field = big.schema[key]
    from pyspark.sql import types as T

    hot_df = spark.createDataFrame(
        [(k, int(n)) for k, n in hot_salts.items()],
        T.StructType(
            [
                T.StructField(key, key_field.dataType),
                T.StructField("__n_salt", T.IntegerType()),
            ]
        ),
    )
    big_s = big.join(F.broadcast(hot_df), key, "left").withColumn(
        "__salt",
        F.when(
            F.col("__n_salt").isNotNull(),
            F.pmod(F.monotonically_increasing_id(), F.col("__n_salt")).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("__n_salt")
    small_s = (
        small.join(F.broadcast(hot_df), key, "left")
        .withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("__n_salt"), F.lit(1)) - 1)),
        )
        .drop("__n_salt")
    )
    return big_s.join(small_s, [key, "__salt"], how).drop("__salt")


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
