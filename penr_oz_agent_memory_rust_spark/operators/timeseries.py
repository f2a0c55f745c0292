"""Time-series regularization: resample to a fixed grid, fill gaps, and
interpolate — the `time_bucket_gapfill` / `date_spine` primitive that turns
irregular event streams into model-ready regular series (feature windows,
seasonality baselines, drift monitors all assume a dense grid).

Scale shape: the only shuffle is the (keys, bucket) aggregation; the grid is
generated per key from ONE (min, max) row via `sequence` + `explode`, so grid
size is bounded by time-range/step per key and never by the fact-row count.
Interpolation windows partition by key — a per-series sort, embarrassingly
parallel across keys (a skewed single giant series would serialize; for that
shape, range-bucket the series first and seed each bucket with its boundary
observations).

Buckets are bigint epoch seconds (engine-portable: DuckDB mirrors them with
`floor(epoch(ts)/step)*step`, no timestamp-resolution hazards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """One row per (keys, bucket) with the aggregated value and the
    observation count. Output: keys + (bucket bigint, v double, n_obs)."""
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(step_seconds)) * F.lit(step_seconds)
    ).cast("bigint")
    agg_fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[agg]
    return (
        df.withColumn("bucket", bucket)
        .groupBy(*keys, "bucket")
        .agg(agg_fn(value_col).cast("double").alias("v"), F.count("*").alias("n_obs"))
    )


def gap_fill(observed: DataFrame, keys: list[str], step_seconds: int) -> DataFrame:
    """Densify each key's series onto the full [min, max] bucket grid.
    Missing buckets appear with v = null, n_obs = 0. The grid explodes from
    one aggregate row per key — never from fact rows."""
    bounds = observed.groupBy(*keys).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.lit(step_seconds).cast("bigint"))
        ).alias("bucket"),
    )
    return grid.join(observed, [*keys, "bucket"], "left").withColumn(
        "n_obs", F.coalesce(F.col("n_obs"), F.lit(0))
    )


def interpolate(filled: DataFrame, keys: list[str], method: str = "linear") -> DataFrame:
    """Fill null `v` values per key series, ordered by bucket.

    method='locf'   last observation carried forward (trailing nulls backfill
                    from the next observation so the grid stays dense).
    method='linear' straight line between the surrounding observations;
                    edges fall back to the nearest observation.

    Adds `value_filled` (double) and `is_gap` (the bucket had no
    observation). Window frames are running (unbounded-to-current /
    current-to-unbounded) so Spark evaluates them in one pass per
    direction — no per-row rescans."""
    fwd = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    with_bounds = (
        filled.withColumn("__pv", F.last("v", ignorenulls=True).over(fwd))
        .withColumn("__pb", F.last(obs_bucket, ignorenulls=True).over(fwd))
        .withColumn("__nv", F.first("v", ignorenulls=True).over(bwd))
        .withColumn("__nb", F.first(obs_bucket, ignorenulls=True).over(bwd))
    )
    if method == "locf":
        value = F.coalesce(F.col("v"), F.col("__pv"), F.col("__nv"))
    elif method == "linear":
        both = F.col("__pv").isNotNull() & F.col("__nv").isNotNull()
        # explicit parens: pv + ((nv - pv) * ((bucket - pb) / (nb - pb)));
        # the oracle SQL mirrors this exact association for f64 parity
        frac = (F.col("bucket") - F.col("__pb")) / (F.col("__nb") - F.col("__pb"))
        line = F.col("__pv") + ((F.col("__nv") - F.col("__pv")) * frac)
        value = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
            F.when(both, line).otherwise(F.coalesce(F.col("__pv"), F.col("__nv")))
        )
    else:
        raise ValueError(f"unknown interpolation method: {method}")
    return (
        with_bounds.withColumn("value_filled", value.cast("double"))
        .withColumn("is_gap", F.col("v").isNull())
        .drop("__pv", "__pb", "__nv", "__nb")
    )


def rolling(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    window_rows: int = 24,
    round_to: int | None = 6,
) -> DataFrame:
    """Trailing moving-window statistics per key series: mean, exact median
    (interpolated, matching DuckDB/ANSI percentile_cont 0.5), sample stddev,
    and the window's observation count (ramp-up rows carry fewer).

    One window pass per series — the frame is row-bounded (last
    `window_rows` rows), so memory per partition is O(window), and the sort
    is the same per-key order every downstream window op reuses. The moving
    median is the robust baseline for spike detection where a moving mean
    gets dragged by the spike itself.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    # ONE window evaluation (the frame's value list), everything derived
    # from its SORTED array: (a) Spark's median aggregate rejects window
    # frames (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), and (b) sliding
    # window sums drift engine-specifically (DuckDB's subtract-on-slide
    # accumulates ~1e-9 error along a series — measured flipping 6dp
    # roundings vs Spark's per-frame sums), so mean/std fold over the
    # sorted array in a fixed order both engines reproduce bit-exactly.
    # The frame is window_rows-bounded, so the array stays O(window)/row.
    arr = F.array_sort(F.collect_list(value_col).over(w))
    n = F.size(arr)
    s = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)
    ssq = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)
    mean = s / n
    half = F.floor(n / 2).cast("int")
    med = F.when(
        n % 2 == 1, F.get(arr, half)
    ).otherwise((F.get(arr, half - 1) + F.get(arr, half)) / 2.0)
    sd = F.when(
        n > 1, F.sqrt(F.greatest(F.lit(0.0), (ssq - (s * s) / n) / (n - 1)))
    )
    if round_to is not None:
        mean, med, sd = (F.round(c, round_to) for c in (mean, med, sd))
    return (
        df.withColumn("roll_mean", mean)
        .withColumn("roll_median", med)
        .withColumn("roll_std", sd)
        .withColumn("roll_n", F.count(value_col).over(w).cast("bigint"))
    )


def gap_fill_interpolate(
    observed: DataFrame, keys: list[str], step_seconds: int, method: str = "linear"
) -> DataFrame:
    """Fused gap_fill + interpolate: ONE per-key window pass (lead) and an
    explode — no grid/obs join, no second window direction. Each observed
    row owns the gap run up to (exclusive) the next observation and emits
    those buckets itself; the interpolation endpoints (this row's value,
    the lead value) are already on the row when the gap explodes, so
    value_filled is a pure projection. Produces exactly the same rows as
    gap_fill()+interpolate() for 'linear' and trailing-LOCF semantics
    (the dense grid spans [min, max] observed buckets per key, and those
    endpoints are observations — leading/trailing gaps cannot exist).

    At scale this halves the shuffles of the two-step form: resample's
    aggregation is the only exchange, then one per-key sort.
    """
    if method not in ("linear", "locf"):
        raise ValueError(f"unknown interpolation method: {method}")
    w = Window.partitionBy(*keys).orderBy("bucket")
    step = F.lit(step_seconds).cast("bigint")
    src = (
        observed.withColumn("__nb", F.lead("bucket").over(w))
        .withColumn("__nv", F.lead("v").over(w))
        .withColumn(
            "__g",
            F.explode(
                F.sequence(
                    F.col("bucket"),
                    F.coalesce(F.col("__nb") - step, F.col("bucket")),
                    step,
                )
            ),
        )
    )
    on_obs = F.col("__g") == F.col("bucket")
    if method == "locf":
        value = F.col("v")
    else:
        # identical association to interpolate(): pv + ((nv - pv) * frac)
        frac = (F.col("__g") - F.col("bucket")) / (F.col("__nb") - F.col("bucket"))
        value = F.when(on_obs, F.col("v")).otherwise(
            F.col("v") + ((F.col("__nv") - F.col("v")) * frac)
        )
    return src.select(
        *keys,
        F.col("__g").alias("bucket"),
        F.when(on_obs, F.col("v")).alias("v"),
        F.when(on_obs, F.col("n_obs")).otherwise(F.lit(0)).alias("n_obs"),
        value.cast("double").alias("value_filled"),
        (~on_obs).alias("is_gap"),
    )
