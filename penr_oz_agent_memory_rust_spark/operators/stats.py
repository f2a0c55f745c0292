"""ANALYZE-style per-column statistics in one scan (★).

The optimizer-stats surface (`ANALYZE TABLE ... COMPUTE STATISTICS FOR
COLUMNS`): row count, null count, exact NDV, and min/max for every
requested column, collected in a SINGLE pass over the table and emitted
long-format (one row per column). Multiple exact count-distincts plan as
one Expand + aggregate — one scan, one shuffle of (n_cols × groups)
expanded rows; for very wide tables swap `F.countDistinct` for
`F.approx_count_distinct` at the call site (same plan minus Expand).

Min/max are emitted in SEPARATE typed columns (`vmin_num`/`vmin_str`)
rather than cast to one string column: float→string formatting is
engine-specific, typed values hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def analyze_columns(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str] = (),
    exact_ndv: bool = True,
) -> DataFrame:
    """One-scan column statistics, long format:
    (column, n_rows, n_nulls, n_distinct, vmin_num, vmax_num, vmin_str,
    vmax_str). Numeric min/max cast to double; string columns leave the
    num slots null and vice versa."""
    ndv = F.countDistinct if exact_ndv else F.approx_count_distinct
    aggs = [F.count("*").alias("n_rows")]
    for c in [*numeric_cols, *string_cols]:
        aggs.append(F.count(c).alias(f"__cnt_{c}"))
        aggs.append(ndv(c).cast("bigint").alias(f"__ndv_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    for c in string_cols:
        aggs.append(F.min(c).alias(f"__smn_{c}"))
        aggs.append(F.max(c).alias(f"__smx_{c}"))
    one = df.agg(*aggs)

    def entry(c: str, is_num: bool):
        return F.struct(
            F.lit(c).alias("column"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            (F.col("n_rows") - F.col(f"__cnt_{c}")).cast("bigint").alias("n_nulls"),
            F.col(f"__ndv_{c}").alias("n_distinct"),
            (F.col(f"__mn_{c}") if is_num else F.lit(None).cast("double")).alias("vmin_num"),
            (F.col(f"__mx_{c}") if is_num else F.lit(None).cast("double")).alias("vmax_num"),
            (F.lit(None).cast("string") if is_num else F.col(f"__smn_{c}")).alias("vmin_str"),
            (F.lit(None).cast("string") if is_num else F.col(f"__smx_{c}")).alias("vmax_str"),
        )

    entries = [entry(c, True) for c in numeric_cols] + [
        entry(c, False) for c in string_cols
    ]
    return one.select(F.explode(F.array(*entries)).alias("st")).select("st.*")


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    round_dp: int | None = 6,
) -> DataFrame:
    """EXACT per-group quantiles with linear interpolation (the
    quantile_cont contract), long format: (*group_cols, p, quantile_value,
    n_values). One sort-based aggregate per group — heavier than
    approx_percentile's sketch but exact, which is what threshold-setting
    pipelines (quality cuts, length caps) actually need; the group count
    bounds what any task materializes, so the plan scales with groups,
    not with the table. Feed INTEGER value columns when the result gates
    an oracle/fixed threshold — interpolated values then carry ≤2 extra
    decimals and never sit on a rounding boundary."""
    parr = F.array(*[F.lit(float(p)) for p in probs])
    agg = df.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col).cast("double"), parr).alias("__q"),
        F.count(value_col).alias("n_values"),
    )
    out = agg.select(
        *group_cols, "n_values", F.posexplode("__q").alias("__i", "quantile_value")
    ).withColumn("p", F.element_at(parr, F.col("__i") + 1))
    qv = F.col("quantile_value")
    if round_dp is not None:
        qv = F.round(qv, round_dp)
    return out.select(
        *group_cols, "p", qv.alias("quantile_value"), F.col("n_values").cast("bigint").alias("n_values")
    )


def exact_group_quantiles_scalable(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    n_buckets: int = 1024,
    round_dp: int | None = 6,
) -> DataFrame:
    """The 100 TB form of exact_group_quantiles: Spark's `percentile`
    aggregate BUFFERS every group's values in one task (OOM at scale),
    so this computes the same interpolated quantiles from bucketed
    global ranks instead — per-group fixed-width value buckets (edges
    from one min/max agg), per-(group, bucket) counts folded into
    broadcast rank offsets, a row_number only WITHIN each bucket (task
    memory ~ group/n_buckets), then the two bracketing ranks per prob
    interpolate exactly like quantile_cont. Two scans + one bucket-local
    sort; driver holds groups × n_buckets counters, never values."""
    from pyspark.sql import Window

    g = list(group_cols)
    spans = df.groupBy(*g).agg(
        F.min(F.col(value_col).cast("double")).alias("__mn"),
        F.max(F.col(value_col).cast("double")).alias("__mx"),
        F.count(value_col).alias("__n"),
    )
    src = (
        df.select(*g, F.col(value_col).cast("double").alias("__v"))
        .where(F.col("__v").isNotNull())
        .join(F.broadcast(spans), g)
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets))
    b = F.when(F.col("__mx") == F.col("__mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("__v") - F.col("__mn")) / width),
            F.lit(n_buckets - 1),
        )
    ).cast("int")
    src = src.withColumn("__b", b)
    counts = src.groupBy(*g, "__b").count().collect()
    offsets, acc = [], {}
    for r in sorted(counts, key=lambda r: (tuple(str(r[c]) for c in g), r["__b"])):
        key = tuple(r[c] for c in g)
        offsets.append((*key, r["__b"], acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + r["count"]
    off_df = df.sparkSession.createDataFrame(
        offsets, src.select(*g, "__b").schema.add("__offset", "long")
    )
    w = Window.partitionBy(*g, "__b").orderBy("__v")
    ranked = (
        src.join(F.broadcast(off_df), [*g, "__b"])
        .withColumn("__rank", (F.col("__offset") + F.row_number().over(w) - 1))
    )
    parr = F.array(*[F.lit(float(p)) for p in probs])
    h = (F.col("__n") - 1).cast("double") * F.col("p")
    lo, hi = F.floor(h).cast("long"), F.ceil(h).cast("long")
    picked = (
        ranked.select(*g, "__v", "__rank", "__n", F.explode(parr).alias("p"))
        .filter((F.col("__rank") == lo) | (F.col("__rank") == hi))
    )
    frac = h - F.floor(h)
    agg = picked.groupBy(*g, "p").agg(
        F.max(F.when(F.col("__rank") == lo, F.col("__v"))).alias("__lov"),
        F.max(F.when(F.col("__rank") == hi, F.col("__v"))).alias("__hiv"),
        F.first("__n").alias("__n"),
    )
    qv = F.col("__lov") + (F.col("__hiv") - F.col("__lov")) * (
        (F.col("__n") - 1).cast("double") * F.col("p")
        - F.floor((F.col("__n") - 1).cast("double") * F.col("p"))
    )
    if round_dp is not None:
        qv = F.round(qv, round_dp)
    return agg.select(
        *g, "p", qv.alias("quantile_value"), F.col("__n").cast("bigint").alias("n_values")
    )


def fixed_width_histogram(
    df: DataFrame,
    value_col: str,
    width: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram: bin = floor(value / width), counted per
    (*group_cols, bin). Pure hash aggregate — one shuffle of (groups ×
    bins) partial rows, integer counts, no sort anywhere; the monitoring
    primitive drift/PSI baselines feed on at full-table scale."""
    gcols = list(group_cols or [])
    bin_col = F.floor(F.col(value_col).cast("double") / F.lit(float(width))).cast(
        "bigint"
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, bin_col.alias("bin"))
        .agg(F.count("*").alias("n"))
    )


def quantile_bucket_stats(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 4,
    round_dp: int | None = 6,
) -> DataFrame:
    """Quantile binning WITHOUT a global window: bucket edges come from
    one exact-percentile aggregate (n_buckets-1 scalars, broadcast as
    literals in a second map-only pass), then per-bucket (n, mean).
    The ntile() equivalent at scale — a global ntile sorts the whole
    table through one partition; this is one bounded agg + one map.
    Rows equal to an edge go DOWN (bucket = #edges strictly below x)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # edges via the bucketed-global-rank path, NOT the percentile
    # aggregate: a global percentile buffers the entire column in one
    # task, which is exactly the OOM this operator exists to avoid at
    # scale. The ranked form collects only the n_buckets-1 edge scalars.
    edge_rows = exact_group_quantiles_scalable(
        df.select(F.lit(1).alias("__g"), F.col(value_col)),
        ["__g"],
        value_col,
        probs,
        round_dp=None,
    ).collect()
    edges = [float(r["quantile_value"]) for r in sorted(edge_rows, key=lambda r: r["p"])]
    x = F.col(value_col).cast("double")
    bucket = (
        sum((x > F.lit(e)).cast("int") for e in edges).cast("bigint")
        if edges
        else F.lit(0).cast("bigint")  # empty input: no edges, no rows
    )
    mean = F.sum(x) / F.count("*")
    if round_dp is not None:
        mean = F.round(mean, round_dp)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), mean.alias("mean_value"))
    )
