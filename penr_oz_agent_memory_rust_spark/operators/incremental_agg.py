"""Incremental aggregate maintenance: mergeable partial states (★).

The materialized-view refresh pattern: at 100 TB the base table is
aggregated ONCE into a per-key state table (count/sum/min/max/sum-of-
squares, plus an HLL sketch for distinct counts); every refresh
aggregates only the delta and MERGES states — a union + hash-agg over
(base_groups + delta_groups) rows, never a rescan of the base. All five
numeric states are algebraic (merge = sum/sum/min/max/sum), and the
distinct-count state is a DataSketches HLL binary merged with
`hll_union_agg`, so refreshes compose associatively: state(a ∪ b) =
merge(state(a), state(b)) for any split, which is also exactly the
map-side-combine contract Spark's own partial aggregation relies on.

Finalization (avg = s/n, var_pop = ssq/n − (s/n)²) happens only at read
time, so states stay mergeable forever. The var_pop form is the
textbook-algebraic one (not Welford) precisely because it is the one
that merges with plain sums; the oracle mirrors the same formula so both
engines agree bit-for-bit after rounding.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

STATE_COLS = ("cnt", "s", "ssq", "mn", "mx")


def agg_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    distinct_col: str | None = None,
) -> DataFrame:
    """Per-key mergeable state over `value_col`. One shuffle (the grouped
    agg, with map-side partial combine); output is group-cardinality
    rows. With `distinct_col`, adds an `hll` binary sketch column
    (lgConfigK=12 → ~1.6KB/group, <1% typical error)."""
    v = F.col(value_col).cast("double")
    aggs = [
        F.count(value_col).cast("bigint").alias("cnt"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ssq"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge any number of state frames (same schema) into one: union +
    re-aggregate. Exactly one shuffle over group-cardinality inputs —
    the base table is never touched. Associative and order-insensitive
    for cnt/s/ssq/mn/mx; HLL union is a lossless sketch merge."""
    merged = reduce(lambda a, b: a.unionByName(b), states)
    keys = [c for c in merged.columns if c not in STATE_COLS and c != "hll"]
    aggs = [
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.sum("s").alias("s"),
        F.sum("ssq").alias("ssq"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    ]
    if "hll" in merged.columns:
        aggs.append(F.hll_union_agg("hll").alias("hll"))
    return merged.groupBy(*keys).agg(*aggs)


def finalize(state: DataFrame, round_dp: int = 6) -> DataFrame:
    """Read-time view of a state table: derived avg/var_pop plus the raw
    extrema. Pure projection — no shuffle. HLL (when present) becomes
    `n_distinct_est`, a sketch ESTIMATE: pin it against the exact count
    in tests, never in a value-hash oracle."""
    keys = [c for c in state.columns if c not in STATE_COLS and c != "hll"]
    cols = [
        *keys,
        F.col("cnt").alias("n_rows"),
        F.round("s", 4).alias("total"),
        F.round("mn", 4).alias("vmin"),
        F.round("mx", 4).alias("vmax"),
        F.round(F.col("s") / F.col("cnt"), round_dp).alias("vavg"),
        F.round(
            F.col("ssq") / F.col("cnt") - (F.col("s") / F.col("cnt")) ** 2,
            round_dp,
        ).alias("vvar"),
    ]
    if "hll" in state.columns:
        cols.append(F.hll_sketch_estimate("hll").alias("n_distinct_est"))
    return state.select(*cols)


# ----------------------------------------------------- histogram quantiles

def hist_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Mergeable quantile state: a fixed equal-width histogram over
    [lo, hi) as SPARSE (keys..., bin, cnt) rows — merge is the same
    union + groupBy-sum as the algebraic states, so percentile dashboards
    refresh from deltas without rescanning the base table. Out-of-range
    values clamp into the edge bins (the estimate degrades gracefully at
    the tails; pick [lo, hi) from domain knowledge or an ANALYZE pass).
    Bin counts are integers, so the whole state — and the interpolation
    arithmetic below — is engine-exact and oracle-checkable, unlike
    opaque KLL/t-digest blobs."""
    w = (hi - lo) / bins
    b = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(w))
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), b)).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, b.alias("bin"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def merge_hist_states(*states: DataFrame) -> DataFrame:
    """union + groupBy-sum: associative, order-insensitive (integer adds)."""
    merged = reduce(lambda a, b: a.unionByName(b), states)
    keys = [c for c in merged.columns if c not in ("cnt",)]
    return merged.groupBy(*keys).agg(F.sum("cnt").cast("bigint").alias("cnt"))


def quantile_from_hist(
    state: DataFrame,
    keys: list[str],
    q: float,
    lo: float,
    hi: float,
    bins: int = 64,
    out_col: str = "q_est",
    round_to: int | None = 6,
) -> DataFrame:
    """Read-time quantile estimate per key: walk the cumulative histogram
    to the bin containing rank q·N and interpolate linearly inside it —
    x = lo + w·(bin + (qN − cum_before) / bin_cnt). One window cumsum per
    key over ≤ bins rows/key (the state, never the data). Estimation
    error is bounded by the bin width; the arithmetic itself is exact
    and mirrored verbatim by the SQL oracle."""
    from pyspark.sql import Window

    w_width = (hi - lo) / bins
    totals = state.groupBy(*keys).agg(F.sum("cnt").alias("__n"))
    win = (
        Window.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        state.join(totals, keys)
        .withColumn("__cum", F.sum("cnt").over(win))
        .withColumn("__rank", F.lit(q) * F.col("__n").cast("double"))
    )
    hit = cum.filter(
        (F.col("__cum").cast("double") >= F.col("__rank"))
        & ((F.col("__cum") - F.col("cnt")).cast("double") < F.col("__rank"))
    )
    est = F.lit(lo) + F.lit(w_width) * (
        F.col("bin").cast("double")
        + (F.col("__rank") - (F.col("__cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
    )
    if round_to is not None:
        est = F.round(est, round_to)
    return hit.select(*keys, est.alias(out_col))
