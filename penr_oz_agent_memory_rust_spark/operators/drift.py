"""Population stability index for scalar features (★ north-star pipeline
operator) — the third leg of the monitoring family next to the streaming
embedding-drift monitor (streaming/ingest.py) and the per-source corpus
divergence (operators/corpus.py): given a BASELINE sample and a CURRENT
sample of one numeric column, how far has the distribution moved?

PSI = Σ_bins (a_i - e_i) · ln(a_i / e_i), with e/a the expected/actual
bin shares — the standard model-monitoring statistic (< 0.1 stable,
0.1-0.25 drifting, > 0.25 action). Bins here are EQUAL-WIDTH over the
baseline's [min, max]: equal-width edges come from two exact scalars that
every engine computes identically, so the whole operator is
oracle-checkable — unlike quantile binning, whose interpolation rules
differ across engines. Out-of-range current values clamp into the edge
bins; zero shares are floored at `eps` on BOTH sides of the log (the
usual PSI smoothing), applied before the difference too so the statistic
stays symmetric under engine-identical arithmetic.

Scale shape: one agg for the two baseline scalars (broadcast back as a
1-row frame), one bin hash-agg per side with map-side combine (n_bins
output rows), a bin-grid left join so empty bins still report, and a
final n_bins-row fold. The inputs are scanned once each; nothing
unbounded shuffles, broadcasts, or reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bin_expr(value, lo, hi, n_bins: int):
    width = (hi - lo) / F.lit(float(n_bins))
    raw = F.floor((value - lo) / width).cast("bigint")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def psi_bins(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str = "value",
    n_bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Per-bin PSI report: (bin, e_pct, a_pct, term), n_bins rows, term
    = (a' - e') * ln(a'/e') with shares floored at eps. Sum of `term` is
    the PSI; psi_total() does that fold."""
    v = F.col(value_col).cast("double")
    mm = baseline.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi"), F.count(v).alias("__nb")
    )
    lo, hi = F.col("__lo"), F.col("__hi")

    def side_counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(v.alias("__v"))
            .crossJoin(F.broadcast(mm.select("__lo", "__hi")))
            .select(_bin_expr(F.col("__v"), lo, hi, n_bins).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )
    bcnt = side_counts(baseline, "__bc")
    ccnt = side_counts(current, "__cc")
    n_cur = current.agg(F.count(v).alias("__nc"))
    grid = (
        mm.select("__nb")
        .crossJoin(F.broadcast(n_cur))
        .select("__nb", "__nc", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"))
    )
    j = grid.join(bcnt, "bin", "left").join(ccnt, "bin", "left")
    e = F.greatest(F.coalesce(F.col("__bc"), F.lit(0)) / F.col("__nb"), F.lit(eps))
    a = F.greatest(F.coalesce(F.col("__cc"), F.lit(0)) / F.col("__nc"), F.lit(eps))
    return j.select(
        F.col("bin").cast("bigint").alias("bin"),
        F.round(e, round_to).alias("e_pct"),
        F.round(a, round_to).alias("a_pct"),
        F.round((a - e) * F.log(a / e), round_to).alias("term"),
    )


def psi_total(bins: DataFrame, round_to: int = 6) -> DataFrame:
    """One-row fold of psi_bins: (psi,). Computed from the UNROUNDED terms'
    rounded representations — callers comparing engines should sum the
    same rounded terms."""
    return bins.agg(F.round(F.sum("term"), round_to).alias("psi"))


def mad_outliers(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
    threshold: float = 3.5,
    round_to: int = 6,
    exact: bool = True,
) -> DataFrame:
    """★ Robust per-group outlier detection via the median absolute
    deviation: robust_z = 0.6745 · (x - median) / MAD (Iglewicz-Hoaglin
    modified z-score; 0.6745 = Φ⁻¹(0.75) makes MAD consistent with σ
    under normality). Unlike the mean/stddev z-score monitor
    (corpus.zscore_by_group), the breakdown point is 50% — the outliers
    themselves cannot drag the threshold.

    Two exact interpolated medians (Spark `median` == DuckDB `median` on
    float64): one grouped agg for the per-group median, one for the MAD of
    the absolute deviations. Both results are one-row-per-group frames and
    are BROADCAST back onto the fact table, so the events scan itself
    never shuffles. Groups with MAD = 0 (constant bulk) are excluded
    rather than divided by zero. The threshold compares the ROUNDED score
    so an oracle comparison can't flip on last-ulp differences.

    Scale note: exact `median` is an ObjectHashAggregate that buffers one
    group's values on one task — fine for bounded-cardinality groups like
    event types at sf0.1, but at 100 TB with billion-row groups pass
    `exact=False` to swap both medians for `approx_percentile` (t-digest,
    mergeable, map-side partial) at the cost of oracle exactness.
    Output: (id_col, group_col, value_col, med, mad, robust_z) — outlier
    rows only, |robust_z| > threshold."""
    def _med(c):
        return F.median(c) if exact else F.expr(f"approx_percentile({c}, 0.5, 10000)")

    v = F.col(value_col).cast("double")
    rows = df.filter(v.isNotNull()).select(id_col, group_col, v.alias(value_col))
    med = rows.groupBy(group_col).agg(_med(value_col).alias("__med"))
    dev = rows.join(F.broadcast(med), group_col).withColumn(
        "__absdev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = dev.groupBy(group_col).agg(_med("__absdev").alias("__mad"))
    z = F.round(
        F.lit(0.6745) * (F.col(value_col) - F.col("__med")) / F.col("__mad"), round_to
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .filter(F.col("__mad") > 0)
        .withColumn("robust_z", z)
        .filter(F.abs(F.col("robust_z")) > threshold)
        .select(
            id_col,
            group_col,
            F.round(F.col(value_col), round_to).alias(value_col),
            F.round("__med", round_to).alias("med"),
            F.round("__mad", round_to).alias("mad"),
            "robust_z",
        )
    )


def seasonal_anomalies(
    baseline: DataFrame,
    current: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    threshold: float = 3.0,
    min_baseline: int = 30,
    round_dp: int = 6,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: profile the BASELINE window
    per (group, hour-of-day) — the dominant seasonality of event streams —
    then z-score CURRENT-window values against their own (group, hour)
    cell and keep |z| >= threshold. A global z-score flags every nightly
    lull and daily peak as anomalous; conditioning on the seasonal cell is
    the standard fix (same family as psi_bins / mad_outliers, aimed at
    point anomalies rather than distribution drift).

    Cells with fewer than `min_baseline` observations or zero variance
    are unscoreable and never flag (avoids div-by-~0 z explosions).
    Scale shape: the profile aggregates to at most groups x 24 rows and
    broadcasts back; the current scan never shuffles. Output:
    (id..., group, hour, value, mu, sd, z) for flagged rows only.
    """
    hour = F.hour(F.col(ts_col))
    prof = (
        baseline.groupBy(group_col, hour.alias("hh"))
        .agg(
            F.avg(value_col).alias("__mu"),
            F.stddev_pop(value_col).alias("__sd"),
            F.count("*").alias("__n"),
        )
        .filter((F.col("__n") >= min_baseline) & (F.col("__sd") > 0))
    )
    cur = current.withColumn("hh", hour)
    z = F.round((F.col(value_col) - F.col("__mu")) / F.col("__sd"), round_dp)
    return (
        cur.join(F.broadcast(prof), [group_col, "hh"])
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= threshold)
        .select(
            *[c for c in cur.columns if c not in ("hh",)],
            F.col("hh").alias("hour"),
            F.round("__mu", round_dp).alias("mu"),
            F.round("__sd", round_dp).alias("sd"),
            "z",
        )
    )
