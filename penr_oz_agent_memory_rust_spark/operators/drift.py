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
