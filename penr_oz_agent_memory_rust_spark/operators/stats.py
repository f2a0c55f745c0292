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
