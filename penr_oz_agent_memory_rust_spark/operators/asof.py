"""As-of (point-in-time) join — a standard time-series operator Spark has no
native form for (guide: "As-of / range join").

For each left row, find the latest right row with the same key and
right_time <= left_time. The naive plan (range join + per-row window) blows
up as |left| × |right| per key; this implementation uses the union-sort
trick: tag both sides, sort each key's rows by time once, and carry the most
recent right row forward with last_value(ignorenulls). Cost: ONE shuffle on
the key and one sort — no range explosion, skew-safe under AQE.

Tie semantics: right rows at exactly left_time are eligible (<=); among
equal (key, time), the right row with the largest tiebreak wins —
deterministic, mirrored by the oracle's row_number form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    keep_unmatched: bool = True,
) -> DataFrame:
    """Returns `left` columns plus the as-of values of `right_cols`.

    `tiebreak` orders equal-(key, time) right rows; defaults to the first of
    right_cols. `keep_unmatched=False` drops left rows with no prior right
    row (inner as-of).
    """
    tiebreak = tiebreak or right_cols[0]
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(dict(right.dtypes)[tiebreak]).alias("__tb"),
        F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__src"),
        F.col(tiebreak).alias("__tb"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (src=0) sort before left rows at equal time => `<=`;
    # among equal (k, t, src) right rows, larger tiebreak comes later and
    # wins the last_value carry-forward.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__src").asc(), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__src",
        "__l",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}") for c in right_cols],
    ).filter(F.col("__src") == 1)
    out = carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv_{c}").alias(c) for c in right_cols],
    )
    if not keep_unmatched:
        out = out.filter(F.col(right_cols[0]).isNotNull())
    return out
