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
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Returns `left` columns plus the as-of values of `right_cols`.

    `tiebreak` orders equal-(key, time) right rows; defaults to the first of
    right_cols. `keep_unmatched=False` drops left rows with no prior right
    row (inner as-of). `tolerance_seconds` bounds staleness (pandas
    merge_asof semantics): a carried match older than the tolerance at
    left_time counts as no match — its right columns are nulled, and the row
    is dropped under `keep_unmatched=False`. The staleness check is a
    post-window filter on the carried right time, so the plan cost is
    unchanged: still one shuffle, one sort.
    """
    tiebreak = tiebreak or right_cols[0]
    r_types = dict(right.dtypes)
    # the whole matched right row travels as ONE struct (its columns plus its
    # own event time), so the carry-forward, the staleness test, and the
    # null-out are atomic: a NULL in some right column can never decouple the
    # carried value from the carried row's timestamp (pandas merge_asof
    # whole-row match semantics)
    r_struct_type = (
        "struct<"
        + ",".join([f"{c}:{r_types[c]}" for c in right_cols] + [f"__rt:{r_types[right_time]}"])
        + ">"
    )
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(r_types[tiebreak]).alias("__tb"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__src"),
        F.col(tiebreak).alias("__tb"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__l"),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(right_time).alias("__rt"),
        ).alias("__r"),
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
        "__t",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__rv"),
    ).filter(F.col("__src") == 1)
    if tolerance_seconds is not None:
        # double-cast keeps sub-second staleness (unix_timestamp truncates)
        fresh = (
            F.col("__t").cast("timestamp").cast("double")
            - F.col("__rv.__rt").cast("timestamp").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        carried = carried.select(
            "__src",
            "__t",
            "__l",
            F.when(fresh, F.col("__rv")).alias("__rv"),
        )
    out = carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv.{c}").alias(c) for c in right_cols],
        F.col("__rv").isNotNull().alias("__matched"),
    )
    if not keep_unmatched:
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")
