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
    key: str | list[str] | None,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    keep_unmatched: bool = True,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    global_max_rows: int = 5_000_000,
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

    `direction` completes merge_asof parity: "backward" (default) matches
    the latest right row at-or-before left_time; "forward" the earliest
    at-or-after (implemented as backward over DESCENDING time — the same
    carry-forward window, reversed sort, so equal-time rights stay
    inclusive and the larger-tiebreak-wins rule is uniform); "nearest"
    computes both and picks the smaller time distance, backward on ties
    (pandas semantics). Nearest costs one shuffle and TWO sorts (the two
    window orderings share the partitioning exchange).

    `key` may be a list (pandas `by=[...]`): multi-column grouping packs
    into one struct partition key — still a single shuffle. `key=None` is
    the BY-LESS global as-of (pandas merge_asof without `by`): one total
    time order, which in this union-sort form means ONE window partition —
    a single-task sort, deliberately NOT a scale path. The `global_max_rows`
    guard raises before planning a driver-sized sort; it is ONE bounded
    count job — a 1-column union limited to guard+1 rows, so the pre-flight
    never scans past the cap even on huge inputs. Partition the data with a
    real `key` beyond the guard.
    `allow_exact_matches=False` makes the time comparison STRICT (< / >):
    implemented purely in the union-sort order — left rows sort BEFORE
    right rows at equal time, so an equal-time right falls outside the
    carry-forward frame in either direction."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if key is None:
        # ONE bounded count job: union of 1-column projections, limited to
        # guard+1 — stops scanning as soon as the cap is provably exceeded
        n = (
            left.select(F.lit(1).alias("__one"))
            .unionAll(right.select(F.lit(1).alias("__one")))
            .limit(global_max_rows + 1)
            .count()
        )
        if n > global_max_rows:
            raise ValueError(
                f"by-less as-of join sorts all rows in ONE window partition; "
                f">{global_max_rows} rows exceeds global_max_rows="
                f"{global_max_rows}. Partition with a real key (or raise "
                "the guard knowingly)."
            )
        key_expr = F.lit(0)
    else:
        keys = [key] if isinstance(key, str) else list(key)
        key_expr = F.col(keys[0]) if len(keys) == 1 else F.struct(*keys)
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
        key_expr.alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(r_types[tiebreak]).alias("__tb"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        key_expr.alias("__k"),
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

    # with exact matches allowed, right rows (src=0) sort before left rows
    # at equal time => inclusive match in BOTH directions; strict mode
    # flips that order so equal-time rights fall outside the frame. Among
    # equal (k, t, src) right rows, larger tiebreak comes later and wins
    # the last_value carry-forward.
    src_ord = F.col("__src").asc() if allow_exact_matches else F.col("__src").desc()

    def carried_col(time_asc: bool):
        t_ord = F.col("__t").asc() if time_asc else F.col("__t").desc()
        w = (
            Window.partitionBy("__k")
            .orderBy(t_ord, src_ord, F.col("__tb").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("__r", ignorenulls=True).over(w)

    picks = []
    if direction in ("backward", "nearest"):
        picks.append(carried_col(True).alias("__rb"))
    if direction in ("forward", "nearest"):
        picks.append(carried_col(False).alias("__rf"))
    carried = unioned.select("__src", "__t", "__l", *picks).filter(
        F.col("__src") == 1
    )
    # double-cast keeps sub-second staleness (unix_timestamp truncates)
    tsec = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    if tolerance_seconds is not None:
        tol = F.lit(float(tolerance_seconds))
        if direction in ("backward", "nearest"):
            carried = carried.withColumn(
                "__rb",
                F.when(tsec(F.col("__t")) - tsec(F.col("__rb.__rt")) <= tol, F.col("__rb")),
            )
        if direction in ("forward", "nearest"):
            carried = carried.withColumn(
                "__rf",
                F.when(tsec(F.col("__rf.__rt")) - tsec(F.col("__t")) <= tol, F.col("__rf")),
            )
    if direction == "backward":
        rv = F.col("__rb")
    elif direction == "forward":
        rv = F.col("__rf")
    else:
        dist_b = tsec(F.col("__t")) - tsec(F.col("__rb.__rt"))
        dist_f = tsec(F.col("__rf.__rt")) - tsec(F.col("__t"))
        rv = (
            F.when(F.col("__rb").isNull(), F.col("__rf"))
            .when(F.col("__rf").isNull(), F.col("__rb"))
            .when(dist_b <= dist_f, F.col("__rb"))
            .otherwise(F.col("__rf"))
        )
    carried = carried.withColumn("__rv", rv)
    out = carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv.{c}").alias(c) for c in right_cols],
        F.col("__rv").isNotNull().alias("__matched"),
    )
    if not keep_unmatched:
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")
