"""Binned interval (range) join — the scale-safe form of
`L JOIN R ON L.key = R.key AND L.ts BETWEEN R.start AND R.end`.

Spark plans a raw range predicate as a broadcast-nested-loop or a sort-merge
join whose per-key work is O(|L_key| x |R_key|) — fatal when a hot key holds
millions of rows. The standard fix (used by every production range-join
implementation, e.g. Databricks' range-join hint) is binning:

1. pick a bin width W;
2. each right interval [start, end] is exploded to every bin it overlaps
   (`sequence(floor(start/W), floor(end/W))` — intervals spanning B bins
   produce B rows);
3. each left point maps to exactly ONE bin `floor(ts/W)`;
4. equi-join on (key, bin) — a plain shuffled/broadcast hash join — then
   re-check the exact interval predicate.

No duplicates are possible: a left point joins a given right interval only
in the point's single bin. Choose W near the typical interval length so the
explosion factor stays ~2 and each bin's population is bounded; the
equi-join then shuffles both sides once on (key, bin) and AQE handles any
residual skew.

The reference has no joins at all (SURVEY §2.7 — reference
`src/memory.rs`/`src/vector_store.rs` are pure scan+top-k); this operator is
part of the beyond-reference pipeline surface (events-to-orders attribution
style queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bin_width: int = 86_400,
) -> DataFrame:
    """Inner-join rows where left.key == right.key and
    left[left_ts] ∈ [right[right_start], right[right_end]] (inclusive).

    Timestamps/epochs must be numeric (epoch seconds or any monotone
    numeric encoding); cast timestamp columns with `unix_timestamp` first.
    `bin_width` is in the same unit. Returns all left columns plus all
    right columns except the join key.
    """
    l_bin = left.withColumn(
        "__bin", F.floor(F.col(left_ts) / F.lit(bin_width)).cast("long")
    )
    r_bin = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(right_end) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    right_out = [c for c in right.columns if c != key]
    joined = l_bin.join(r_bin, on=[key, "__bin"], how="inner").filter(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) <= F.col(right_end))
    )
    return joined.select(*left.columns, *right_out)
