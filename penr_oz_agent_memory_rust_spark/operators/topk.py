"""Top-k, ordering, and pagination operators (SURVEY §2.4 T1-T6).

Reference: bounded min-heap top-k, O(N log k) (reference src/memory.rs:93-136),
final descending drain (src/memory.rs:132-135), SQLite LIMIT/OFFSET pagination
ordered (created_at DESC, id DESC) (src/session_store.rs:142-154).

Spark-first: `orderBy(desc).limit(k)` compiles to TakeOrderedAndProject —
per-partition bounded heaps merged on the driver, i.e. the reference's exact
algorithm, distributed, with NO shuffle. Ties are broken deterministically by
the id column (the reference is tie-unstable, src/memory.rs:55 — documented
deviation per SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k(df: DataFrame, score_col: str, k: int, tiebreak: str | Column | None = None) -> DataFrame:
    """T1/T2/T6: global top-k by score desc → TakeOrderedAndProject (no shuffle)."""
    order = [F.col(score_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc() if isinstance(tiebreak, str) else tiebreak)
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    k: int,
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Top-k within each group (the KNN-join reduction): one shuffle on the
    group key, then a per-partition window — rank column is dropped."""
    order = [F.col(score_col).desc()]
    if tiebreak:
        for tb in [tiebreak] if isinstance(tiebreak, str) else tiebreak:
            order.append(F.col(tb).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def paginate(
    df: DataFrame,
    order_by: list[Column],
    limit: int = 50,
    offset: int = 0,
    clamp: tuple[int, int] | None = (1, 100),
) -> DataFrame:
    """T4/T5: deterministic-total-order pagination.

    Matches reference src/session_store.rs:142-154 (`LIMIT ? OFFSET ?`,
    limit 0 => unbounded) and the route-level clamp [1,100] with default 50
    (src/routes.rs:538-541,556-558). offset=0 short-circuits to a plain
    orderBy().limit() => TakeOrderedAndProject; nonzero offset pays one
    row_number window (driver-merge of size limit+offset).
    """
    if clamp is not None:
        limit = max(clamp[0], min(clamp[1], limit if limit else 50))
    ordered = df.orderBy(*order_by)
    if limit == 0:  # unbounded (bind -1 in the reference)
        return ordered
    if offset <= 0:
        return ordered.limit(limit)
    # Bound the window input first: orderBy().limit(offset+limit) is a
    # TakeOrderedAndProject (per-partition heaps, driver merge), so the
    # single-partition row_number below sees at most offset+limit rows no
    # matter how large the table is — never a global sort.
    page = ordered.limit(offset + limit)
    w = Window.partitionBy(F.lit(0)).orderBy(*order_by)
    return (
        page.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > offset)
        .drop("__rn")
    )
