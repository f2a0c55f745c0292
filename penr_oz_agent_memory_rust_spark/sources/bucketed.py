"""Bucketed-table helpers: pre-shuffle once at write time, join forever
without an Exchange.

At 100 TB the recurring cost of a fact-to-fact join (e.g. lineitem-orders,
or memories-to-points reconciliation) is the shuffle of both sides on every
run. Writing both tables bucketed (and sorted) by the join key co-locates
matching buckets, so Catalyst plans a SortMergeJoin with ZERO Exchange —
pinned in tests/test_bucketed.py. Bucketed writes require the session
catalog (saveAsTable); an explicit path keeps the files where the caller
wants them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal bucket
    counts, the plan has no shuffle on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
