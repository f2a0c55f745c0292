"""Type-2 slowly-changing-dimension merge (CDC apply) without a
transactional table format.

MERGE INTO needs Delta/Iceberg (jars absent here — see sources/tables.py's
ParquetTable seam); the guide-standard emulation is anti-join + union:
close the current version of every changed key (set its valid_to to the
change's effective time), keep unchanged current rows and all history
verbatim, and append the new versions as open rows. One shuffle-free pass
when the change set broadcasts — the dimension table never shuffles.

Contract: at most one change row per key per batch (the standard
micro-batch CDC compaction — collapse upstream with a last-writer-wins
window first if needed, e.g. vector_store.upsert's reduction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension table.

    `dim` columns: key, *attrs, valid_from, valid_to (NULL = current row).
    `changes` columns: key, *attrs, effective_col.
    Returns the new full dimension table (history + closed + current).
    """
    out_cols = [key, *attrs, valid_from, valid_to]
    ch = changes.select(key, *attrs, F.col(effective_col).alias("__eff"))
    ch_keys = F.broadcast(ch.select(key, "__eff"))

    history = dim.filter(F.col(valid_to).isNotNull()).select(*out_cols)
    current = dim.filter(F.col(valid_to).isNull())
    closed = (
        current.drop(valid_to)
        .join(ch_keys, key)
        .withColumn(valid_to, F.col("__eff"))
        .select(*out_cols)
    )
    untouched = current.join(ch_keys.select(key), key, "left_anti").select(*out_cols)
    opened = (
        ch.withColumn(valid_from, F.col("__eff"))
        .withColumn(valid_to, F.lit(None).cast(dict(dim.dtypes)[valid_to]))
        .select(*out_cols)
    )
    return history.unionByName(closed).unionByName(untouched).unionByName(opened)
