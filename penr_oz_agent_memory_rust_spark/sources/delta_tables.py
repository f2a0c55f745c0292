"""Delta Lake backend for the TableIO seam (DEVIATIONS #7).

`DeltaTableIO` is interface-compatible with `tables.ParquetTable`
(ensure / read / append / overwrite / merge_upsert / delete_where /
update_where) but implements the three mutations as TRANSACTIONAL
`MERGE INTO` / `DELETE` / `UPDATE` — cost proportional to the files
containing matched keys instead of the whole table. That turns the
reference's write-path operations (upsert S4, delete S3, touch C3 —
reference src/vector_store.rs:215-255, src/memory.rs:139-141,
src/session_store.rs:214-246) from O(table) rewrites into O(touched
partition) commits, which is what a 100 TB memories table needs.

Environment-gated: the `delta-spark` package and its jars are not in
this container, so construction raises `NotConfiguredError` when the
import is missing (the same gating pattern as the
transformWithStateInPandas path, DEVIATIONS #11). `delta_available()`
lets callers pick the backend at runtime; tests skip without the
package and run the identical interface contract against ParquetTable.
When delta IS on the classpath the session needs the standard two confs
(spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension,
spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog.DeltaCatalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from penr_oz_agent_memory_rust_spark.errors import NotConfiguredError


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class DeltaTableIO:
    """ParquetTable-compatible table backed by a Delta location."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        partition_cols: list[str] | None = None,
    ):
        if not delta_available():
            raise NotConfiguredError(
                "delta-spark is not on the classpath; use tables.ParquetTable "
                "(same interface, overwrite-based mutations) or add the Delta "
                "jars + session extensions"
            )
        self.spark = spark
        self.path = path
        self.schema = schema
        self.partition_cols = partition_cols or []

    # -- plumbing ----------------------------------------------------------

    def _delta(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    def exists(self) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.path)

    def _writer(self, df: DataFrame, mode: str):
        w = df.select(*[f.name for f in self.schema.fields]).write.format("delta").mode(mode)
        if self.partition_cols:
            w = w.partitionBy(*self.partition_cols)
        return w

    def ensure(self) -> None:
        if not self.exists():
            self._writer(self.spark.createDataFrame([], self.schema), "overwrite").save(
                self.path
            )

    def read(self) -> DataFrame:
        self.ensure()
        return self.spark.read.format("delta").load(self.path)

    def append(self, df: DataFrame) -> None:
        self.ensure()
        self._writer(df, "append").save(self.path)

    def overwrite(self, df: DataFrame) -> None:
        # Delta overwrite is a transactional commit — no temp-dir dance:
        # readers of the old snapshot are isolated by the log, so
        # read-then-overwrite is safe, unlike raw parquet paths.
        self._writer(df, "overwrite").save(self.path)

    def compact(self, target_partitions: int = 1) -> int:
        """OPTIMIZE-style rewrite (bin-packing compaction)."""
        self._delta().optimize().executeCompaction()
        return target_partitions

    # -- transactional mutations ------------------------------------------

    def merge_upsert(self, updates: DataFrame, key_cols: list[str]) -> None:
        """MERGE INTO … WHEN MATCHED UPDATE ALL WHEN NOT MATCHED INSERT ALL:
        one commit, rewrites only files containing matched keys."""
        self.ensure()
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in key_cols)
        (
            self._delta()
            .alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def delete_where(self, condition) -> None:
        self.ensure()
        cond = condition if isinstance(condition, str) else condition
        self._delta().delete(cond)

    def delete_keys(self, keys: list, key_col: str) -> None:
        """Key-addressed delete (seam parity): Delta's DELETE already
        prunes to matched files via its own log stats."""
        if keys:
            self.delete_where(F.col(key_col).isin(list(keys)))

    def update_where(self, condition, assignments: dict) -> None:
        self.ensure()
        sets = {
            col: (F.expr(val) if isinstance(val, str) else val)
            for col, val in assignments.items()
        }
        cond = F.expr(condition) if isinstance(condition, str) else condition
        self._delta().update(condition=cond, set=sets)
