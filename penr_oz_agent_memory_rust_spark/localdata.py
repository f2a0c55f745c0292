"""Driver-local rows -> DataFrame without a Python-RDD job.

`spark.createDataFrame(list_of_tuples)` plans a Python-RDD-backed scan:
every action on the result (even collecting 200 rows) launches a job that
must spin up a Python worker on the executor and re-import the shipped
package — 5-7 s per action on a warm local[32] session, and a per-job
Python round-trip on a real cluster. Routing the same rows through a
pandas DataFrame instead uses the Arrow fast path: the data crosses into
the JVM once at creation time and the plan is a pure JVM local scan, so
downstream actions cost milliseconds and never touch a Python worker.

Falls back to the row-list path for types the Arrow converter rejects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(spark: SparkSession, rows, schema: StructType | str) -> DataFrame:
    """Build a small driver-local DataFrame on the Arrow fast path."""
    rows = list(rows)
    if rows:
        try:
            import pandas as pd

            if isinstance(schema, StructType):
                names = schema.fieldNames()
            else:
                names = None
            pdf = pd.DataFrame(rows, columns=names)
            return spark.createDataFrame(pdf, schema)
        except Exception:
            pass
    return spark.createDataFrame(rows, schema)
