"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API) for the
reference's JSONL memory wire format ({id?, text, metadata?, session?} per
line — the body of POST /memory, reference src/routes.rs:189-203).

The native JSON reader (sources.tables.read_memories_jsonl) is the default
path; this connector exists for the *connector surface* itself — the shape
any bespoke source (an internal API export, a proprietary log format) takes
in a pure-Python engine extension:

- `partitions()` plans one InputPartition per file, so a directory of
  exports scans in parallel with no driver bottleneck;
- `read(partition)` streams rows from one file, applying the reference's
  serde-default semantics (missing keys -> NULL, unknown keys ignored);
- the declared schema matches schemas.py; Spark handles Arrow conversion.

Register once per session, then it is a normal format:

    spark.dataSource.register(MemoriesJsonlDataSource)
    spark.read.format("memories_jsonl").option("path", d).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

MEMORIES_WIRE_SCHEMA = (
    "id string, text string, metadata map<string,string>, session string"
)


class MemoriesJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "memories_jsonl"

    def schema(self) -> str:
        return MEMORIES_WIRE_SCHEMA

    def reader(self, schema) -> "MemoriesJsonlReader":
        return MemoriesJsonlReader(self.options)

    def simpleStreamReader(self, schema) -> "MemoriesJsonlStreamReader":
        return MemoriesJsonlStreamReader(self.options)


class MemoriesJsonlReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("memories_jsonl requires option('path', ...)")

    def partitions(self):
        import glob
        import os

        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.jsonl")))
        else:
            files = [self.path]
        return [InputPartition(f) for f in files]

    def read(self, partition):
        import json

        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                meta = rec.get("metadata")
                if meta is not None:
                    meta = {str(k): str(v) for k, v in meta.items()}
                yield (
                    rec.get("id"),
                    rec.get("text"),
                    meta,
                    rec.get("session"),
                )


def _parse_jsonl_file(path):
    import json

    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            meta = rec.get("metadata")
            if meta is not None:
                meta = {str(k): str(v) for k, v in meta.items()}
            yield (rec.get("id"), rec.get("text"), meta, rec.get("session"))


class MemoriesJsonlStreamReader(SimpleDataSourceStreamReader):
    """Incremental tail of an append-only JSONL export directory — the
    STREAMING half of the connector surface (Spark 4
    SimpleDataSourceStreamReader): each micro-batch consumes the files
    that appeared since the last committed offset.

    Offset = {"n": count of files consumed} over the SORTED file list,
    which is exactly-once under the documented append-only contract
    (exports arrive as new lexically-later files; files are never
    rewritten — the same contract file-based autoloaders assume).
    `readBetweenOffsets` replays any [start, end) slice deterministically
    for recovery, so a crashed micro-batch re-reads the same rows.
    """

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("memories_jsonl streaming requires option('path', ...)")

    def _files(self):
        import glob
        import os

        if os.path.isdir(self.path):
            return sorted(glob.glob(os.path.join(self.path, "*.jsonl")))
        return [self.path]

    def initialOffset(self):
        return {"n": 0}

    def read(self, start):
        files = self._files()
        n0 = int(start.get("n", 0))
        rows = []
        for f in files[n0:]:
            rows.extend(_parse_jsonl_file(f))
        return iter(rows), {"n": len(files)}

    def readBetweenOffsets(self, start, end):
        files = self._files()
        n0, n1 = int(start.get("n", 0)), int(end.get("n", 0))
        rows = []
        for f in files[n0:n1]:
            rows.extend(_parse_jsonl_file(f))
        return iter(rows)
