"""Manifest-versioned Parquet table: Delta-style semantics from plain
files (★ the transactional upgrade of the mutation seam that needs no
jars — sources/delta_tables.py remains the real-Delta twin, env-gated).

Layout:
    <path>/files/<commit-uuid>/part-*.parquet     immutable data files
    <path>/_manifests/v<00000N>.json              one manifest per version

Every operation commits a NEW manifest listing exactly the files that
version reads; data files are never modified or deleted by commits:

- append         zero-copy: new manifest = previous file list + the new
                 commit's files (the previous version's files are reused
                 byte-for-byte, like Delta's add-only log entry);
- overwrite / merge_upsert / delete_where / update_where
                 rewrite commits (O(table), same honest cost as
                 ParquetTable) — but ATOMIC: readers see the old version
                 until the single manifest hard-link lands;
- read(version=) snapshot isolation + time travel: a reader resolves one
                 manifest and only ever sees that manifest's files, no
                 matter what commits land mid-query;
- rollback(v)    a new manifest duplicating version v's file list
                 (git-revert style — history is preserved);
- vacuum(keep)   deletes data files unreachable from the newest `keep`
                 manifests (the only destructive operation, run it like
                 Delta's VACUUM after the time-travel window lapses).

Commit protocol (optimistic concurrency, the Delta log trick on a POSIX
filesystem): the manifest is fully written to a temp file, then
`os.link`ed to its final `v<N>.json` name — link is atomic and FAILS if
the name exists, so two writers racing to version N cannot both win;
the loser either retries on a fresh snapshot (append) or raises
`ConcurrentWriteError` (read-modify-write ops, whose base snapshot is
stale by definition). A crash mid-commit leaves data files with no
manifest pointing at them — invisible to readers, reclaimed by vacuum.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


class ConcurrentWriteError(RuntimeError):
    """Another commit landed after this operation's base snapshot."""


class VersionedParquetTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        partition_cols: list[str] | None = None,  # accepted for seam parity;
        # manifests list files directly, so directory-partition pruning does
        # not apply — filter pushdown still works via parquet row-group stats
        fmt: str = "parquet",
    ):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.fmt = fmt
        self._mdir = os.path.join(path, "_manifests")

    # ------------------------------------------------------------ manifests

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version:08d}.json")

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._mdir):
            return []
        return sorted(
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(self._mdir, "v*.json"))
        )

    def current_version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else 0

    def _load_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _try_commit(self, version: int, files: list[str], op: str) -> bool:
        os.makedirs(self._mdir, exist_ok=True)
        body = {
            "version": version,
            "op": op,
            "files": sorted(files),
            "committed_at": time.time(),
        }
        tmp = os.path.join(self._mdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(body, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._manifest_path(version))  # atomic + exclusive
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------- data IO

    def _write_commit_files(self, df: DataFrame) -> list[str]:
        cdir = os.path.join(self.path, "files", uuid.uuid4().hex)
        (
            df.select(*[f.name for f in self.schema.fields])
            .write.mode("overwrite")
            .format(self.fmt)
            .save(cdir)
        )
        return [
            os.path.relpath(p, self.path)
            for p in glob.glob(os.path.join(cdir, f"*.{self.fmt}"))
        ]

    # ---------------------------------------------------------- public API

    def exists(self) -> bool:
        return bool(self._versions())

    def ensure(self) -> None:
        if not self.exists():
            self._try_commit(1, [], "create")

    def read(self, version: int | None = None) -> DataFrame:
        self.ensure()
        v = self.current_version() if version is None else version
        files = self._load_manifest(v)["files"]
        if not files:
            return self.spark.createDataFrame([], self.schema)
        return (
            self.spark.read.schema(self.schema)
            .format(self.fmt)
            .load([os.path.join(self.path, f) for f in files])
        )

    def append(self, df: DataFrame) -> None:
        self.ensure()
        new_files = self._write_commit_files(df)
        while True:  # zero-copy append: retry on a racing commit
            base = self.current_version()
            prior = self._load_manifest(base)["files"]
            if self._try_commit(base + 1, prior + new_files, "append"):
                return

    def _rewrite(self, df: DataFrame, base: int, op: str) -> None:
        new_files = self._write_commit_files(df)
        if not self._try_commit(base + 1, new_files, op):
            raise ConcurrentWriteError(
                f"{op}: version {base + 1} was committed by another writer "
                f"after this operation read version {base}"
            )

    def overwrite(self, df: DataFrame) -> None:
        self.ensure()
        # materialize through the commit dir first — the plan may read this
        # table's current files, and they are never touched anyway
        self._rewrite(df, self.current_version(), "overwrite")

    def merge_upsert(self, updates: DataFrame, key_cols: list[str]) -> None:
        self.ensure()
        base = self.current_version()
        current = self.read(base)
        survivors = current.join(
            F.broadcast(updates.select(*key_cols).distinct()), key_cols, "left_anti"
        )
        merged = survivors.unionByName(
            updates.select(*[f.name for f in self.schema.fields])
        )
        self._rewrite(merged, base, "merge_upsert")

    def delete_where(self, condition) -> None:
        self.ensure()
        base = self.current_version()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        self._rewrite(self.read(base).filter(~cond | cond.isNull()), base, "delete")

    def update_where(self, condition, assignments: dict) -> None:
        self.ensure()
        base = self.current_version()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        df = self.read(base)
        for col, val in assignments.items():
            v = F.expr(val) if isinstance(val, str) else val
            df = df.withColumn(col, F.when(cond, v).otherwise(F.col(col)))
        self._rewrite(df, base, "update")

    # ------------------------------------------------------- admin surface

    def history(self) -> list[dict]:
        return [
            {k: m[k] for k in ("version", "op", "committed_at")}
            | {"n_files": len(m["files"])}
            for m in (self._load_manifest(v) for v in self._versions())
        ]

    def rollback(self, version: int) -> None:
        """Restore `version`'s contents as a NEW commit (history preserved)."""
        files = self._load_manifest(version)["files"]
        while True:
            base = self.current_version()
            if self._try_commit(base + 1, files, f"rollback_to_v{version}"):
                return

    def vacuum(self, keep_last: int = 1) -> int:
        """Delete data files unreachable from the newest `keep_last`
        manifests, and drop the older manifests. Returns files deleted.
        Destroys time travel beyond the window — run after it lapses."""
        vs = self._versions()
        keep_vs = vs[-keep_last:] if keep_last else vs
        live: set[str] = set()
        for v in keep_vs:
            live.update(self._load_manifest(v)["files"])
        deleted = 0
        for p in glob.glob(os.path.join(self.path, "files", "*", f"*.{self.fmt}")):
            if os.path.relpath(p, self.path) not in live:
                os.unlink(p)
                deleted += 1
        for d in glob.glob(os.path.join(self.path, "files", "*")):
            if not os.listdir(d):
                shutil.rmtree(d, ignore_errors=True)
        for v in vs[:-keep_last] if keep_last else []:
            os.unlink(self._manifest_path(v))
        return deleted
