"""Versioned parquet table with MERGE — Delta-Lake-shaped storage layer.

When `delta-spark` is importable we use the real thing (see
``session.HAS_DELTA``); this fallback keeps the same operator surface on
plain parquet so the engine runs anywhere:

    tbl = ManagedTable(spark, path, partition_by=["record_type"])
    tbl.create(df)                      # mode=error first write (S5)
    tbl.merge(batch, keys=[...])        # null-safe upsert (S6/J4/M6)
    tbl.read()                          # latest snapshot, pushdown-able (S7)
    tbl.read(version=3)                 # time-travel lite

Layout: ``<path>/v=<n>/...parquet`` per version plus a ``_LATEST`` pointer
file written last — readers resolve the pointer, so a crashed writer leaves
only an orphan directory, never a torn table (single-writer discipline per
table, which the reference also imposes: delta worker concurrency=1,
/root/reference/services/workers/tasks/queue_for_delta.py:21-23).

Scale notes: with ``partition_by`` set and the partition columns part of
the merge key, the merge join runs only against the partitions the source
batch touches (partition-pruned anti join) — the same file-pruning idea as
Delta's MERGE (inner-join to find touched files, rewrite those). This
fallback still copies untouched partitions forward into the new version
(simple, crash-safe); real Delta (used automatically when available) keeps
untouched files in place via the transaction log. Partition the silver
table by low-cardinality record_type and cluster by ticker within files
for row-group skipping.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import align_schemas, merge_upsert


class TableExistsError(RuntimeError):
    pass


class ManagedTable:
    def __init__(self, spark: SparkSession, path: str,
                 partition_by: Sequence[str] = ()) -> None:
        self.spark = spark
        self.path = path
        self.partition_by = list(partition_by)

    # -- pointer management -------------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_LATEST")

    def exists(self) -> bool:
        return os.path.exists(self._pointer)

    def latest_version(self) -> int:
        with open(self._pointer) as fh:
            return json.load(fh)["version"]

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version:06d}")

    def _commit(self, version: int, meta: dict) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "committed_at": time.time(), **meta}, fh)
        os.replace(tmp, self._pointer)  # atomic pointer swap

    # -- write paths --------------------------------------------------------
    def _write(self, df: DataFrame, version: int, meta: dict) -> None:
        out = self._version_dir(version)
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(out)
        self._commit(version, meta)

    def create(self, df: DataFrame, mode: str = "error") -> None:
        """First write. mode='error' mirrors delta-rs mode=error (S5)."""
        if self.exists():
            if mode == "error":
                raise TableExistsError(self.path)
            if mode == "ignore":
                return
        os.makedirs(self.path, exist_ok=True)
        self._write(df, (self.latest_version() + 1) if self.exists() else 0,
                    {"op": "create"})

    def overwrite(self, df: DataFrame) -> None:
        if not self.exists():
            self.create(df)
        else:
            self._write(df, self.latest_version() + 1, {"op": "overwrite"})

    def merge(self, source: DataFrame, keys: Sequence[str],
              dedup_source_order: Sequence[Column] | None = None) -> None:
        """Null-safe update_all/insert_all upsert; creates on first call.

        With partition_by set and the partition columns part of the merge
        key, only partitions present in the source are read and rewritten.
        """
        if not self.exists():
            self.create(source if dedup_source_order is None
                        else source.dropDuplicates(list(keys)))
            return
        target = self.read()
        next_version = self.latest_version() + 1
        prunable = [p for p in self.partition_by if p in keys]
        if prunable and self.partition_by == prunable:
            touched = [r.asDict() for r in
                       source.select(*prunable).distinct().collect()]
            pred = F.lit(False)
            for t in touched:
                row_match = F.lit(True)
                for k, v in t.items():
                    row_match = row_match & F.col(k).eqNullSafe(F.lit(v))
                pred = pred | row_match
            touched_target = target.filter(pred)
            merged_touched = merge_upsert(touched_target, source, keys,
                                          dedup_source_order)
            untouched = target.filter(~pred)
            untouched, merged_touched = align_schemas(untouched, merged_touched)
            merged = untouched.unionByName(merged_touched)
        else:
            merged = merge_upsert(target, source, keys, dedup_source_order)
        self._write(merged, next_version, {"op": "merge", "keys": list(keys)})

    # -- read path ----------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        return self.spark.read.parquet(self._version_dir(v))

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop version directories older than the newest ``keep_last``."""
        latest = self.latest_version()
        for name in os.listdir(self.path):
            if name.startswith("v="):
                v = int(name.split("=")[1])
                if v <= latest - keep_last:
                    shutil.rmtree(os.path.join(self.path, name),
                                  ignore_errors=True)
