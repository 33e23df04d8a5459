"""Manifest-versioned parquet store: snapshots + time travel (S9 depth).

The reference intends object-store-resident tabular files fronted by a
catalog (reference docker-compose.yaml:2-40 — MinIO for data, Postgres
for metadata). ``upsert.py`` gives partition-scoped merge over plain
parquet but mutates in place: history is lost and concurrent readers
can observe a half-written partition. This module adds the missing
table-format layer — an Iceberg-style manifest per version over
immutable data files — with pure-Spark writes:

Layout (all immutable once written)::

    <root>/data/<pc>=<val>/v=<N>/part-*.parquet   data files
    <root>/_manifests/v<N>.json                   {partition val -> version}

- A **commit** writes its rows under ``v=<N>`` partition subdirs via
  ``partitionBy(pc, "v")`` — a brand-new version number, so it can
  never collide with files any existing manifest references.
- The new **manifest** is the previous one with only the affected
  partition pointers repointed at N. Untouched partitions keep their
  old pointers: copy-on-write at partition granularity — zero data
  movement for the untouched 99% of a 100 TB table.
- **Readers** resolve a manifest to a dir list and hand Spark exactly
  those leaf dirs with ``basePath`` set, so the partition column and
  the version column come back from directory parsing and partition
  pruning still works. Snapshot isolation falls out: a reader pinned
  to manifest N sees byte-identical data forever, regardless of later
  commits. Manifest publication is a single JSON rename — the atomic
  commit point (same mechanism as Iceberg's version-hint swap).

Scale: the manifest holds one entry per *partition* (not per file), so
resolution is O(partitions) driver-side — thousands, not billions. A
production deployment shards manifests per Iceberg once partition
count outgrows one JSON, with identical reader mechanics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    """Versioned partitioned parquet table rooted at ``root``."""

    def __init__(self, root: str, partition_col: str):
        self.root = root
        self.pc = partition_col
        self.data = os.path.join(root, "data")
        self.mdir = os.path.join(root, "_manifests")
        os.makedirs(self.mdir, exist_ok=True)

    # ---------------------------------------------------- manifests
    def _mpath(self, v: int) -> str:
        return os.path.join(self.mdir, f"v{v}.json")

    def latest_version(self) -> int:
        vs = [
            int(f[1:-5])
            for f in os.listdir(self.mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(vs, default=0)

    def _manifest(self, v: int) -> dict[str, int]:
        with open(self._mpath(v)) as fh:
            return json.load(fh)["partitions"]

    def _publish(self, v: int, partitions: dict[str, int]) -> None:
        tmp = self._mpath(v) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": v, "partitions": partitions}, fh, sort_keys=True)
        os.rename(tmp, self._mpath(v))  # atomic commit point

    # ------------------------------------------------------- writes
    def _write(self, df: DataFrame, v: int) -> list[str]:
        """Write ``df`` under v=<v> subdirs; return affected values."""
        affected = [str(r[0]) for r in df.select(self.pc).distinct().collect()]
        (
            df.withColumn("v", F.lit(v))
            .write.mode("append")
            .partitionBy(self.pc, "v")
            .parquet(self.data)
        )
        return affected

    def commit(self, df: DataFrame) -> int:
        """Full-snapshot commit (initial load or full rewrite)."""
        v = self.latest_version() + 1
        affected = self._write(df, v)
        self._publish(v, {a: v for a in affected})
        return v

    def upsert(self, spark: SparkSession, delta: DataFrame, key_cols: list[str]) -> int:
        """Partition-scoped merge producing a new snapshot. Rows whose
        ``key_cols`` match a delta row are replaced; only partitions
        the delta touches are rewritten (copy-on-write), everything
        else is inherited by manifest pointer."""
        v = self.latest_version() + 1
        prev = self._manifest(v - 1)
        affected = sorted(
            {str(r[0]) for r in delta.select(self.pc).distinct().collect()}
        )
        existing = self.read(
            spark, version=v - 1, partition_values=[a for a in affected if a in prev]
        )
        keep = existing.join(delta.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = keep.unionByName(delta)
        self._write(merged, v)
        self._publish(v, {**prev, **{a: v for a in affected}})
        return v

    def apply_changes(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key_cols: list[str],
        op_col: str = "op",
    ) -> int:
        """CDC apply: merge a change feed carrying an op column
        ('I'/'U' upsert, 'D' delete) into a new snapshot. Rows whose
        keys match ANY change row are removed from the affected
        partitions; non-delete change rows are then re-inserted —
        i.e. I/U are last-writer upserts and D is a tombstone-free
        hard delete (the row simply doesn't appear in the new
        version; prior versions still serve it, which IS the retention
        story). Change rows must carry the partition column: deletes
        prune to their partition like any other change, so a feed
        touching k partitions rewrites exactly k partitions."""
        v = self.latest_version() + 1
        prev = self._manifest(v - 1)
        affected = sorted(
            {str(r[0]) for r in changes.select(self.pc).distinct().collect()}
        )
        existing = self.read(
            spark, version=v - 1, partition_values=[a for a in affected if a in prev]
        )
        keep = existing.join(changes.select(*key_cols).distinct(), key_cols, "left_anti")
        upserts = changes.filter(F.col(op_col) != "D").drop(op_col)
        merged = keep.unionByName(upserts)
        self._write(merged, v)
        self._publish(v, {**prev, **{a: v for a in affected}})
        return v

    # -------------------------------------------------------- reads
    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        partition_values: list[str] | None = None,
    ) -> DataFrame:
        """Read snapshot ``version`` (default: latest). Resolves the
        manifest to leaf dirs so Spark scans exactly the committed
        files; ``basePath`` restores the partition column and keeps
        partition pruning live for downstream filters."""
        v = self.latest_version() if version is None else version
        manifest = self._manifest(v)
        if partition_values is not None:
            manifest = {k: manifest[k] for k in partition_values}
        dirs = [
            os.path.join(self.data, f"{self.pc}={val}", f"v={pv}")
            for val, pv in sorted(manifest.items())
        ]
        if not dirs:
            raise ValueError(f"snapshot v{v} is empty")
        return (
            spark.read.option("basePath", self.data).parquet(*dirs).drop("v")
        )
