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

    def _claim_version(self) -> int:
        """Reserve the next version number exclusively. A ``.claim``
        marker is created with O_EXCL before any data is written, so a
        crashed commit's half-written ``v=<N>`` files are simply
        orphaned (never referenced — the retry claims N+1) and two
        concurrent writers can never write into the same version
        directory. Orphans are unreferenced garbage, Iceberg-style;
        a vacuum can drop any v=<N> dir with no published manifest."""
        v = self.latest_version() + 1
        while True:
            try:
                fd = os.open(
                    self._mpath(v) + ".claim",
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.close(fd)
                return v
            except FileExistsError:
                v += 1

    def _publish(self, v: int, partitions: dict[str, int]) -> None:
        tmp = self._mpath(v) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": v, "partitions": partitions}, fh, sort_keys=True)
        # Link-then-unlink instead of rename: os.link fails with EEXIST
        # if this version was somehow already published (rename would
        # silently last-win), so a version can only ever be created
        # once — the atomic commit point.
        os.link(tmp, self._mpath(v))
        os.unlink(tmp)

    # ------------------------------------------------------- writes
    def _write(self, df: DataFrame, v: int) -> list[str]:
        """Write ``df`` under v=<v> subdirs; return the partition
        values actually WRITTEN (computed from the materialized result
        so the manifest never points at a directory the write did not
        create — a partition whose rows were all merged away yields no
        ``v=<N>`` subdir and must not be published)."""
        (
            df.withColumn("v", F.lit(v))
            .write.mode("append")
            .partitionBy(self.pc, "v")
            .parquet(self.data)
        )
        prefix = f"{self.pc}="
        return [
            d[len(prefix):]
            for d in os.listdir(self.data)
            if d.startswith(prefix)
            and os.path.isdir(os.path.join(self.data, d, f"v={v}"))
        ]

    def commit(self, df: DataFrame) -> int:
        """Full-snapshot commit (initial load or full rewrite)."""
        v = self._claim_version()
        written = self._write(df, v)
        self._publish(v, {a: v for a in written})
        return v

    def upsert(
        self,
        spark: SparkSession,
        delta: DataFrame,
        key_cols: list[str],
        validate_keys: bool = False,
    ) -> int:
        """Partition-scoped merge producing a new snapshot. Rows whose
        ``key_cols`` match a delta row are replaced; only partitions
        the delta touches are rewritten (copy-on-write), everything
        else is inherited by manifest pointer.

        INVARIANT — partition immutability: a key lives in one
        partition for its lifetime. The anti-join that retires old row
        versions only scans the partitions the delta names, so a delta
        row that moves an existing key to a DIFFERENT partition value
        would leave the old copy in place and duplicate the key across
        two partitions (the same contract Hive-style partitioned
        MERGE has). Pass ``validate_keys=True`` to detect moves with a
        full-snapshot key join and raise instead — O(|table|) per
        upsert, so it is opt-in."""
        v = self._claim_version()
        prev_v = self.latest_version()
        prev = self._manifest(prev_v)
        affected = sorted(
            {str(r[0]) for r in delta.select(self.pc).distinct().collect()}
        )
        if validate_keys and prev:
            moved = (
                self.read(spark, version=prev_v)
                .withColumnRenamed(self.pc, "_prev_pc")
                .select(*key_cols, "_prev_pc")
                .join(delta.select(*key_cols, self.pc).distinct(), key_cols)
                .filter(F.col("_prev_pc").cast("string") != F.col(self.pc).cast("string"))
                .limit(1)
                .collect()
            )
            if moved:
                raise ValueError(
                    f"upsert moves key {[moved[0][k] for k in key_cols]} "
                    f"across partitions ({moved[0]['_prev_pc']!r} -> "
                    f"{moved[0][self.pc]!r}); partition values are "
                    "immutable per key"
                )
        existing = self.read(
            spark, version=prev_v, partition_values=[a for a in affected if a in prev]
        )
        keep = existing.join(delta.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = keep.unionByName(delta)
        written = self._write(merged, v)
        manifest = {k: pv for k, pv in prev.items() if k not in set(affected)}
        manifest.update({a: v for a in written})
        self._publish(v, manifest)
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
        touching k partitions rewrites exactly k partitions. A feed
        that deletes EVERY remaining row of a partition empties it:
        the write produces no ``v=<N>`` directory for it, and the new
        manifest simply drops the partition (it reads as zero rows
        from this version on — no dangling pointer). Partition values
        are immutable per key, as in :meth:`upsert`."""
        v = self._claim_version()
        prev_v = self.latest_version()
        prev = self._manifest(prev_v)
        affected = sorted(
            {str(r[0]) for r in changes.select(self.pc).distinct().collect()}
        )
        existing = self.read(
            spark, version=prev_v, partition_values=[a for a in affected if a in prev]
        )
        keep = existing.join(changes.select(*key_cols).distinct(), key_cols, "left_anti")
        upserts = changes.filter(F.col(op_col) != "D").drop(op_col)
        merged = keep.unionByName(upserts)
        written = self._write(merged, v)
        manifest = {k: pv for k, pv in prev.items() if k not in set(affected)}
        manifest.update({a: v for a in written})
        self._publish(v, manifest)
        return v

    # ------------------------------------------------------ redact
    def redact(
        self,
        spark: SparkSession,
        key_cols: list[str],
        keys: DataFrame,
    ) -> int:
        """Erase rows matching ``keys`` from EVERY published version —
        the right-to-be-forgotten operation, which deliberately breaks
        snapshot immutability for exactly the matched rows while
        leaving all other rows byte-stable semantics (time travel
        still returns every non-redacted row of every version).

        Mechanics: each physical data directory ``<pc>=<val>/v=<N>``
        is rewritten AT MOST ONCE (a directory shared by many
        manifests via copy-on-write is rewritten a single time and
        every manifest that pointed at it is repointed), into a fresh
        claimed version directory — the original dirs are removed only
        after all rewrites succeed, and manifests are republished
        in-place last, so a crash mid-redact leaves every version
        readable (old pointers stay valid until the final swap).
        Returns the number of physical partition directories
        rewritten. Driver-side work is O(#versions × #partitions)
        manifest bookkeeping; data work is one filtered rewrite per
        affected directory."""
        published = sorted(
            int(f[1:-5])
            for f in os.listdir(self.mdir)
            if f.startswith("v") and f.endswith(".json")
        )
        manifests = {v: self._manifest(v) for v in published}
        # Physical dirs any manifest references: (partition value, ver).
        dirs = {(val, pv) for m in manifests.values() for val, pv in m.items()}
        kdf = keys.select(*key_cols).distinct()
        remap: dict[tuple[str, int], int] = {}
        removed_dirs: list[str] = []
        for val, pv in sorted(dirs):
            src = os.path.join(self.data, f"{self.pc}={val}", f"v={pv}")
            cur = spark.read.parquet(src)
            hit = cur.join(F.broadcast(kdf), key_cols, "left_semi").limit(1)
            if not hit.collect():
                continue  # directory untouched — stays byte-identical
            kept = cur.join(F.broadcast(kdf), key_cols, "left_anti")
            nv = self._claim_version()
            (
                kept.withColumn(self.pc, F.lit(val))
                .withColumn("v", F.lit(nv))
                .write.mode("append")
                .partitionBy(self.pc, "v")
                .parquet(self.data)
            )
            dst = os.path.join(self.data, f"{self.pc}={val}", f"v={nv}")
            remap[(val, pv)] = nv if os.path.isdir(dst) else -1
            removed_dirs.append(src)
        # Republish every manifest with repointed (or dropped, if the
        # rewrite emptied the directory) partitions, then drop originals.
        for v, m in manifests.items():
            new_m: dict[str, int] = {}
            for val, pv in m.items():
                nv = remap.get((val, pv), pv)
                if nv != -1:  # -1 == rewrite emptied the directory
                    new_m[val] = nv
            tmp = self._mpath(v) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {"version": v, "partitions": new_m}, fh, sort_keys=True
                )
            os.replace(tmp, self._mpath(v))  # in-place swap, atomic
        import shutil

        for src in removed_dirs:
            shutil.rmtree(src, ignore_errors=True)
        return len(removed_dirs)

    # ------------------------------------------------------ vacuum
    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Garbage-collect data directories no retained manifest
        references: expired-version data (time travel keeps the last
        ``retain_last`` published versions) and orphans from crashed
        commits (a claimed version with no manifest). Returns the
        deleted ``<pc>=<val>/v=<N>`` relative paths.

        Mirrors Iceberg's expire-snapshots/orphan-file split: manifest
        JSONs for expired versions are removed too, so
        ``latest_version`` stays correct and a reader asking for an
        expired version fails loudly rather than reading half a
        snapshot. Claim markers are kept — version numbers must never
        be reused even after a vacuum."""
        import shutil

        published = sorted(
            int(f[1:-5])
            for f in os.listdir(self.mdir)
            if f.startswith("v") and f.endswith(".json")
        )
        retained = published[-retain_last:] if retain_last > 0 else []
        live: set[tuple[str, int]] = set()
        for v in retained:
            live.update((val, pv) for val, pv in self._manifest(v).items())
        deleted = []
        prefix = f"{self.pc}="
        for d in sorted(os.listdir(self.data)):
            if not d.startswith(prefix):
                continue
            val = d[len(prefix):]
            pdir = os.path.join(self.data, d)
            for vd in sorted(os.listdir(pdir)):
                if not vd.startswith("v="):
                    continue
                if (val, int(vd[2:])) not in live:
                    shutil.rmtree(os.path.join(pdir, vd))
                    deleted.append(os.path.join(d, vd))
        for f in os.listdir(self.mdir):
            if f.endswith(".json") and int(f[1:-5]) not in retained:
                os.unlink(os.path.join(self.mdir, f))
        return deleted

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
