"""SnapshotStore (io/snapshots.py): manifest time travel, snapshot
isolation, and partition-granular copy-on-write."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from karna_spark.io.snapshots import SnapshotStore


def _rows(df):
    return sorted((r["k"], r["p"], r["val"]) for r in df.collect())


def _mk(spark, data):
    return spark.createDataFrame([Row(k=k, p=p, val=v) for k, p, v in data])


def test_time_travel_three_versions(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), "p")
    store.commit(_mk(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    # v2: replace k=1, add k=4, both in partition a; b untouched.
    store.upsert(spark, _mk(spark, [(1, "a", 11), (4, "a", 40)]), ["k"])
    # v3: touch only b.
    store.upsert(spark, _mk(spark, [(3, "b", 31)]), ["k"])

    assert _rows(store.read(spark, 1)) == [(1, "a", 10), (2, "a", 20), (3, "b", 30)]
    assert _rows(store.read(spark, 2)) == [
        (1, "a", 11), (2, "a", 20), (3, "b", 30), (4, "a", 40)]
    assert _rows(store.read(spark)) == [  # latest == v3
        (1, "a", 11), (2, "a", 20), (3, "b", 31), (4, "a", 40)]


def test_copy_on_write_inherits_untouched_partition_files(spark, tmp_path):
    root = str(tmp_path / "t")
    store = SnapshotStore(root, "p")
    store.commit(_mk(spark, [(1, "a", 10), (3, "b", 30)]))
    b_files_v1 = sorted(glob.glob(os.path.join(root, "data", "p=b", "v=1", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in b_files_v1}
    store.upsert(spark, _mk(spark, [(1, "a", 11)]), ["k"])
    # Partition b gained no new version dir and its v=1 files are
    # byte-untouched: the v2 manifest points at the same immutable files.
    assert not glob.glob(os.path.join(root, "data", "p=b", "v=2"))
    assert {f: os.path.getmtime(f) for f in b_files_v1} == mtimes
    m = store._manifest(2)
    assert m["b"] == 1 and m["a"] == 2


def test_snapshot_isolation_under_later_commits(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), "p")
    store.commit(_mk(spark, [(1, "a", 10)]))
    pinned = store.read(spark, 1)  # lazy plan pinned to manifest v1
    for v in range(5):
        store.upsert(spark, _mk(spark, [(1, "a", 100 + v)]), ["k"])
    # Evaluating the pinned reader AFTER five commits still yields v1.
    assert _rows(pinned) == [(1, "a", 10)]


def test_partition_pruned_snapshot_read(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), "p")
    store.commit(_mk(spark, [(1, "a", 10), (3, "b", 30), (5, "c", 50)]))
    df = store.read(spark, partition_values=["b"])
    assert _rows(df) == [(3, "b", 30)]


def test_zorder_prefix_bounds_both_dimensions(spark):
    # The S13 claim: every 256-wide z-prefix bucket spans at most 16
    # consecutive values in EACH of the two interleaved dimensions.
    from karna_spark.queries.registry import REGISTRY

    df = REGISTRY["zorder_layout_stats"].builder(spark, "/root/testdata/sf0.001")
    bad = df.filter(
        ((F.col("pa_hi") - F.col("pa_lo")) > 15)
        | ((F.col("pb_hi") - F.col("pb_lo")) > 15)
    ).count()
    assert bad == 0


def test_streaming_snapshot_versions_monotone(spark):
    # Every micro-batch publishes one snapshot; each stays readable
    # after later commits and total event counts only grow.
    import os
    import uuid

    from karna_spark.streaming.jobs import (
        _STREAM_CACHE,
        foreachbatch_snapshot_rollup,
        stage_events_split,
    )

    landing = stage_events_split(spark, "/root/testdata/sf0.001", n_files=3)
    root = os.path.join(_STREAM_CACHE, "snap_t", uuid.uuid4().hex[:10])
    store = foreachbatch_snapshot_rollup(spark, landing, root)
    assert store.latest_version() == 3
    totals = [
        store.read(spark, version=v).agg({"n_events": "sum"}).collect()[0][0]
        for v in (1, 2, 3)
    ]
    assert totals[0] < totals[1] < totals[2]


def test_cdc_delete_all_rows_of_partition_drops_pointer(spark, tmp_path):
    # r6 ADVICE: a change feed that deletes EVERY remaining row of a
    # partition must not publish a dangling manifest pointer — the
    # partition reads as zero rows in the new version (and in every
    # later version that inherits the manifest), while time travel to
    # the prior version still serves it.
    store = SnapshotStore(str(tmp_path / "t"), "p")
    store.commit(_mk(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    changes = _mk(spark, [(1, "a", 0), (2, "a", 0)]).withColumn("op", F.lit("D"))
    v2 = store.apply_changes(spark, changes, ["k"])
    assert _rows(store.read(spark, v2)) == [(3, "b", 30)]
    assert "a" not in store._manifest(v2)
    # A later commit touching only b inherits the dropped pointer.
    v3 = store.upsert(spark, _mk(spark, [(3, "b", 31)]), ["k"])
    assert _rows(store.read(spark, v3)) == [(3, "b", 31)]
    # History intact.
    assert _rows(store.read(spark, 1)) == [(1, "a", 10), (2, "a", 20), (3, "b", 30)]


def test_upsert_validate_keys_raises_on_partition_move(spark, tmp_path):
    import pytest

    store = SnapshotStore(str(tmp_path / "t"), "p")
    store.commit(_mk(spark, [(1, "a", 10), (3, "b", 30)]))
    mover = _mk(spark, [(1, "b", 11)])  # k=1 lives in partition a
    with pytest.raises(ValueError, match="across partitions"):
        store.upsert(spark, mover, ["k"], validate_keys=True)
    # Same-partition updates pass validation.
    v = store.upsert(spark, _mk(spark, [(1, "a", 11)]), ["k"], validate_keys=True)
    assert _rows(store.read(spark, v)) == [(1, "a", 11), (3, "b", 30)]


def test_crashed_commit_version_is_never_reused(spark, tmp_path):
    # A claim marker with no manifest == a writer that died mid-commit.
    # The retry must claim a FRESH version (no append into v=2's dir,
    # which would serve duplicated rows), and reads skip the hole.
    store = SnapshotStore(str(tmp_path / "t"), "p")
    store.commit(_mk(spark, [(1, "a", 10)]))
    open(store._mpath(2) + ".claim", "w").close()  # simulate crash at v2
    v = store.upsert(spark, _mk(spark, [(1, "a", 11)]), ["k"])
    assert v == 3
    assert _rows(store.read(spark)) == [(1, "a", 11)]
    assert not os.path.exists(store._mpath(2))


def test_vacuum_expires_history_and_orphans(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), "p")
    store.commit(_mk(spark, [(1, "a", 10), (3, "b", 30)]))     # v1
    store.upsert(spark, _mk(spark, [(1, "a", 11)]), ["k"])      # v2 (a only)
    # Orphan: a crashed commit claimed v3 and wrote into it, no manifest.
    open(store._mpath(3) + ".claim", "w").close()
    orphan = os.path.join(store.data, "p=a", "v=3")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-junk.parquet"), "w").close()
    v4 = store.upsert(spark, _mk(spark, [(3, "b", 31)]), ["k"])  # v4

    # Retain the last TWO published snapshots — v2 {a:2, b:1} and
    # v4 {a:2, b:4}; the v3 claim gap doesn't eat the retention
    # budget. Live dirs: a@v2, b@v1, b@v4. Collectible: a@v1 and the
    # v3 orphan.
    deleted = store.vacuum(retain_last=2)
    assert _rows(store.read(spark, v4)) == [(1, "a", 11), (3, "b", 31)]
    assert _rows(store.read(spark, 2)) == [(1, "a", 11), (3, "b", 30)]
    assert os.path.join("p=a", "v=3") in deleted
    assert os.path.join("p=a", "v=1") in deleted
    assert not os.path.exists(orphan)
    # Version numbers still never reused after vacuum.
    v5 = store.upsert(spark, _mk(spark, [(1, "a", 12)]), ["k"])
    assert v5 == 5


def test_vacuum_after_streaming_rollup(spark):
    # The streaming snapshot sink commits one version per micro-batch;
    # vacuum must keep the retained tail readable byte-for-byte and
    # make expired versions fail loudly instead of half-reading.
    import uuid

    import pytest

    from karna_spark.streaming.jobs import (
        _STREAM_CACHE,
        foreachbatch_snapshot_rollup,
        stage_events_split,
    )

    landing = stage_events_split(spark, "/root/testdata/sf0.001", n_files=3)
    root = os.path.join(_STREAM_CACHE, "snap_vac", uuid.uuid4().hex[:10])
    store = foreachbatch_snapshot_rollup(spark, landing, root)
    before = {
        v: sorted(map(tuple, store.read(spark, version=v).collect()))
        for v in (2, 3)
    }
    store.vacuum(retain_last=2)
    for v in (2, 3):
        got = sorted(map(tuple, store.read(spark, version=v).collect()))
        assert got == before[v], f"version {v} changed after vacuum"
    with pytest.raises(FileNotFoundError):
        store.read(spark, version=1)


def test_redact_erases_key_from_all_versions(spark, tmp_path):
    # Right-to-be-forgotten: the key disappears from EVERY version's
    # reads (including time travel), other rows are untouched, shared
    # copy-on-write directories are rewritten once, and untouched
    # directories stay byte-identical.
    root = str(tmp_path / "t")
    store = SnapshotStore(root, "p")
    store.commit(_mk(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))  # v1
    store.upsert(spark, _mk(spark, [(3, "b", 31)]), ["k"])                # v2
    store.upsert(spark, _mk(spark, [(2, "a", 21)]), ["k"])                # v3
    b_v2 = sorted(glob.glob(os.path.join(root, "data", "p=b", "v=2", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in b_v2}

    n = store.redact(spark, ["k"], _mk(spark, [(1, "x", 0)]).select("k"))
    # k=1 lived only in partition a — its dirs at v1 (shared by
    # manifests v1+v2) and v3 are rewritten; partition b untouched.
    assert n == 2
    assert _rows(store.read(spark, 1)) == [(2, "a", 20), (3, "b", 30)]
    assert _rows(store.read(spark, 2)) == [(2, "a", 20), (3, "b", 31)]
    assert _rows(store.read(spark, 3)) == [(2, "a", 21), (3, "b", 31)]
    assert {f: os.path.getmtime(f) for f in b_v2} == mtimes
    # Store still fully operational post-redact.
    v = store.upsert(spark, _mk(spark, [(4, "a", 40)]), ["k"])
    assert (4, "a", 40) in _rows(store.read(spark, v))


def test_redact_drops_partition_emptied_in_every_version(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "t"), "p")
    store.commit(_mk(spark, [(1, "a", 10), (3, "b", 30)]))
    store.redact(spark, ["k"], _mk(spark, [(1, "x", 0)]).select("k"))
    # Partition a is emptied by the redact: its pointer is dropped, the
    # version still reads (just without the erased row).
    assert _rows(store.read(spark, 1)) == [(3, "b", 30)]
    assert "a" not in store._manifest(1)
