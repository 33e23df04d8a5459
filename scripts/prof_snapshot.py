#!/usr/bin/env python
"""Phase-labelled profile of a snapshot lifecycle anchor: wraps the
SnapshotStore verbs with setJobDescription so the REST job table maps
to lifecycle phases. Optimization-round tooling.

Usage: python scripts/prof_snapshot.py <anchor> [sf_dir]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from karna_spark.io.snapshots import SnapshotStore
    from karna_spark.queries import REGISTRY
    from karna_spark.session import get_spark

    spark = get_spark(
        app_name=f"prof_{name}",
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4056"},
    )
    sc = spark.sparkContext

    for meth in (
        "commit", "upsert", "apply_changes", "compact", "merge",
        "repartition_spec", "_write", "read", "read_change_feed",
        "delete_where", "delete_keys", "clone",
    ):
        if not hasattr(SnapshotStore, meth):
            continue
        orig = getattr(SnapshotStore, meth)

        def wrap(orig=orig, meth=meth):
            @functools.wraps(orig)
            def inner(*a, **kw):
                prev = sc.getLocalProperty("spark.job.description")
                sc.setJobDescription(f"{prev or ''}/{meth}")
                try:
                    return orig(*a, **kw)
                finally:
                    sc.setJobDescription(prev)
            return inner

        setattr(SnapshotStore, meth, wrap())

    def run() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = REGISTRY[name].builder(spark, sf_dir)
        sc.setJobDescription("final_noop_save")
        df.write.format("noop").mode("overwrite").save()
        sc.setJobDescription(None)
        return time.perf_counter() - t0

    cold = run()
    tracker = sc.statusTracker()
    first_warm_job = (max(tracker.getJobIdsForGroup() or [-1]) + 1)
    warm = run()
    print(f"{name}: cold={cold:.3f}s warm={warm:.3f}s", file=sys.stderr)

    app_id = sc.applicationId
    base = f"http://localhost:4056/api/v1/applications/{app_id}"
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs?status=succeeded"))
    agg: dict[str, list[float]] = {}
    for j in jobs:
        if j["jobId"] < first_warm_job:
            continue
        desc = j.get("description") or j["name"].split(" at ")[0]
        t0 = time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
        ms0 = float(j["submissionTime"][20:23] or 0) / 1000
        t1 = time.mktime(time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
        ms1 = float(j["completionTime"][20:23] or 0) / 1000
        dur = (t1 + ms1) - (t0 + ms0)
        a = agg.setdefault(desc, [0.0, 0, 0])
        a[0] += dur
        a[1] += 1
        a[2] += j["numCompletedTasks"]
    print(f"warm pass phases (wall includes driver gaps between jobs only within each job):")
    for desc, (dur, njobs, ntasks) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"  {dur:7.2f}s  jobs={njobs:>3} tasks={ntasks:>5}  {desc[:100]}")
    print(f"sum_job_wall={sum(a[0] for a in agg.values()):.2f}s wall_warm={warm:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
