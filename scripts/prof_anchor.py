#!/usr/bin/env python
"""Per-anchor profiler (optimization-round tooling): run one bench
anchor with the Spark UI enabled and dump a per-job breakdown (wall
time, stage/task counts, shuffle bytes) from the UI REST API, so the
fixed-cost structure of an anchor (how many jobs? how many tiny
tasks?) is visible without guessing.

Usage: python scripts/prof_anchor.py <anchor> [sf_dir]
Timing protocol matches bench.py: clearCache, builder, noop sink; one
cold pass then one profiled warm pass (job window = warm pass only).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from karna_spark.queries import REGISTRY
    from karna_spark.session import get_spark

    spark = get_spark(
        app_name=f"prof_{name}",
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )

    def run() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = REGISTRY[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    cold = run()
    tracker = spark.sparkContext.statusTracker()
    first_warm_job = (max(tracker.getJobIdsForGroup() or [-1]) + 1)
    warm = run()
    print(f"{name}: cold={cold:.3f}s warm={warm:.3f}s", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4055/api/v1/applications/{app_id}"
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs?status=succeeded"))
    stages = {
        s["stageId"]: s
        for s in json.load(urllib.request.urlopen(f"{base}/stages?status=COMPLETE"))
    }
    rows = []
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        if j["jobId"] < first_warm_job:
            continue
        t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        sids = sorted(j["stageIds"])
        st = [stages[s] for s in sids if s in stages]
        rows.append(
            {
                "job": j["jobId"],
                "desc": (j.get("description") or j["name"])[:90],
                "stages": len(sids),
                "tasks": j["numCompletedTasks"],
                "task_time_ms": sum(s.get("executorRunTime", 0) for s in st),
                "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in st),
                "sub": j["submissionTime"][11:23],
                "dur_s": max(0, time.mktime(t1) - time.mktime(t0)),
            }
        )
    print(f"warm pass: {len(rows)} jobs")
    for r in rows:
        print(
            f"  job {r['job']:>4} stages={r['stages']:>2} tasks={r['tasks']:>4} "
            f"taskms={r['task_time_ms']:>7} shw={r['shuffle_write']:>9} "
            f"{r['sub']}  {r['desc']}"
        )
    print(
        f"TOTALS jobs={len(rows)} tasks={sum(r['tasks'] for r in rows)} "
        f"task_time_s={sum(r['task_time_ms'] for r in rows)/1000:.1f} "
        f"wall_warm={warm:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
