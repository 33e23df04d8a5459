#!/usr/bin/env python
"""A/B timing for bench anchors under an env-var-toggled change
(optimization-round tooling). Alternates the two settings within one
session (ABBA ordering per round) so epoch drift hits both arms
equally; prints per-arm medians.

Usage:
  KEY=ENVVAR A=val1 B=val2 ROUNDS=3 python scripts/ab_anchor.py q1 q2 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    key = os.environ["KEY"]
    val_a = os.environ["A"]
    val_b = os.environ["B"]
    rounds = int(os.environ.get("ROUNDS", "3"))
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from karna_spark.queries import REGISTRY
    from karna_spark.session import get_spark

    spark = get_spark(app_name="ab_anchor")

    def run(name: str, val: str) -> float:
        os.environ[key] = val
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = REGISTRY[name].builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        run(name, val_a)  # cold warmup, discarded
        a_times: list[float] = []
        b_times: list[float] = []
        for r in range(rounds):
            order = [(val_a, a_times), (val_b, b_times)]
            if r % 2:
                order.reverse()
            for val, sink in order:
                sink.append(run(name, val))
        med_a = statistics.median(a_times)
        med_b = statistics.median(b_times)
        print(
            f"{name}: {key}={val_a} median={med_a:.3f} {sorted(round(x,3) for x in a_times)} | "
            f"{key}={val_b} median={med_b:.3f} {sorted(round(x,3) for x in b_times)} | "
            f"delta={med_b - med_a:+.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
