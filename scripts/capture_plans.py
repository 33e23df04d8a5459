#!/usr/bin/env python
"""Capture .explain('formatted') for named registry queries into
plans/r12/<name>_<tag>.txt (optimization-round deliverable).

Usage: python scripts/capture_plans.py <tag> <query> [<query> ...]
Builders run at sf0.1 (side-effecting lifecycle builders execute their
commits first — the captured plan is the query's final read plan,
exactly what the bench's noop sink executes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    from karna_spark.queries import REGISTRY
    from karna_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
