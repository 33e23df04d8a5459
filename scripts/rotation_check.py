#!/usr/bin/env python
"""Freshness-policy audit for the driver's 50-query certification cap.

The external driver certifies only the FIRST 50 registry entries each
round (CORRECTNESS_rN.json always holds exactly 50 rows). Policy
(karna_spark/queries/__init__.py): every registered query's newest
driver row must stay ≤ ceil(N/50) rounds old. This script computes
per-query freshness from the CORRECTNESS_r*.json artifacts and the
CURRENT registry order, then reports:

- what the upcoming round's top-50 will certify (never-checked vs
  stale cohorts),
- any query that would BREACH the floor next round because it is
  neither fresh enough nor inside the top-50 (exit code 1),
- the backlog the following rounds must absorb.

Run before committing a registry reorder:  python scripts/rotation_check.py
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from karna_spark.queries import REGISTRY

    names = list(REGISTRY)
    n = len(names)
    floor = math.ceil(n / 50)

    newest: dict[str, int] = {}
    rounds = []
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(f.rsplit("_r", 1)[1].split(".")[0])
        rounds.append(r)
        for q in json.load(open(f)):
            newest[q] = max(newest.get(q, 0), r)
    if not rounds:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    this_round = max(rounds) + 1  # the round whose top-50 we are planning

    top50 = set(names[:50])
    never = [q for q in names if q not in newest]
    print(f"registered: {n}   freshness floor: {floor} rounds   "
          f"planning round: r{this_round}")
    print(f"top-50: {len([q for q in never if q in top50])} never-checked, "
          f"{len([q for q in top50 if q in newest])} re-certifications")

    breaches = []
    for q in names:
        if q in top50:
            continue  # certified this round
        if q not in newest:
            breaches.append((q, "never checked and outside top-50"))
            continue
        age_next = this_round - newest[q]
        if age_next > floor:
            breaches.append(
                (q, f"newest row r{newest[q]} would be {age_next} rounds old")
            )
    if breaches:
        print(f"\nPOLICY BREACH — {len(breaches)} queries:")
        for q, why in breaches:
            print(f"  {q}: {why}")
        return 1

    backlog = sorted(
        ((newest[q], q) for q in names if q not in top50 and q in newest)
    )
    by_round: dict[int, int] = {}
    for r, _ in backlog:
        by_round[r] = by_round.get(r, 0) + 1
    print("backlog past the cap by newest-row round:",
          {f"r{r}": c for r, c in sorted(by_round.items())})
    oldest = [q for r, q in backlog if r == backlog[0][0]][:50]
    print(f"next round must lead with the r{backlog[0][0]} cohort "
          f"({len(oldest)} shown): {oldest[:10]}...")
    print("OK — no query breaches the freshness floor")
    return 0


if __name__ == "__main__":
    sys.exit(main())
