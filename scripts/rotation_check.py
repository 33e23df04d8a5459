#!/usr/bin/env python
"""Freshness-policy audit for the driver's 50-query certification cap.

The external driver certifies only the FIRST 50 registry entries each
round (CORRECTNESS_rN.json always holds exactly 50 rows). Policy
(karna_spark/queries/__init__.py), checked mechanically here:

1. FLOOR — every registered query's newest driver row must stay
   ≤ ceil(N/50) rounds old. Computed from the CORRECTNESS_r*.json
   artifacts and the CURRENT registry order; any query that would
   breach next round (neither fresh enough nor inside the top-50)
   exits 1.
2. NEW-QUERY RULE — a query with no driver row must sit inside the
   upcoming top-50 (registered ⇒ certified on its first eligible
   round).
3. FEASIBILITY — an earliest-deadline-first simulation of the next
   2×floor rounds (deadline = newest row + floor; the planning
   round's top-50 is taken as given) must never need more than 50
   slots in a round. This catches certification cliffs the
   instantaneous check can't see (e.g. five size-50 cohorts all
   expiring in consecutive rounds).
4. CAPACITY — N ≤ 240 (policy cap; the schedulability bound is
   50×floor). Exceeding it demands consolidation, not a bigger floor.

Run before committing a registry reorder:  python scripts/rotation_check.py

``--assume-reorder`` (r9 verdict item 8): evaluate the policy AS IF
the planning round's top-50 were the EDF-obligatory head (never-checked
queries first, then stalest-deadline-first) instead of the current
registry order. Between a round's CORRECTNESS landing and the next
round's reorder commit the registry head is expectedly stale; this
flag answers "does a compliant reorder EXIST?" so end-of-round state
is never spuriously red, while a genuinely infeasible registry still
fails under both modes.
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAPACITY_CAP = 240
UTILIZATION_WARN = 48  # sustained ≥48/50 rounds → consolidate soon


def edf_simulate(
    deadlines: dict[str, int], start_round: int, horizon: int, floor: int
) -> tuple[bool, list[tuple[int, int]]]:
    """Earliest-deadline-first schedule of re-certifications.

    ``deadlines`` maps query → the last round its current row stays
    fresh (newest + floor). Each simulated round certifies the 50
    most-urgent queries; a certified query's next deadline is
    round + floor. Returns (feasible, per-round utilization).
    """
    dl = dict(deadlines)
    usage: list[tuple[int, int]] = []
    for r in range(start_round, start_round + horizon):
        order = sorted(dl, key=lambda q: (dl[q], q))
        due_now = [q for q in order if dl[q] <= r]
        if len(due_now) > 50:
            return False, usage
        batch = order[:50]
        for q in batch:
            dl[q] = r + floor
        usage.append((r, len(due_now)))
    return True, usage


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

    assume_reorder = "--assume-reorder" in sys.argv[1:]
    if assume_reorder:
        # The obligatory head: never-checked first (rule 2a), then by
        # earliest deadline (newest + floor), ties in registry order.
        order = sorted(
            range(len(names)),
            key=lambda i: (newest.get(names[i], -(10 ** 9)) + floor, i),
        )
        head = [names[i] for i in order[:50]]
        top50 = set(head)
        print("mode: --assume-reorder (policy evaluated against the "
              "EDF-obligatory head, not the current registry order)")
    else:
        top50 = set(names[:50])
    never = [q for q in names if q not in newest]
    print(f"registered: {n}   freshness floor: {floor} rounds   "
          f"policy cap: {CAPACITY_CAP}   planning round: r{this_round}")
    print(f"top-50: {len([q for q in never if q in top50])} never-checked, "
          f"{len([q for q in top50 if q in newest])} re-certifications")

    failures: list[str] = []

    # ------------------------------------------------------ rule 4: capacity
    if n > CAPACITY_CAP:
        failures.append(
            f"CAPACITY: N={n} exceeds the policy cap {CAPACITY_CAP} — "
            "retire/merge dominated rows before adding more"
        )

    # ----------------------------------------- rules 1+2: instantaneous floor
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
        failures.append(f"FLOOR: {len(breaches)} queries breach")
        for q, why in breaches:
            print(f"  BREACH {q}: {why}")

    # ------------------------------------------------- rule 3: EDF simulation
    # After the planning round's top-50 certifies, deadlines are:
    deadlines = {}
    for q in names:
        base = this_round if q in top50 else newest.get(q, this_round - floor)
        deadlines[q] = base + floor
    horizon = 2 * floor
    feasible, usage = edf_simulate(deadlines, this_round + 1, horizon, floor)
    peak = max((u for _, u in usage), default=0)
    avg = sum(u for _, u in usage) / len(usage) if usage else 0.0
    print(f"EDF simulation r{this_round + 1}..r{this_round + horizon}: "
          f"{'feasible' if feasible else 'INFEASIBLE'}  "
          f"peak due/round = {peak}  avg = {avg:.1f}")
    if not feasible:
        failures.append(
            "FEASIBILITY: a future round would owe more than 50 "
            "re-certifications — consolidate the registry or stagger additions"
        )
    elif peak >= UTILIZATION_WARN:
        print(f"WARNING: peak utilization {peak}/50 — headroom for only "
              f"{50 - peak} new queries/round; plan consolidation")

    backlog = sorted(
        ((newest[q], q) for q in names if q not in top50 and q in newest)
    )
    by_round: dict[int, int] = {}
    for r, _ in backlog:
        by_round[r] = by_round.get(r, 0) + 1
    print("backlog past the cap by newest-row round:",
          {f"r{r}": c for r, c in sorted(by_round.items())})
    if backlog:
        oldest = [q for r, q in backlog if r == backlog[0][0]][:50]
        print(f"next round must lead with the r{backlog[0][0]} cohort "
              f"({len(oldest)} shown): {oldest[:10]}...")

    if failures:
        print("\nPOLICY BREACH:")
        for f_ in failures:
            print(f"  {f_}")
        return 1
    print("OK — floor satisfied, EDF-feasible, under capacity")
    return 0


if __name__ == "__main__":
    sys.exit(main())
