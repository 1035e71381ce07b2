#!/usr/bin/env python
"""Driver-sample rotation lint (VERDICT r8 #7).

The round driver samples the FIRST ~50 keys of ``queries()`` (dict
order) for CORRECTNESS_r{N}.json. With 180+ contract queries, full
driver evidence needs the prefix rotated to the least-recently-sampled
cohort every round — this lint fails when that policy silently stops.

Checks:
1. The first SAMPLE keys of ``queries()`` must be exactly the SAMPLE
   least-recently-driver-sampled queries (ties by name; never-sampled
   and brand-new queries count as round 0, so they are always due).
   Order within the prefix is free.
2. Reports the staleness distribution and the max achievable bound:
   with ceil(total/SAMPLE) cohorts, steady-state staleness is bounded
   by that many rounds — a query older than that after this round's
   sample means rotation stopped.

Run from the repo root: ``python tools/check_rotation.py``.
Exit 1 on violation (with the keys to move), 0 otherwise.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

SAMPLE = 50


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __spark_entry__ as entry

    last: dict[str, int] = {}
    max_round = 0
    files = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not files:
        # ADVICE r12: with zero evidence files _rotation_order falls
        # back to plain alphabetical order — the driver's ~50-key
        # sample prefix would be an arbitrary cohort, silently. The
        # CORRECTNESS_r*.json files are committed; zero on disk means
        # a broken checkout, and the lint must say so loudly.
        print("FAIL: no CORRECTNESS_r*.json files found — the derived "
              "rotation order would silently degrade to alphabetical. "
              "The evidence files are committed; restore them.")
        return 1
    for f in files:
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        max_round = max(max_round, rnd)
        for k in json.load(open(f)):
            last[k] = max(last.get(k, 0), rnd)

    ks = list(entry.queries())
    due = sorted(ks, key=lambda k: (last.get(k, 0), k))[:SAMPLE]
    prefix = set(ks[:SAMPLE])
    missing = [k for k in due if k not in prefix]

    cohorts = math.ceil(len(ks) / SAMPLE)
    ages = sorted((max_round - last.get(k, 0) for k in ks), reverse=True)
    print(f"queries: {len(ks)}  sample: {SAMPLE}  last driver round: "
          f"r{max_round}  steady-state staleness bound: {cohorts} rounds")
    print(f"staleness after r{max_round}: max {ages[0]}, "
          f">bound: {sum(1 for a in ages if a > cohorts)} "
          f"(backlog from pre-rotation rounds drains {SAMPLE}/round)")

    if missing:
        print(f"\nFAIL: {len(missing)} due queries are NOT in the "
              f"first {SAMPLE} keys of queries():")
        for k in missing:
            print(f"  {k} (last sampled r{last.get(k, 0)})")
        extras = [k for k in ks[:SAMPLE] if k not in set(due)]
        print(f"prefix keys that are not due yet: {extras}")
        return 1
    print(f"OK: prefix-{SAMPLE} == the {SAMPLE} least-recently-sampled "
          f"queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
