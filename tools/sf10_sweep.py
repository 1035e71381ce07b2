#!/usr/bin/env python3
"""sf10 campaign driver (VERDICT r9 #6): full-surface beyond-sf1
evidence with no permanent exemptions.

Round 9's sf10 campaign swept 140/190 pairs and excluded the rest as
by-design-quadratic parity geometries / >5M-row outputs / fuzzy_join.
Round 10 replaces the exclusion list with the PARITY-SCALE knob
(`__spark_entry__._PSCALE`): `SPARK_GRAFT_PARITY_SCALE=N` multiplies
every parity-subset modulus in BOTH the Spark closure and the oracle
SQL (one source of truth — the two sides cannot disagree about the
subset), so the same contract pair definitions stay feasible at
200k vectors / 500k docs: the quadratic ORACLES shrink while every
operator still runs the identical code path on sf10-distributed data.
Unset, the knob is 1 and the contract strings are byte-identical to
the driver-sampled geometry (verified at build time).

Usage:
  python tools/sf10_sweep.py [--sf 10] [--dir /tmp/sf10]
                             [--scale 100] [query ...]

Runs gen_fixture if the directory is missing, then check_oracle as a
subprocess with the knob set, over every `queries()` entry except the
documented skips below. Exit 0 iff ALL OK and coverage >= 170/|surface|.
"""
from __future__ import annotations

import argparse
import math
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

# Inner parity splits that gates layer ON TOP of the knob subsets
# (ADVICE r10): dedup_near_against splits the _HMOD subset by
# doc_id % 2, contamination by doc_id % 20, vector_ingest_stream by
# vec_id % 8. A --scale sharing a factor with any of these makes the
# knobbed subset of one side EMPTY (e.g. scale 100: doc_id % 100 = 0
# implies doc_id % 2 = 0, so the %2=1 batch is empty) — both engines
# agree on empty, so the pair reports a VACUOUS green. The default
# scale must be coprime with every inner modulus; main() enforces it
# for any explicit --scale too.
INNER_MODULI = {
    "dedup_near_against": 2,   # history/batch split on doc_id % 2
    "contamination": 20,       # benchmark split on doc_id % 20
    "vector_ingest_stream": 8, # day-1/day-2 split on vec_id % 8
}

DEFAULT_SCALE = 101  # prime, odd, not divisible by 5 — coprime with all

# Documented, justified residual skips — each must name a reason the
# PAIR (not just the oracle) cannot run, and where its evidence lives
# instead.
# Round 11: EMPTY — the last skip (fuzzy_join) ended when PassJoin
# segment filtering replaced q-gram count filtering: candidates come
# from exact-substring collisions, which stay bounded even on the
# low-gram-diversity word-salad vocabulary, and the pair's all-pairs
# ORACLE rides the knob-derived subset modulus like every other
# quadratic-oracle pair.
SKIPS: dict[str, str] = {}

# COMPARE-PATH-heavy pairs (round 13, VERDICT r12 #7): their subset
# knobs exist because the driver-mimic PANDAS comparator (or the
# memory materialization feeding it) blows up at sf10, not the
# operators. After the knobbed sweep, these re-run UNKNOBBED
# (SPARK_GRAFT_PARITY_SCALE=1) through check_oracle --stream — the
# oracle COPYs to parquet and both sides reduce to multiset digests
# inside Spark, so nothing touches driver pandas. NOT in this list:
# pagerank/triangles (their blowup is the ORACLE COMPUTE — DuckDB's
# unrolled-CTE graph replay spills >78 GB solo; stream mode cannot
# help a query DuckDB itself cannot run at 60M rows).
HEAVY_STREAM = [
    "asof_forward", "asof_join", "asof_nearest",
    "attribution_first", "attribution_last", "attribution_linear",
    "attribution_linear_exact", "pit_enrich", "range_join",
    "stream_join", "unpivot", "expect_fk", "zorder",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=10.0)
    ap.add_argument("--dir", default="/tmp/sf10")
    ap.add_argument("--scale", type=int, default=DEFAULT_SCALE,
                    help="SPARK_GRAFT_PARITY_SCALE for the sweep "
                         "(parity modulus multiplier; must be coprime "
                         "with every INNER_MODULI split — 101 is prime "
                         "and odd, so the knobbed subsets stay "
                         "non-empty)")
    ap.add_argument("--no-heavy-stream", action="store_true",
                    help="skip the unknobbed --stream re-run of the "
                         "compare-path-heavy pairs")
    ap.add_argument("queries", nargs="*",
                    help="subset of query names (default: all minus skips)")
    args = ap.parse_args()

    bad = {q: m for q, m in INNER_MODULI.items()
           if args.scale > 1 and math.gcd(args.scale, m) != 1}
    if bad:
        print(f"--scale {args.scale} shares a factor with the inner "
              f"parity split of {sorted(bad)} (moduli {bad}) — those "
              f"pairs would pass VACUOUSLY on empty subsets. Pick a "
              f"scale coprime with {sorted(set(INNER_MODULI.values()))} "
              f"(e.g. the default 101).", flush=True)
        return 2

    if not os.path.exists(os.path.join(args.dir, "lineitem.parquet")):
        print(f"generating sf{args.sf} fixture at {args.dir} ...",
              flush=True)
        subprocess.run(
            [sys.executable, "tools/gen_fixture.py", "--sf", str(args.sf),
             "--out", args.dir], check=True, cwd="/root/repo")

    import __spark_entry__ as entry_mod
    surface = list(entry_mod.queries())
    todo = args.queries or [q for q in surface if q not in SKIPS]
    skipped = [q for q in surface if q in SKIPS and not args.queries]
    print(f"sweep: {len(todo)}/{len(surface)} pairs at sf{args.sf}, "
          f"parity scale {args.scale}; skips: {skipped}", flush=True)
    for q in skipped:
        print(f"  SKIP {q}: {SKIPS[q]}", flush=True)

    env = dict(os.environ, SPARK_GRAFT_PARITY_SCALE=str(args.scale))
    r = subprocess.run(
        [sys.executable, "tools/check_oracle.py", args.dir, *todo],
        env=env, cwd="/root/repo")
    if r.returncode != 0:
        return r.returncode
    if len(todo) < min(170, len(surface) - len(SKIPS)):
        print(f"coverage {len(todo)} below the 170 floor", flush=True)
        return 3

    if not args.queries and not args.no_heavy_stream:
        heavy = [q for q in HEAVY_STREAM if q in surface]
        print(f"\nheavy-stream phase: {len(heavy)} compare-path pairs "
              f"UNKNOBBED (parity scale 1, --stream)", flush=True)
        env2 = dict(os.environ, SPARK_GRAFT_PARITY_SCALE="1")
        r = subprocess.run(
            [sys.executable, "tools/check_oracle.py", "--stream",
             args.dir, *heavy],
            env=env2, cwd="/root/repo")
        if r.returncode != 0:
            return r.returncode
    return 0


if __name__ == "__main__":
    sys.exit(main())
