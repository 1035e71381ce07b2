"""Self-check harness mimicking the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 (or a given
dir) and compares against ``oracle_sql()`` via DuckDB: row count,
column names, and an order-insensitive value comparison (sorted rows,
exact match for non-floats, tight tolerance report for floats so we
can see *how* far off a float column is before the driver hashes it).

Queries run CONCURRENTLY (``ORACLE_WORKERS`` env, default 6): Spark
accepts job submission from multiple threads on one session, and each
worker compares via its own DuckDB cursor, so the full 120-query sweep
overlaps Spark execution with oracle execution instead of serializing
them (VERDICT r3 next-round #8). Safe because the only session-conf
mutations on the query path are idempotent (UTC timezone, nanosAsLong).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import concurrent.futures
import decimal
import math
import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from blackroad_data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(v):
    if isinstance(v, float):
        return v
    if isinstance(v, decimal.Decimal):
        # a Decimal here usually means an accidental decimal-typed
        # column (e.g. Spark parsing 10000.0 as DECIMAL) — compare as
        # float so the report shows a value/type diff instead of a
        # TypeError traceback
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    return v


def sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), repr(v) if not isinstance(v, float) else f"{v:.9e}")
        for v in row
    )


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if sorted(spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    # align column order by sorted name (driver sorts columns by name)
    order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    order_d = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    s_rows = sorted(
        (tuple(normalize(r[i]) for i in order_s) for r in spark_rows), key=sort_key
    )
    d_rows = sorted(
        (tuple(normalize(r[i]) for i in order_d) for r in duck_rows), key=sort_key
    )
    n_mismatch, max_rel = 0, 0.0
    for sr, dr in zip(s_rows, d_rows):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) or isinstance(dv, float):
                if sv is None or dv is None:
                    if sv is not dv:
                        n_mismatch += 1
                elif math.isnan(sv) and math.isnan(dv):
                    continue
                elif sv != dv:
                    rel = abs(sv - dv) / max(abs(sv), abs(dv), 1e-300)
                    max_rel = max(max_rel, rel)
                    n_mismatch += 1
            elif sv != dv:
                n_mismatch += 1
                if n_mismatch <= 3:
                    problems.append(f"  value mismatch: spark={sv!r} duck={dv!r}")
    if n_mismatch:
        problems.append(f"{n_mismatch} cell mismatches (max float rel-diff {max_rel:.2e})")
    return problems


def check_one(name, fn, oracle, spark, sf_dir, con):
    """Run one query + its oracle; return (name, ok, lines)."""
    t0 = time.time()
    try:
        sdf = fn(spark, sf_dir)
        spark_cols = [c.lower() for c in sdf.columns]
        spark_rows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001
        return name, False, [f"FAIL {name}: spark error: {e}"]
    if oracle is None:
        return name, True, [
            f"SKIP {name}: no oracle (rows-only) — {len(spark_rows)} rows "
            f"[{time.time()-t0:.1f}s]"
        ]
    try:
        # each worker gets its own cursor: duckdb connections are not
        # safe for concurrent use, cursors over one connection are
        cur = con.cursor()
        try:
            rel = cur.sql(oracle)
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        finally:
            cur.close()
    except Exception as e:  # noqa: BLE001
        return name, False, [f"FAIL {name}: duckdb error: {e}"]
    problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
    if problems:
        lines = [f"FAIL {name} ({len(spark_rows)} rows) [{time.time()-t0:.1f}s]"]
        lines += [f"  {p}" for p in problems]
        return name, False, lines
    return name, True, [f"OK   {name} ({len(spark_rows)} rows) [{time.time()-t0:.1f}s]"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    workers = int(os.environ.get("ORACLE_WORKERS", "6"))
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    todo = [(n, fn) for n, fn in queries.items() if not only or n in only]
    missing = only - {n for n, _ in todo}
    if missing:
        print(f"unknown queries: {sorted(missing)}")
        sys.exit(2)

    n_fail = 0
    lock = threading.Lock()
    tls = threading.local()

    def run(item):
        name, fn = item
        # per-thread Spark session (shared SparkContext, isolated
        # temp-view/session state — op("sql") registers fixed-name
        # session views, which would race on one shared session)
        if not hasattr(tls, "spark"):
            tls.spark = spark.newSession()
        return check_one(name, fn, oracles.get(name), tls.spark, sf_dir, con)

    t_start = time.time()
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        for name, ok, lines in pool.map(run, todo):
            with lock:
                if not ok:
                    n_fail += 1
                for line in lines:
                    print(line, flush=True)
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'} "
          f"({len(todo)} queries, {time.time()-t_start:.0f}s, {workers} workers)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
