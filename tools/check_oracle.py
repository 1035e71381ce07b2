"""Self-check harness mimicking the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 (or a given
dir) and compares against ``oracle_sql()`` via DuckDB **through pandas,
exactly like the driver** (VERDICT r4 next-round #2): Spark via
``toPandas()``, the oracle via ``duckdb .df()``, columns sorted by
name, rows sorted with pandas ``sort_values`` over all columns, then a
dtype-sensitive cell compare. Three r4 reds shipped because the old
checker compared ``fetchall()`` Python values (DuckDB HUGEINT→float64
and list columns survive fetchall but diverge/crash under pandas);
this version fails loudly on exactly those shapes:

- pandas ``sort_values`` crashing on list/dict cells = the driver's
  ``_canon`` crash (expect_fk r4) → reported as a FAIL, not masked.
- an int-kind column on one side vs float-kind on the other (DuckDB
  window ``SUM(BIGINT)`` → HUGEINT → float64; sample_pps r4) → FAIL
  even when the float values round-trip, because the driver hashes
  ``1.0`` differently from ``1``.
- Decimal-object cells (Spark DECIMAL literals / DuckDB DECIMAL
  arithmetic) → FAIL: the two engines render them differently.

Floats are compared EXACTLY (bitwise ==, NaN==NaN): the driver hashes
values with no tolerance, so every green float query is green because
both engines computed the identical double — a near-miss here is a
future driver red and must show up locally.

``--lint`` describes every oracle's output types via DuckDB without
running Spark and flags HUGEINT / DECIMAL / LIST / STRUCT / MAP / JSON
columns — the cheap full-surface guard for new entries.

Queries run CONCURRENTLY (``ORACLE_WORKERS`` env, default 6): Spark
accepts job submission from multiple threads on one session, and each
worker compares via its own DuckDB cursor. Safe because the only
session-conf mutations on the query path are idempotent (UTC timezone,
nanosAsLong).

``--stream`` (round 13, VERDICT r12 #7) swaps the driver-mimic
compare for a STREAMED multiset-digest compare: the oracle COPYs to
parquet (bounded DuckDB memory), Spark reads it back, and both
frames reduce to (count, sum(xxhash64), sum(murmur3)) over
Spark-normalized row strings — nothing materializes on the driver,
so heavy pairs run UNKNOBBED at sf10. Weaker than the cell-by-cell
gate; the strict path at sf<=0.1 remains the correctness gate.

Usage: python tools/check_oracle.py [--lint] [--stream] [sf_dir] [query ...]
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
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from blackroad_data_pipeline_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB output types the driver's pandas canonicalization mangles or
# crashes on. DECIMAL→object(Decimal), HUGEINT→float64, LIST/STRUCT→
# unhashable python containers.
BAD_DUCK_TYPES = ("HUGEINT", "DECIMAL", "[]", "STRUCT", "MAP", "JSON", "UNION")


def _canon_frame(pdf: pd.DataFrame, side: str) -> tuple[pd.DataFrame, list[str]]:
    """Mimic the driver's _canon: lowercase + name-sort columns, then
    sort_values over all columns. Returns (frame, problems); a sort
    crash (unhashable list cells etc.) is the driver's crash."""
    problems: list[str] = []
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    # normalize datetimes to naive ns so us-vs-ns units don't diff
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype.kind == "M":
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[ns]")
    # lint object cells the driver chokes on (first non-null per col)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            nn = pdf[c].dropna()
            if len(nn):
                v = nn.iloc[0]
                if isinstance(v, (list, tuple, dict, np.ndarray)):
                    problems.append(
                        f"{side} column {c!r} holds {type(v).__name__} cells — "
                        "driver _canon crashes on these (stringify the column)")
                elif isinstance(v, decimal.Decimal):
                    problems.append(
                        f"{side} column {c!r} holds Decimal cells — "
                        "cast to DOUBLE/BIGINT/VARCHAR in the query")
    if problems:
        return pdf, problems
    try:
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    except Exception as e:  # noqa: BLE001 — the driver would crash here too
        problems.append(f"{side} sort_values crashed (driver crash): {e}")
    return pdf.reset_index(drop=True), problems


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    s_cols = sorted(c.lower() for c in spark_pdf.columns)
    d_cols = sorted(c.lower() for c in duck_pdf.columns)
    if s_cols != d_cols:
        return [f"columns differ: spark={s_cols} duck={d_cols}"]
    if len(spark_pdf) != len(duck_pdf):
        return [f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    s_pdf, p1 = _canon_frame(spark_pdf, "spark")
    d_pdf, p2 = _canon_frame(duck_pdf, "duck")
    if p1 or p2:
        return p1 + p2
    n_mismatch, max_rel, shown = 0, 0.0, 0
    for c in s_pdf.columns:
        s, d = s_pdf[c], d_pdf[c]
        sk, dk = s.dtype.kind, d.dtype.kind
        num = {"i", "u", "f", "b"}
        if sk != dk and (sk in num or dk in num):
            # int-vs-float (HUGEINT→float64 etc.): the driver hashes
            # 1 and 1.0 differently even when values round-trip —
            # EXCEPT when one side holds NULLs (pandas promotes a
            # nullable int column to float64/object on BOTH paths).
            if not (s.isna().any() or d.isna().any()):
                problems.append(
                    f"dtype mismatch on {c!r}: spark {s.dtype} vs duck {d.dtype} "
                    "— driver hash WILL differ (cast both sides to the same type)")
                continue
        if sk == "f" and dk == "f":
            eq = (s.values == d.values) | (s.isna().values & d.isna().values)
            if not eq.all():
                bad = ~eq
                sv, dv = s.values[bad], d.values[bad]
                with np.errstate(all="ignore"):
                    rel = np.nanmax(np.abs(sv - dv) /
                                    np.maximum(np.maximum(np.abs(sv), np.abs(dv)), 1e-300))
                max_rel = max(max_rel, float(rel) if math.isfinite(rel) else 1.0)
                n_mismatch += int(bad.sum())
                if shown < 3:
                    problems.append(
                        f"  float mismatch {c!r}: spark={sv[0]!r} duck={dv[0]!r}")
                    shown += 1
        else:
            sv = s.astype(object).where(s.notna(), None).values
            dv = d.astype(object).where(d.notna(), None).values
            for a, b in zip(sv, dv):
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float) and \
                        math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    n_mismatch += 1
                    if shown < 3:
                        problems.append(
                            f"  value mismatch {c!r}: spark={a!r} duck={b!r}")
                        shown += 1
    if n_mismatch:
        problems.append(
            f"{n_mismatch} cell mismatches (max float rel-diff {max_rel:.2e})")
    return problems


def _stream_norm(df):
    """Canonicalize a DataFrame for the STREAMED multiset compare:
    lowercase + name-sorted columns, integral→long, bool→long,
    float→double with NaN→NULL and -0.0→0.0, temporal→string — then
    every column to string with a NULL sentinel. Both sides are
    normalized by SPARK (the oracle result round-trips through a
    DuckDB parquet COPY), so engine rendering differences cannot
    leak in: the only degrees of freedom left are the VALUES."""
    from pyspark.sql import functions as F

    df = df.select([F.col(c).alias(c.lower()) for c in df.columns])
    df = df.select(*sorted(df.columns))
    out = []
    for f in df.schema.fields:
        c = F.col(f.name)
        t = f.dataType.simpleString()
        if t in ("tinyint", "smallint", "int", "bigint"):
            c = c.cast("long")
        elif t == "boolean":
            c = c.cast("long")
        elif t in ("float", "double"):
            d = F.col(f.name).cast("double")
            c = F.when(F.isnan(d), F.lit(None)).otherwise(d + F.lit(0.0))
        elif t in ("timestamp", "timestamp_ntz", "date"):
            # duck parquet yields timestamp_ntz where the Spark side
            # holds session-UTC timestamps: ntz-cast both first (wall
            # time, same digits), then render
            c = (c.cast("timestamp_ntz") if t == "timestamp" else c) \
                .cast("string")
        elif t.startswith("decimal"):
            c = c.cast("string")
        out.append(c.alias(f.name))
    return df.select(out)


def _stream_digest(df):
    """(row_count, sum(xxhash64), sum(murmur3)) of the normalized
    frame — an order-insensitive multiset digest computed entirely
    inside Spark (no driver materialization). DECIMAL(38,0) sums so
    overflow semantics cannot differ between runs."""
    from pyspark.sql import functions as F

    row = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00N"))
                  for c in df.columns])
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(row).cast("decimal(38,0)")).alias("h1"),
        F.sum(F.hash(row).cast("decimal(38,0)")).alias("h2")).head()
    return agg["n"], agg["h1"], agg["h2"]


def check_one_stream(name, fn, oracle, spark, sf_dir, con):
    """Scale-path variant of check_one (round 13, VERDICT r12 #7):
    the strict driver-mimic compare canonicalizes through pandas on
    the DRIVER — at sf10 a 1e8-row result blows the comparator, not
    the operator, which is why eleven heavy pairs ride subset knobs.
    Stream mode keeps both results out of driver memory: the oracle
    COPYs to parquet (DuckDB streams with bounded memory), Spark
    loads it back, and BOTH frames reduce to an order-insensitive
    multiset digest (count + two summed row hashes) inside Spark.
    Weaker than the cell-by-cell gate (hash equality, coarsened
    dtypes) — the strict path at sf<=0.1 remains the correctness
    gate; this is the no-modulus scale evidence."""
    import shutil
    import tempfile

    t0 = time.time()
    if oracle is None:
        return name, False, [f"FAIL {name}: stream compare needs an oracle"]
    tmp = tempfile.mkdtemp(prefix=f"oracle_stream_{name}_")
    try:
        path = os.path.join(tmp, "oracle.parquet")
        try:
            cur = con.cursor()
            try:
                cur.execute(
                    f"COPY ({oracle.rstrip().rstrip(';')}) TO '{path}' "
                    f"(FORMAT PARQUET, COMPRESSION ZSTD)")
            finally:
                cur.close()
        except Exception as e:  # noqa: BLE001
            return name, False, [f"FAIL {name}: duckdb error: {e}"]
        try:
            sdf = _stream_norm(fn(spark, sf_dir))
            ddf = _stream_norm(spark.read.parquet(path))
            s_types = [(f.name, f.dataType.simpleString())
                       for f in sdf.schema.fields]
            d_types = [(f.name, f.dataType.simpleString())
                       for f in ddf.schema.fields]
            if [n for n, _ in s_types] != [n for n, _ in d_types]:
                return name, False, [
                    f"FAIL {name}: columns differ: spark={s_types} "
                    f"duck={d_types}"]
            sn, sh1, sh2 = _stream_digest(sdf)
            dn, dh1, dh2 = _stream_digest(ddf)
        except Exception as e:  # noqa: BLE001
            return name, False, [f"FAIL {name}: spark error: {e}"]
        if sn != dn:
            return name, False, [
                f"FAIL {name}: row count: spark={sn} duck={dn} "
                f"[{time.time()-t0:.1f}s]"]
        if (sh1, sh2) != (dh1, dh2):
            return name, False, [
                f"FAIL {name}: multiset digest mismatch over {sn} rows "
                f"(h1 {sh1} vs {dh1}, h2 {sh2} vs {dh2}) "
                f"[{time.time()-t0:.1f}s]"]
        return name, True, [
            f"OK   {name} (stream, {sn} rows) [{time.time()-t0:.1f}s]"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def check_one(name, fn, oracle, spark, sf_dir, con):
    """Run one query + its oracle; return (name, ok, lines)."""
    t0 = time.time()
    try:
        sdf = fn(spark, sf_dir)
        spark_pdf = sdf.toPandas()
    except Exception as e:  # noqa: BLE001
        return name, False, [f"FAIL {name}: spark error: {e}"]
    if oracle is None:
        return name, True, [
            f"SKIP {name}: no oracle (rows-only) — {len(spark_pdf)} rows "
            f"[{time.time()-t0:.1f}s]"
        ]
    try:
        # each worker gets its own cursor: duckdb connections are not
        # safe for concurrent use, cursors over one connection are
        cur = con.cursor()
        try:
            duck_pdf = cur.sql(oracle).df()
        finally:
            cur.close()
    except Exception as e:  # noqa: BLE001
        return name, False, [f"FAIL {name}: duckdb error: {e}"]
    problems = compare(name, spark_pdf, duck_pdf)
    if problems:
        lines = [f"FAIL {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]"]
        lines += [f"  {p}" for p in problems]
        return name, False, lines
    return name, True, [f"OK   {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]"]


def lint(sf_dir: str, only: set[str]) -> int:
    """DESCRIBE every oracle via DuckDB and flag output types the
    driver's pandas canonicalization mangles. No Spark needed."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = entry_mod.oracle_sql()
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            desc = con.sql(f"DESCRIBE ({sql.rstrip().rstrip(';')})").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"LINT-ERR {name}: describe failed: {e}")
            n_bad += 1
            continue
        for col, typ, *_ in desc:
            u = typ.upper()
            if any(tok in u for tok in BAD_DUCK_TYPES):
                print(f"LINT {name}: column {col!r} is {typ} — driver-unsafe "
                      "(cast to BIGINT/DOUBLE/VARCHAR in the oracle)")
                n_bad += 1
    print(f"\nlint: {'clean' if n_bad == 0 else f'{n_bad} driver-unsafe columns'} "
          f"({len(only) if only else len(oracles)} oracles)")
    return 1 if n_bad else 0


def main():
    argv = sys.argv[1:]
    do_lint = "--lint" in argv
    do_stream = "--stream" in argv
    argv = [a for a in argv if a not in ("--lint", "--stream")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if do_lint:
        sys.exit(lint(sf_dir, only))
    workers = int(os.environ.get("ORACLE_WORKERS", "6"))
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    # ORACLE_DUCK_MEM caps DuckDB's memory (shared by all cursors of
    # this connection). Unset = DuckDB's default (~80% of RAM), which
    # at sf10 OOM-killed the whole sweep: 5 concurrent 60M-row oracle
    # scans + the 32g Spark heap + toPandas buffers exceed the box.
    duck_mem = os.environ.get("ORACLE_DUCK_MEM")
    if duck_mem:
        con.execute(f"SET memory_limit='{duck_mem}'")
        con.execute(f"SET temp_directory='/tmp/duckspill'")
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
        impl = check_one_stream if do_stream else check_one
        return impl(name, fn, oracles.get(name), tls.spark, sf_dir, con)

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
