"""Tooling gates: the fixture generator must stay schema-exact vs the
driver fixtures (the sf1 oracle sweep's validity depends on it)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    from tools.gen_fixture import gen

    out = tmp_path_factory.mktemp("sfgen")
    stats = gen(0.001, str(out), seed=7)
    return str(out), stats


def test_gen_fixture_schema_exact(generated):
    """Every generated table carries the exact arrow schema of the
    driver fixture — names, order, and types (int32 vs int64, us
    timestamps, list<float>). A silent dtype drift here would turn
    the whole scale-sweep lever into noise."""
    out, _ = generated
    for t in TABLES:
        got = pq.ParquetFile(f"{out}/{t}.parquet").schema_arrow
        want = pq.ParquetFile(
            f"/root/testdata/sf0.001/{t}.parquet").schema_arrow
        assert len(got) == len(want), t
        for i in range(len(want)):
            assert got.field(i).name == want.field(i).name, t
            assert got.field(i).type == want.field(i).type, (
                t, got.field(i).name)


def test_gen_fixture_row_counts_and_integrity(generated):
    """Row counts scale linearly from the sf0.1 base; FKs stay inside
    their dimensions; the events stream stays ts-sorted (the driver
    fixtures are); documents carry proportional exact-dup mass."""
    import duckdb

    out, stats = generated
    assert stats["lineitem"] == 6000 and stats["customer"] == 150
    con = duckdb.connect()
    ok = con.sql(f"""
        SELECT
          (SELECT COUNT(*) FROM read_parquet('{out}/lineitem.parquet') l
           WHERE l.l_orderkey NOT BETWEEN 0 AND
             (SELECT MAX(o_orderkey) FROM
              read_parquet('{out}/orders.parquet'))) AS bad_fk,
          (SELECT COUNT(*) FROM (
             SELECT ts < LAG(ts) OVER (ORDER BY event_id) AS dec
             FROM read_parquet('{out}/events.parquet')) WHERE dec)
             AS unsorted
    """).fetchone()
    assert ok == (0, 0)


def test_rotation_lint_passes_on_current_order():
    """The driver samples the first ~50 queries() keys; the rotation
    lint (tools/check_rotation.py) must hold on HEAD so the
    least-recently-sampled cohort is always the next sample."""
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "tools/check_rotation.py"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr
