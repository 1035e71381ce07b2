from __future__ import annotations

import glob
import os

import pytest

from blackroad_data_pipeline_spark.session import get_spark


def _jdbc_driver_jar() -> str | None:
    """A DuckDB JDBC driver jar if one is cached locally — lets the
    jdbc source run against a REAL driver (in-memory DuckDB) instead
    of staying code-path-only. Purely opportunistic: absent jar just
    skips the test."""
    hits = glob.glob(os.path.expanduser(
        "~/.cache/coursier/**/duckdb_jdbc*.jar"), recursive=True)
    return hits[0] if hits else None


JDBC_JAR = _jdbc_driver_jar()


@pytest.fixture(scope="session")
def spark():
    # spark.default.parallelism=4: createDataFrame/parallelize frames
    # otherwise carry local[ncores] partitions (32 here), so every
    # tiny-fixture stage schedules 32 map tasks and a crossJoin
    # fallback becomes a 1024-task CartesianProduct — pure scheduling
    # overhead on <20-row test data. Measured (round 14): the
    # fuzzy_join brute-force property test's inner loop dropped 11x
    # (53 s -> 4.8 s for 3 examples); the full suite ~2.5x. Scale
    # semantics are untouched — operators derive widths from the live
    # session, and the sf0.1 bench/driver sessions keep their real
    # parallelism.
    extra = {"spark.sql.shuffle.partitions": "4",
             "spark.default.parallelism": "4"}
    if JDBC_JAR:
        extra["spark.jars"] = JDBC_JAR
    s = get_spark("tests", extra_conf=extra)
    yield s


@pytest.fixture()
def employees(spark):
    """The reference's canonical unit-test fixture — 3 rows, all
    strings (mirrors its CSV typing; reference test_data_pipeline.py:15-19)."""
    return spark.createDataFrame(
        [("Alice", "30", "eng"), ("Bob", "25", "eng"), ("Carol", "35", "pm")],
        ["name", "age", "dept"],
    )
