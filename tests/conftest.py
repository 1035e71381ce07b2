from __future__ import annotations

import pytest

from blackroad_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture()
def employees(spark):
    """The reference's canonical unit-test fixture — 3 rows, all
    strings (mirrors its CSV typing; reference test_data_pipeline.py:15-19)."""
    return spark.createDataFrame(
        [("Alice", "30", "eng"), ("Bob", "25", "eng"), ("Carol", "35", "pm")],
        ["name", "age", "dept"],
    )
