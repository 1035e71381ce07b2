"""Adaptive kernel fan-out (operators/parallel.py, round 13).

The helper must (1) widen an input that has fewer partitions than the
session's default parallelism, (2) be a NO-OP on an input that is
already at least that wide — the at-scale case, so production plans
never gain an exchange — (3) honor the SPARK_GRAFT_KERNEL_FANOUT
knob (0 = off, N = fixed width), and (4) never change operator
output (the winnow Arrow kernel is the heaviest consumer — its
fingerprint set must be partitioning-invariant).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blackroad_data_pipeline_spark.operators import apply_operator as op
from blackroad_data_pipeline_spark.operators.parallel import fan_out

SF = "/root/testdata/sf0.001"


def test_fan_out_widens_starved_input(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_KERNEL_FANOUT", raising=False)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert docs.rdd.getNumPartitions() == 1  # single-row-group fixture
    # default width: session parallelism, capped at the measured knee
    target = min(spark.sparkContext.defaultParallelism, 8)
    assert fan_out(docs).rdd.getNumPartitions() == target


def test_fan_out_noop_on_wide_input(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_KERNEL_FANOUT", raising=False)
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000, numPartitions=target + 3)
    out = fan_out(wide)
    assert out is wide  # not just same width — the same plan object


def test_fan_out_knob_disables_and_pins(spark, monkeypatch):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_FANOUT", "0")
    assert fan_out(docs) is docs
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_FANOUT", "5")
    assert fan_out(docs).rdd.getNumPartitions() == 5


def test_winnow_output_partitioning_invariant(spark, monkeypatch):
    """The heaviest fan_out consumer must produce the identical
    fingerprint SET fanned out or not (winnowing is doc-local)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cfg = {"field": "text", "id_field": "doc_id", "k": 5, "window": 4}
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_FANOUT", "0")
    plain = op("winnow", docs, cfg).collect()
    monkeypatch.setenv("SPARK_GRAFT_KERNEL_FANOUT", "7")
    fanned = op("winnow", docs, cfg).collect()
    key = lambda r: (r["doc_id"], r["pos"], r["fp"])  # noqa: E731
    assert sorted(map(key, plain)) == sorted(map(key, fanned))
    assert len(plain) > 0


def test_fan_out_streaming_passthrough(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_KERNEL_FANOUT", raising=False)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.write.mode("overwrite").parquet(str(tmp_path / "src"))
    stream = (spark.readStream.schema(docs.schema)
              .option("recursiveFileLookup", "true")
              .parquet(str(tmp_path / "src")))
    assert fan_out(stream) is stream


def test_fan_out_rows_survive(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_KERNEL_FANOUT", raising=False)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    out = fan_out(docs.select("doc_id"))
    assert out.count() == n
    assert out.agg(F.countDistinct("doc_id")).first()[0] == n
