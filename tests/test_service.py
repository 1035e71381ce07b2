"""End-to-end service tests — mirrors the reference's
TestPipelineService (test_data_pipeline.py:53-96): isolated catalog via
PIPELINE_DB, inline→stdout run, filter run, CSV→JSON round-trip — and
goes further by asserting output VALUES, which the reference never did.
"""

from __future__ import annotations

import csv
import json
import sqlite3

import pytest

from blackroad_data_pipeline_spark.service import PipelineService


@pytest.fixture()
def svc(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("PIPELINE_DB", str(tmp_path / "pipelines.db"))
    return PipelineService(spark)


def test_create_and_list(svc):
    p = svc.create_pipeline("test", "a test pipeline")
    assert p.id
    names = [row["name"] for row in svc.list_pipelines()]
    assert "test" in names


def test_inline_to_stdout_run(svc, capsys):
    # reference test_data_pipeline.py:64-70
    p = svc.create_pipeline("inline")
    svc.add_source(p.id, "nums", "inline", {"data": [{"x": 1}, {"x": 2}]})
    svc.add_sink(p.id, "stdout")
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    assert result["rows_read"] == 2
    assert result["rows_written"] == 2
    out = json.loads(capsys.readouterr().out)
    assert sorted(r["x"] for r in out) == [1, 2]


def test_filter_run(svc, tmp_path):
    # reference test_data_pipeline.py:72-79
    p = svc.create_pipeline("filtered")
    data = [{"v": str(i), "keep": str(i % 2 == 0)} for i in range(10)]
    svc.add_source(p.id, "rows", "inline", {"data": data})
    svc.add_transform(p.id, "filter", {"field": "keep", "op": "eq", "value": "True"},
                      order_index=0)
    out = tmp_path / "out.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    assert result["rows_read"] == 10
    assert result["rows_written"] == 5
    written = json.loads(out.read_text())
    assert sorted(r["v"] for r in written) == ["0", "2", "4", "6", "8"]


def test_csv_source_json_sink(svc, tmp_path):
    # reference test_data_pipeline.py:81-90 — plus value assertions
    src = tmp_path / "in.csv"
    src.write_text("name,score\nalice,10\nbob,20\n")
    p = svc.create_pipeline("csvjson")
    svc.add_source(p.id, "scores", "csv", {"path": str(src)})
    out = tmp_path / "out.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    assert svc.run_pipeline(p.id)["status"] == "success"
    rows = json.loads(out.read_text())
    # csv source: all values strings (reference typing, main.py:118-123)
    assert sorted(rows, key=lambda r: r["name"]) == [
        {"name": "alice", "score": "10"}, {"name": "bob", "score": "20"}]


def test_multi_source_union_and_views(svc, capsys):
    # root sources union; non-root sources are join views only
    p = svc.create_pipeline("join")
    svc.add_source(p.id, "facts", "inline",
                   {"data": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]})
    svc.add_source(p.id, "dims", "inline",
                   {"data": [{"id": 1, "label": "one"}]}, root=False)
    svc.add_transform(p.id, "join", {"right": "dims", "left_key": "id",
                                     "right_key": "id"}, order_index=0)
    svc.add_sink(p.id, "stdout")
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    assert result["rows_read"] == 2  # dims not unioned into the stream
    out = json.loads(capsys.readouterr().out)
    assert out == [{"id": 1, "v": "a", "r_id": 1, "r_label": "one"}]


def test_transform_order_respected(svc, tmp_path):
    p = svc.create_pipeline("ordered")
    svc.add_source(p.id, "rows", "inline",
                   {"data": [{"v": i} for i in range(10)]})
    # order 0: filter v >= 5; order 1: limit 2 — reversed would give v in {0,1}
    svc.add_transform(p.id, "sort", {"field": "v", "descending": True}, order_index=1)
    svc.add_transform(p.id, "filter", {"field": "v", "op": "ge", "value": 5},
                      order_index=0)
    out = tmp_path / "o.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    svc.run_pipeline(p.id)
    rows = json.loads(out.read_text())
    assert [r["v"] for r in rows] == [9, 8, 7, 6, 5]


def test_failed_run_recorded(svc):
    p = svc.create_pipeline("bad")
    svc.add_source(p.id, "rows", "inline", {"data": [{"x": 1}]})
    svc.add_transform(p.id, "filter", {"field": "nope", "op": "eq", "value": 1},
                      order_index=0)
    svc.add_sink(p.id, "stdout")
    result = svc.run_pipeline(p.id)
    assert result["status"] == "failed"
    assert result["error"]
    runs = svc.list_runs(p.id)
    assert runs[0]["status"] == "failed"


def test_sqlite_roundtrip(svc, tmp_path):
    # sqlite source (reference main.py:130-138) and sink (main.py:326-341)
    db_in = tmp_path / "in.db"
    with sqlite3.connect(db_in) as con:
        con.execute("CREATE TABLE t (id INTEGER, name TEXT)")
        con.executemany("INSERT INTO t VALUES (?,?)", [(1, "a"), (2, "b")])
        con.commit()
    p = svc.create_pipeline("sqlite")
    svc.add_source(p.id, "t", "sqlite", {"database": str(db_in), "table": "t"})
    db_out = tmp_path / "out.db"
    svc.add_sink(p.id, "sqlite", {"database": str(db_out), "table": "result"})
    assert svc.run_pipeline(p.id)["status"] == "success"
    with sqlite3.connect(db_out) as con:
        rows = con.execute("SELECT * FROM result ORDER BY id").fetchall()
    # sink stores all columns as TEXT (reference main.py:333-334)
    assert rows == [("1", "a"), ("2", "b")]


def test_csv_sink_single_file(svc, tmp_path, spark):
    p = svc.create_pipeline("csvout")
    svc.add_source(p.id, "rows", "inline",
                   {"data": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]})
    out = tmp_path / "out_csv"
    svc.add_sink(p.id, "csv", {"path": str(out), "single_file": True})
    assert svc.run_pipeline(p.id)["status"] == "success"
    parts = list(out.glob("part-*.csv"))
    assert len(parts) == 1
    with open(parts[0]) as f:
        got = sorted(csv.DictReader(f), key=lambda r: r["a"])
    assert got == [{"a": "1", "b": "x"}, {"a": "2", "b": "y"}]


def test_parquet_sink_partitioned(svc, tmp_path):
    p = svc.create_pipeline("pq")
    svc.add_source(p.id, "rows", "inline",
                   {"data": [{"k": "a", "v": 1}, {"k": "b", "v": 2}]})
    out = tmp_path / "out_pq"
    svc.add_sink(p.id, "parquet", {"path": str(out), "partition_by": ["k"]})
    assert svc.run_pipeline(p.id)["status"] == "success"
    assert (out / "k=a").exists() and (out / "k=b").exists()


def test_validate_schema(svc):
    p = svc.create_pipeline("val")
    s = svc.add_source(p.id, "rows", "inline",
                       {"data": [{"a": 1, "b": "x"}]})
    result = svc.validate_schema(s.id)
    assert result["valid"] and result["rows"] == 1
    assert result["schema"]["a"] == ["bigint"]
    assert result["schema"]["b"] == ["string"]


def test_cli_end_to_end(spark, tmp_path, monkeypatch, capsys):
    """CLI parity loop: create -> run -> runs -> validate -> explain
    (reference main.py:517-556, plus explain which it couldn't have)."""
    from blackroad_data_pipeline_spark import cli

    monkeypatch.setenv("PIPELINE_DB", str(tmp_path / "pipelines.db"))
    assert cli.main(["create", "cli-pipe", "--description", "d"]) == 0
    pid = json.loads(capsys.readouterr().out)["id"]

    svc = PipelineService(spark)
    sid = svc.add_source(pid, "rows", "inline",
                         {"data": [{"x": 1}, {"x": 2}, {"x": 5}]}).id
    svc.add_transform(pid, "filter", {"field": "x", "op": "gt", "value": 1}, 0)
    svc.add_sink(pid, "json", {"path": str(tmp_path / "out.json")})

    assert cli.main(["run", pid]) == 0
    run_out = json.loads(capsys.readouterr().out)
    assert run_out["status"] == "success"
    assert run_out["rows_read"] == 3 and run_out["rows_written"] == 2
    assert [r["x"] for r in json.load(open(tmp_path / "out.json"))] == [2, 5]

    assert cli.main(["runs", "--pipeline-id", pid]) == 0
    assert len(json.loads(capsys.readouterr().out)) == 1

    assert cli.main(["validate", sid]) == 0
    val = json.loads(capsys.readouterr().out)
    assert val["valid"] and val["rows"] == 3

    assert cli.main(["explain", pid]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_api_source_file_url(spark, tmp_path):
    """api source (declared-only in the reference, main.py:115-116):
    JSON array over a URL; file:// keeps the test offline."""
    from blackroad_data_pipeline_spark.sources.readers import read_source

    p = tmp_path / "resp.json"
    p.write_text(json.dumps([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]))
    df = read_source(spark, "api", {"url": p.as_uri()})
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [(1, "a"), (2, "b")]

    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(json.dumps({"data": [{"id": 3}], "next": None}))
    df2 = read_source(spark, "api", {"url": wrapped.as_uri(), "data_key": "data"})
    assert [r["id"] for r in df2.collect()] == [3]


def test_jsonl_sink_mode_ignore_does_not_hang(spark, tmp_path):
    """mode='ignore' on an existing path skips the write job; the
    row-count path must not block on an Observation that never fires,
    and must report 0 (nothing was actually written), not the
    candidate row count."""
    from blackroad_data_pipeline_spark.sinks import write_sink

    df = spark.createDataFrame([(1,), (2,)], ["x"])
    p = str(tmp_path / "out")
    assert write_sink(df, "jsonl", {"path": p}) == 2
    # second write: path exists, job skipped — must return 0, not hang
    assert write_sink(df, "jsonl", {"path": p, "mode": "ignore"}) == 0
    # fresh path: ignore behaves like a normal write
    p2 = str(tmp_path / "out2")
    assert write_sink(df, "jsonl", {"path": p2, "mode": "ignore"}) == 2


def test_csv_sink_empty_input_no_file(spark, tmp_path):
    """Reference parity (main.py:319-320): empty data -> no file. The
    check runs AFTER the single write (observed count), never as a
    separate pre-count of the plan."""
    from blackroad_data_pipeline_spark.sinks import write_sink

    df = spark.createDataFrame([(1,)], ["x"]).filter("x > 99")
    p = tmp_path / "empty_csv"
    assert write_sink(df, "csv", {"path": str(p)}) == 0
    assert not p.exists()
    # write_empty opt-out keeps the (header-only) directory
    p2 = tmp_path / "empty_csv2"
    assert write_sink(df, "csv", {"path": str(p2), "write_empty": True}) == 0
    assert p2.exists()


def test_csv_sink_single_job(spark, tmp_path):
    """The csv sink computes the plan ONCE: the row count comes from an
    Observation riding the write, not a separate df.count()."""
    from blackroad_data_pipeline_spark.sinks import write_sink

    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        for row in it:
            acc.add(1)
            yield row

    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    counted = spark.createDataFrame(df.rdd.mapPartitions(bump), df.schema)
    assert write_sink(counted, "csv", {"path": str(tmp_path / "once")}) == 10
    # one full pass (10) + the LIMIT-1 emptiness probe's short-circuit
    # (a row or two); a second full pass would read 20
    assert acc.value < 15


def test_orc_source_roundtrip(spark, tmp_path):
    from blackroad_data_pipeline_spark.sources.readers import read_source

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    p = str(tmp_path / "t.orc")
    df.write.mode("overwrite").orc(p)
    back = read_source(spark, "orc", {"path": p})
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_orc_sink_roundtrip(spark, tmp_path):
    from blackroad_data_pipeline_spark.sinks import write_sink
    from blackroad_data_pipeline_spark.sources.readers import read_source

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    p = str(tmp_path / "o.orc")
    assert write_sink(df, "orc", {"path": p}) == 2
    back = read_source(spark, "orc", {"path": p})
    assert back.count() == 2


def test_parquet_sink_max_records_per_file(spark, tmp_path):
    """File-size control for the small-file/huge-file problem: with
    max_records_per_file, one task's output splits into bounded
    files."""
    from blackroad_data_pipeline_spark.sinks import write_sink

    df = spark.createDataFrame([(i,) for i in range(100)], ["x"]).coalesce(1)
    p = tmp_path / "bounded"
    assert write_sink(df, "parquet",
                      {"path": str(p), "max_records_per_file": 30}) == 100
    parts = list(p.glob("part-*.parquet"))
    assert len(parts) >= 4  # 100 rows / 30-per-file cap
    back = spark.read.parquet(str(p))
    assert back.count() == 100


def test_text_source_lines_and_whole_file(spark, tmp_path):
    from blackroad_data_pipeline_spark.sources.readers import read_source

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("doc b\n")
    lines = read_source(spark, "text", {"path": str(d)})
    assert sorted(r["value"] for r in lines.collect()) == [
        "doc b", "line one", "line two"]
    whole = read_source(spark, "text", {"path": str(d), "whole_file": True})
    got = {r["path"].rsplit("/", 1)[-1]: r["value"] for r in whole.collect()}
    assert got == {"a.txt": "line one\nline two\n", "b.txt": "doc b\n"}


def test_binary_files_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingestion plugs straight into the multimodal ops:
    content is the payload column."""
    import blackroad_data_pipeline_spark.llmops  # noqa: F401
    from blackroad_data_pipeline_spark.operators import apply_operator as op
    from blackroad_data_pipeline_spark.sources.readers import read_source

    d = tmp_path / "media"
    d.mkdir()
    (d / "x.bin").write_bytes(b"payload-bytes-0123456789" * 4)
    (d / "skip.txt").write_bytes(b"nope")
    df = read_source(spark, "binary_files", {"path": str(d), "glob": "*.bin"})
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["length"] == 96
    frames = op("frame_sample", df.withColumnRenamed("content", "payload")
                .selectExpr("monotonically_increasing_id() AS doc_id", "payload"),
                {"n_frames": 2}).collect()
    assert len(frames) == 2


def test_upsert_parquet_rewrites_only_touched_partitions(spark, tmp_path):
    """The 100 TB refresh primitive: an upsert touching partition k=a
    must update/insert its rows AND leave partition k=b's files
    physically untouched (dynamic partition overwrite, partition-
    pruned read of the old slice)."""
    from blackroad_data_pipeline_spark.sinks import write_sink

    p = tmp_path / "ds"
    base = spark.createDataFrame(
        [(1, "a", "v1"), (2, "a", "v2"), (3, "b", "v3")], ["id", "k", "v"])
    assert write_sink(base, "upsert_parquet",
                      {"path": str(p), "key": "id", "partition_by": "k"}) == 3

    b_files_before = sorted(f.name for f in (p / "k=b").glob("*.parquet"))
    b_mtimes_before = [f.stat().st_mtime_ns for f in sorted((p / "k=b").glob("*.parquet"))]

    updates = spark.createDataFrame(
        [(2, "a", "v2-new"), (9, "a", "v9")], ["id", "k", "v"])
    assert write_sink(updates, "upsert_parquet",
                      {"path": str(p), "key": "id", "partition_by": "k"}) == 3

    got = {r["id"]: (r["k"], r["v"]) for r in spark.read.parquet(str(p)).collect()}
    assert got == {1: ("a", "v1"), 2: ("a", "v2-new"),
                   3: ("b", "v3"), 9: ("a", "v9")}
    # partition k=b physically untouched
    assert sorted(f.name for f in (p / "k=b").glob("*.parquet")) == b_files_before
    assert [f.stat().st_mtime_ns
            for f in sorted((p / "k=b").glob("*.parquet"))] == b_mtimes_before


def test_upsert_parquet_requires_partitioning(spark, tmp_path):
    from blackroad_data_pipeline_spark.sinks import write_sink

    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    with pytest.raises(ValueError, match="partition_by"):
        write_sink(df, "upsert_parquet", {"path": str(tmp_path / "d"), "key": "id"})


def test_upsert_parquet_handles_moving_keys(spark, tmp_path):
    """A key whose update changes its partition value must not leave a
    stale copy in the old partition — and a partition emptied by the
    move disappears entirely."""
    from blackroad_data_pipeline_spark.sinks import write_sink

    p = tmp_path / "mv"
    base = spark.createDataFrame(
        [(1, "a", "v1"), (2, "b", "v2")], ["id", "k", "v"])
    write_sink(base, "upsert_parquet",
               {"path": str(p), "key": "id", "partition_by": "k"})
    # id=2 moves from partition b to partition c
    upd = spark.createDataFrame([(2, "c", "v2-moved")], ["id", "k", "v"])
    write_sink(upd, "upsert_parquet",
               {"path": str(p), "key": "id", "partition_by": "k"})
    got = {r["id"]: (r["k"], r["v"]) for r in spark.read.parquet(str(p)).collect()}
    assert got == {1: ("a", "v1"), 2: ("c", "v2-moved")}  # no stale b-copy
    assert not (p / "k=b").exists()  # emptied partition removed


def test_csv_sink_empty_append_preserves_existing(spark, tmp_path):
    """Empty-input cleanup must never destroy pre-existing data: an
    empty append leaves earlier rows intact."""
    from blackroad_data_pipeline_spark.sinks import write_sink

    p = tmp_path / "appendable"
    df = spark.createDataFrame([(1,), (2,)], ["x"])
    assert write_sink(df, "csv", {"path": str(p), "mode": "append"}) == 2
    empty = df.filter("x > 99")
    assert write_sink(empty, "csv", {"path": str(p), "mode": "append"}) == 0
    assert spark.read.option("header", True).csv(str(p)).count() == 2


def test_corpus_curation_pipeline_e2e(svc, tmp_path):
    """The round-2 curation operators composed THROUGH the control
    plane: clean_lines -> dedup_against (non-root history source) ->
    cap_per_group -> hash_columns -> json sink. Proves views wiring,
    order_index chaining, and run bookkeeping for the new ops."""
    p = svc.create_pipeline("curate")
    batch = [
        {"doc_id": 1, "src": "a",
         "text": "alpha beta gamma delta\nshort\nepsilon zeta eta theta"},
        {"doc_id": 2, "src": "a",
         "text": "alpha beta gamma delta\nepsilon zeta eta theta"},  # dup of 1 post-clean
        {"doc_id": 3, "src": "a",
         "text": "history doc one two\nthree four five six"},        # in history
        {"doc_id": 4, "src": "b",
         "text": "unique content here now\nmore words follow along"},
    ]
    history = [{"doc_id": 100,
                "text": "history doc one two\nthree four five six"}]
    svc.add_source(p.id, "batch", "inline", {"data": batch})
    svc.add_source(p.id, "history", "inline", {"data": history}, root=False)
    svc.add_transform(p.id, "clean_lines",
                      {"field": "text", "min_words": 3, "min_doc_words": 3},
                      order_index=0)
    svc.add_transform(p.id, "dedup_against",
                      {"field": "text", "id_field": "doc_id",
                       "history": "history"}, order_index=1)
    svc.add_transform(p.id, "cap_per_group",
                      {"partition_by": ["src"], "n": 5,
                       "id_field": "doc_id"}, order_index=2)
    svc.add_transform(p.id, "hash_columns",
                      {"fields": ["src"], "salt": "s1", "truncate": 8},
                      order_index=3)
    out = tmp_path / "curated.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    assert result["rows_read"] == 4
    rows = {r["doc_id"]: r for r in json.loads(out.read_text())}
    # doc 2 is the min-id survivor of the post-clean dup pair {1, 2}?
    # No: doc 1 cleans to the same text as doc 2 (the 1-word line
    # "short" is dropped), and dedup keeps the SMALLER id -> doc 1.
    # doc 3 matches history -> dropped. doc 4 survives.
    assert set(rows) == {1, 4}
    assert rows[1]["text"] == "alpha beta gamma delta\nepsilon zeta eta theta"
    assert all(len(r["src"]) == 8 for r in rows.values())
    assert result["rows_written"] == 2


def test_jdbc_source_real_driver(spark):
    """The jdbc source against a REAL JDBC driver (in-memory DuckDB via
    the locally cached duckdb_jdbc jar — see conftest): a partitioned
    scan must deliver every row exactly once across partitions. Skips
    when no driver jar is cached (the env has no pip/maven access)."""
    from tests.conftest import JDBC_JAR

    if not JDBC_JAR:
        pytest.skip("no JDBC driver jar available in this environment")
    from blackroad_data_pipeline_spark.sources import read_source

    df = read_source(spark, "jdbc", {
        "url": "jdbc:duckdb:",
        "driver": "org.duckdb.DuckDBDriver",
        "query": "SELECT range AS id, range % 7 AS grp FROM range(100)",
        "partition_column": "id",
        "lower_bound": 0,
        "upper_bound": 100,
        "num_partitions": 4,
    })
    rows = df.collect()
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert df.rdd.getNumPartitions() == 4

    # `postgres` is a reference-parity ALIAS of jdbc (the reference
    # declares the type at main.py:92 but never implemented it) —
    # same config, same reader
    alias = read_source(spark, "postgres", {
        "url": "jdbc:duckdb:",
        "driver": "org.duckdb.DuckDBDriver",
        "query": "SELECT range AS id FROM range(5)",
    })
    assert sorted(r["id"] for r in alias.collect()) == list(range(5))


def test_round3_curation_pipeline_e2e(svc, tmp_path):
    """The round-3 curation operators composed THROUGH the control
    plane: strip_markup -> dedup_lines -> corpus_diff-against-history
    is exercised separately (two-output shape), budget_select caps the
    output. Proves views wiring and run bookkeeping for the new ops."""
    p = svc.create_pipeline("curate3")
    batch = [
        {"doc_id": 1, "q": 3.0, "toks": 8,
         "text": "<b>alpha beta gamma delta epsilon</b>\nshared boilerplate footer line"},
        {"doc_id": 2, "q": 2.0, "toks": 8,
         "text": "zeta eta theta iota kappa\nshared boilerplate footer line"},
        {"doc_id": 3, "q": 1.0, "toks": 200,
         "text": "unique third document body text"},
    ]
    svc.add_source(p.id, "batch", "inline", {"data": batch})
    svc.add_transform(p.id, "strip_markup", {"field": "text"},
                      order_index=0)
    svc.add_transform(p.id, "dedup_lines",
                      {"field": "text", "id_field": "doc_id",
                       "min_chars": 10}, order_index=1)
    svc.add_transform(p.id, "budget_select",
                      {"weight_field": "toks", "budget": 16,
                       "order_by": ["q", "doc_id"], "descending": True,
                       "n_partitions": 2}, order_index=2)
    out = tmp_path / "curated3.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    rows = {r["doc_id"]: r for r in json.loads(out.read_text())}
    # budget 16 keeps the two best-quality docs (8+8 tokens); doc 3
    # (200 tokens) would blow the budget. strip_markup removed the
    # <b> tags BEFORE line dedup, so doc 1 and doc 2 share the footer
    # line and only doc 1 (smaller id) keeps it.
    assert set(rows) == {1, 2}
    assert "<b>" not in rows[1]["text"]
    assert "shared boilerplate footer line" in rows[1]["text"]
    assert "shared boilerplate footer line" not in rows[2]["text"]


def test_curation_gate_chain_e2e(svc, tmp_path):
    """The session-3 curation gates composed THROUGH the control
    plane: gopher_quality (rule gate) -> dup_span_stats (cross-doc
    span filter) -> quality_classifier (model gate trained on the
    surviving stream's own labels). Each stage drops exactly one
    designed document."""
    p = svc.create_pipeline("curate_gates")
    batch = [
        {"doc_id": 1, "lab": 1.0,
         "text": "the quick brown fox jumps over lazy dog"},
        {"doc_id": 2, "lab": 1.0, "text": "too short"},      # gopher drop
        {"doc_id": 3, "lab": 1.0,
         "text": "the alpha beta gamma delta"},              # 80% dup span
        {"doc_id": 4, "lab": 1.0,
         "text": "the alpha beta gamma delta plus many extra unique "
                 "tokens here now today friends"},           # 36% dup: kept
        {"doc_id": 5, "lab": 0.0,
         "text": "zxq vvk qqj xkz jjq kzx the qzv"},         # classifier drop
    ]
    svc.add_source(p.id, "batch", "inline", {"data": batch})
    svc.add_transform(p.id, "gopher_quality",
                      {"field": "text", "mode": "filter", "min_words": 5,
                       "min_mean_word_len": 3.0, "min_stop_hits": 1,
                       "stopwords": ["the"]}, order_index=0)
    svc.add_transform(p.id, "dup_span_stats",
                      {"field": "text", "id_field": "doc_id", "span": 3,
                       "min_docs": 2, "mode": "filter",
                       "max_fraction": 0.5}, order_index=1)
    svc.add_transform(p.id, "quality_classifier",
                      {"field": "text", "label_field": "lab",
                       "num_features": 1 << 12, "mode": "filter",
                       "min_prob": 0.5}, order_index=2)
    out = tmp_path / "curated_gates.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    rows = json.loads(out.read_text())
    assert sorted(r["doc_id"] for r in rows) == [1, 4]


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """Compaction after incremental ingest: 12 tiny per-batch files
    collapse to one right-sized file in a NEW dataset path (the swap
    stays the caller's atomic step), values intact; sort_by rewrites
    clustered so row-group stats become selective again."""
    from blackroad_data_pipeline_spark.sinks import compact_parquet

    src = str(tmp_path / "fragmented")
    for i in range(12):
        spark.createDataFrame([(i * 10 + j, f"v{i}") for j in range(5)],
                              "id long, v string").coalesce(1).write.mode(
            "append").parquet(src)
    before, after = compact_parquet(
        spark, src, str(tmp_path / "compacted"), target_file_mb=512)
    assert before >= 12 and after == 1
    got = sorted(r["id"] for r in
                 spark.read.parquet(str(tmp_path / "compacted")).collect())
    assert got == sorted(i * 10 + j for i in range(12) for j in range(5))

    b2, a2 = compact_parquet(
        spark, src, str(tmp_path / "sorted"), target_file_mb=512,
        sort_by=["id"])
    assert a2 == 1
    first = spark.read.parquet(str(tmp_path / "sorted")).first()
    assert first["id"] == 0  # sorted layout


def test_split_leakage_audit_composition(svc, tmp_path):
    """Train/test leakage audit THROUGH the control plane:
    split_assign buckets the corpus, then contamination_join flags
    train docs sharing shingles with the held-out split — the audit
    every data pipeline should run before shipping a training set.
    The near-duplicate pair lands in different splits by construction
    and must be flagged; the unique doc must not."""
    docs = [
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta"},
        {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta theta"},
        {"doc_id": 3, "text": "totally unrelated content words here now"},
    ]
    p = svc.create_pipeline("leakage_audit")
    svc.add_source(p.id, "corpus", "inline", {"data": docs})
    # force a deterministic "split": doc 2 is the held-out set
    svc.add_transform(p.id, "expr",
                      {"exprs": {"split": "IF(doc_id = 2, 'test', 'train')"}},
                      order_index=0)
    svc.add_transform(p.id, "filter",
                      {"field": "split", "op": "eq", "value": "train"},
                      order_index=1)
    svc.add_transform(p.id, "contamination_join",
                      {"field": "text", "id_field": "doc_id",
                       "benchmark": "heldout", "shingle_size": 3,
                       "min_shared": 2}, order_index=2)
    # reference semantics: every source unions into the main stream —
    # the held-out copy re-enters as doc 2 and the split filter drops it
    svc.add_source(p.id, "heldout", "inline", {"data": [docs[1]]})
    out = tmp_path / "audit.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    rows = json.loads(out.read_text())
    # output = flagged (train doc, benchmark doc, n_shared) pairs
    assert [(r["doc_id"], r["bench_id"]) for r in rows] == [(1, 2)]
    assert rows[0]["n_shared"] >= 2


def test_depends_on_reorders_execution(svc, tmp_path):
    """The reference stores depends_on but never reads it (verified,
    main.py:146-149); here it is a real topological constraint. The
    filter depends on the map that creates its column, even though
    order_index says otherwise."""
    p = svc.create_pipeline("dag")
    svc.add_source(p.id, "rows", "inline", {"data": [
        {"x": "3"}, {"x": "40"}, {"x": "nope"}]})
    # order_index puts the filter FIRST — depends_on must flip them
    m = svc.add_transform(p.id, "map",
                          {"field": "x", "operation": "int", "as": "xi"},
                          order_index=2)
    svc.add_transform(p.id, "filter",
                      {"field": "xi", "op": "gt", "value": 10},
                      order_index=1, depends_on=m.id)
    out = tmp_path / "dag.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    import json as _json

    rows = _json.loads(out.read_text())
    assert [r["xi"] for r in rows] == [40]


def test_depends_on_unknown_id_and_cycle_raise(svc):
    from blackroad_data_pipeline_spark.catalog import TransformDef
    from blackroad_data_pipeline_spark.service import _dependency_order

    a = TransformDef("a", "map", {}, 0, depends_on="zzz")
    with pytest.raises(ValueError, match="unknown transform id"):
        _dependency_order([a])
    b = TransformDef("b", "map", {}, 0, depends_on="c")
    c = TransformDef("c", "map", {}, 1, depends_on="b")
    with pytest.raises(ValueError, match="dependency cycle"):
        _dependency_order([b, c])


def test_round4_operators_compose_through_service(svc, tmp_path):
    """Round-4 operators driven by the control plane: SCD2 versioning
    of an observation stream, then a k-anonymity screen over the
    version rows, through run_pipeline bookkeeping to a JSON sink."""
    p = svc.create_pipeline("round4")
    svc.add_source(p.id, "obs", "inline", {"data": [
        {"k": 1, "ts": 10, "v": "a", "region": "eu"},
        {"k": 1, "ts": 20, "v": "b", "region": "eu"},
        {"k": 2, "ts": 10, "v": "a", "region": "eu"},
        {"k": 3, "ts": 10, "v": "x", "region": "us"},
    ]})
    svc.add_transform(p.id, "scd2",
                      {"keys": ["k"], "attrs": ["v"], "ts_field": "ts"},
                      order_index=0)
    svc.add_transform(p.id, "k_anonymity",
                      {"quasi_identifiers": ["v"], "k": 2}, order_index=1)
    out = tmp_path / "r4.json"
    svc.add_sink(p.id, "json", {"path": str(out)})
    result = svc.run_pipeline(p.id)
    assert result["status"] == "success"
    assert result["rows_read"] == 4
    import json as _json

    rows = _json.loads(out.read_text())
    # scd2: k=1 has two versions (a then b), k=2/k=3 one each = 4 rows
    assert len(rows) == 4
    by = {(r["k"], r["v"]): r for r in rows}
    assert by[(1, "a")]["valid_to"] == 20 and by[(1, "b")]["is_current"]
    # k-anonymity over the v attribute: 'a' appears twice (safe),
    # 'b' and 'x' once (unsafe)
    assert by[(1, "a")]["k_anonymous"] and by[(2, "a")]["k_anonymous"]
    assert not by[(1, "b")]["k_anonymous"]
    assert not by[(3, "x")]["k_anonymous"]
