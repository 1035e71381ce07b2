"""Sinks: name -> (df, config) -> rows_written.

Parity with the reference sinks (stdout/json/csv/sqlite, reference
main.py:309-343) plus the Spark-native scale sinks (parquet, jsonl,
csv-dir). Reference-parity sinks that produce ONE local file
necessarily funnel through the driver — fine for query results,
wrong for datasets; the scale sinks write partitioned directories
executor-side.
"""

from __future__ import annotations

import json
import sqlite3
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame

SinkFn = Callable[[DataFrame, Mapping], int]

SINKS: dict[str, SinkFn] = {}


def register(name: str):
    def deco(fn: SinkFn) -> SinkFn:
        SINKS[name] = fn
        return fn

    return deco


def write_sink(df: DataFrame, sink_type: str, config: Mapping | None = None) -> int:
    try:
        fn = SINKS[sink_type]
    except KeyError:
        raise ValueError(
            f"unknown sink type: {sink_type!r} (known: {sorted(SINKS)})"
        ) from None
    return fn(df, config or {})


def _rows_as_dicts(df: DataFrame) -> list[dict]:
    return [row.asDict(recursive=True) for row in df.collect()]


@register("stdout")
def sink_stdout(df: DataFrame, config: Mapping) -> int:
    """Pretty-print rows as a JSON array (reference main.py:310-312)."""
    rows = _rows_as_dicts(df)
    print(json.dumps(rows, indent=2, default=str))
    return len(rows)


@register("json")
def sink_json(df: DataFrame, config: Mapping) -> int:
    """One pretty-printed JSON array file (reference main.py:313-316).
    Driver-side by design; use ``jsonl`` for dataset-sized output."""
    rows = _rows_as_dicts(df)
    with open(config.get("path", "output.json"), "w") as f:
        json.dump(rows, f, indent=2, default=str)
    return len(rows)


@register("jsonl")
def sink_jsonl(df: DataFrame, config: Mapping) -> int:
    """Partitioned JSON-lines directory — the scale JSON sink."""
    out = df
    n = df.count()
    out.write.mode(config.get("mode", "overwrite")).json(config["path"])
    return n


@register("csv")
def sink_csv(df: DataFrame, config: Mapping) -> int:
    """CSV with header. The fixed schema removes the reference's
    ragged-row crash (header = first row's keys, main.py:317-325).
    ``single_file=True`` coalesces to one part for local-file parity;
    default is a partitioned directory (the scale path)."""
    n = df.count()
    if n == 0 and not config.get("write_empty"):
        return 0  # reference: empty data -> no file (main.py:319-320)
    writer = df.coalesce(1) if config.get("single_file") else df
    (writer.write.mode(config.get("mode", "overwrite"))
     .option("header", True)
     .option("sep", config.get("delimiter", ","))
     .csv(config.get("path", "output.csv")))
    return n


@register("parquet")
def sink_parquet(df: DataFrame, config: Mapping) -> int:
    """The native columnar sink. ``partition_by`` columns become
    directory partitions (partition pruning for downstream readers)."""
    n = df.count()
    writer = df.write.mode(config.get("mode", "overwrite"))
    if config.get("partition_by"):
        writer = writer.partitionBy(*config["partition_by"])
    writer.parquet(config["path"])
    return n


@register("sqlite")
def sink_sqlite(df: DataFrame, config: Mapping) -> int:
    """All-TEXT SQLite table (reference main.py:326-341: CREATE TABLE
    with every column TEXT, insert all rows). Driver-side; result-set
    sized data only."""
    rows = _rows_as_dicts(df)
    table = config.get("table", "output")
    cols = df.columns
    with sqlite3.connect(config["database"]) as con:
        col_ddl = ", ".join(f'"{c}" TEXT' for c in cols)
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({col_ddl})')
        placeholders = ", ".join("?" for _ in cols)
        con.executemany(
            f'INSERT INTO "{table}" VALUES ({placeholders})',
            [tuple(None if row[c] is None else str(row[c]) for c in cols) for row in rows],
        )
        con.commit()
    return len(rows)
