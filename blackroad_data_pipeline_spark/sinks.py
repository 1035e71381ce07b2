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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

SinkFn = Callable[[DataFrame, Mapping], int]


def _target_exists(df: DataFrame, path: str) -> bool:
    """Existence probe through Hadoop FS, so it answers correctly for
    any URI scheme the write itself could target (local, hdfs://,
    s3a://…), not just driver-local paths."""
    spark = df.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    return bool(jpath.getFileSystem(conf).exists(jpath))


def _write_counted(df: DataFrame, mode: str, write, exists=None) -> int:
    """Count rows as a side-effect of the write itself — never a
    second full computation of the plan (df.count() + write = 2x the
    work at 100 TB). mode='ignore' may skip the job entirely, in
    which case the Observation would never fire and obs.get would
    block forever (and a post-write count would over-report rows the
    skipped job never wrote) — so ignore mode probes the target first
    and reports 0 without running any job when it already exists."""
    if mode == "ignore":
        if exists is None:
            raise ValueError("mode='ignore' requires an existence probe")
        if exists():
            return 0
    obs = Observation()
    out = df.observe(obs, F.count(F.lit(1)).alias("n"))
    write(out)
    return int(obs.get["n"])

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
    mode = config.get("mode", "overwrite")
    return _write_counted(df, mode,
                          lambda d: d.write.mode(mode).json(config["path"]),
                          exists=lambda: _target_exists(df, config["path"]))


@register("csv")
def sink_csv(df: DataFrame, config: Mapping) -> int:
    """CSV with header. The fixed schema removes the reference's
    ragged-row crash (header = first row's keys, main.py:317-325).
    ``single_file=True`` coalesces to one part for local-file parity;
    default is a partitioned directory (the scale path).

    Empty-input parity (reference: empty data -> no file,
    main.py:319-320): a LIMIT-1 emptiness probe decides up front —
    near-free on non-empty input (first row short-circuits) — and an
    empty input skips the write entirely, so no file is created AND a
    pre-existing target is never destroyed or replaced by an empty
    directory. The full row count still comes from the write-side
    Observation, never a separate count of the plan."""
    mode = config.get("mode", "overwrite")
    path = config.get("path", "output.csv")
    if mode == "ignore" and _target_exists(df, path):
        return 0
    if not config.get("write_empty") and df.isEmpty():
        return 0  # reference parity: empty data -> no write at all

    def write(d):
        if config.get("single_file"):
            d = d.coalesce(1)
        (d.write.mode(mode)
         .option("header", True)
         .option("sep", config.get("delimiter", ","))
         .csv(path))

    return _write_counted(df, mode, write,
                          exists=lambda: _target_exists(df, path))


@register("parquet")
def sink_parquet(df: DataFrame, config: Mapping) -> int:
    """The native columnar sink. ``partition_by`` columns become
    directory partitions (partition pruning for downstream readers);
    ``sort_by`` sorts within partitions so parquet min/max row-group
    stats actually skip data for range predicates on those columns;
    ``max_records_per_file`` bounds file size (the other half of the
    small-file/huge-file problem — pair with the ``repartition``
    operator to control file COUNT)."""
    mode = config.get("mode", "overwrite")

    def write(d):
        if config.get("sort_by"):
            d = d.sortWithinPartitions(*config["sort_by"])
        writer = d.write.mode(mode)
        if config.get("max_records_per_file"):
            writer = writer.option("maxRecordsPerFile",
                                   int(config["max_records_per_file"]))
        if config.get("partition_by"):
            writer = writer.partitionBy(*config["partition_by"])
        writer.parquet(config["path"])

    return _write_counted(df, mode, write,
                          exists=lambda: _target_exists(df, config["path"]))


@register("upsert_parquet")
def sink_upsert_parquet(df: DataFrame, config: Mapping) -> int:
    """Keyed upsert (MERGE) into a partitioned parquet dataset via
    DYNAMIC partition overwrite: rows in ``df`` replace same-``key``
    rows and append new keys, and ONLY the partitions holding updated
    keys are rewritten — untouched partition directories are not
    rewritten. This is the incremental-refresh primitive at 100 TB:
    the rewrite cost is proportional to the touched partitions, not
    the dataset. Keys that MOVE between partitions are handled (their
    old copy is found via a key/partition-column-pruned scan and
    removed, and a partition left empty by the move is deleted);
    ``assume_partition_stable_keys: true`` skips that scan when the
    caller guarantees keys never change partition.

    ``partition_by`` is required — an unpartitioned upsert would
    rewrite the whole dataset, which should be an explicit
    ``parquet`` overwrite instead, not an implicit one. The merged
    slice (touched partitions only) is eagerly materialized before
    the write because Spark cannot overwrite a path it is still
    reading from.
    """
    path = config["path"]
    keys = [config["key"]] if isinstance(config.get("key"), str) else list(config["key"])
    parts = config.get("partition_by")
    if not parts:
        raise ValueError("upsert_parquet requires partition_by — an "
                         "unpartitioned upsert rewrites the whole dataset; "
                         "use the parquet sink with mode=overwrite for that")
    parts = [parts] if isinstance(parts, str) else list(parts)

    def write(d):
        (d.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(*parts)
         .parquet(path))

    if not _target_exists(df, path):
        return _write_counted(df, "overwrite", write)

    spark = df.sparkSession
    existing = spark.read.parquet(path)
    upd_keys = df.select(*keys).dropDuplicates()
    if config.get("assume_partition_stable_keys"):
        # caller guarantees a key never changes partition value: only
        # the updates' own partitions need reading
        touched = df.select(*parts).dropDuplicates()
    else:
        # a key may MOVE partitions (e.g. re-dated row): its old copy
        # lives in a partition the updates don't mention, and skipping
        # it would leave a stale duplicate. Find every partition that
        # holds an updated key — a key+partition-column-pruned scan
        # (cheap next to the rewrite), skippable via the flag above.
        touched = (existing.join(F.broadcast(upd_keys), keys, "left_semi")
                   .select(*parts)
                   .unionByName(df.select(*parts))
                   .dropDuplicates())
    if set(existing.columns) != set(df.columns):
        # a narrower update batch would silently rewrite touched
        # partitions WITHOUT the missing columns — refuse loudly
        raise ValueError(
            f"upsert_parquet schema mismatch: dataset has "
            f"{sorted(existing.columns)}, updates have {sorted(df.columns)}")
    old_slice = existing.join(F.broadcast(touched), parts, "left_semi")
    survivors = old_slice.join(F.broadcast(upd_keys), keys, "left_anti")
    merged = survivors.select(*df.columns).unionByName(df)
    merged = merged.localCheckpoint(eager=True)  # break lineage to `path`
    # a partition whose ONLY rows were moved-away keys is now empty;
    # dynamic overwrite never rewrites a partition it writes no rows
    # to, so those directories must be deleted explicitly (the
    # touched-partition list is small — it was broadcast)
    emptied = [tuple(r) for r in
               touched.exceptAll(merged.select(*parts).dropDuplicates()).collect()]
    n = _write_counted(merged, "overwrite", write)
    esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    fs_conf = spark._jsc.hadoopConfiguration()
    for vals in emptied:
        # Spark's own Hive path escaping, so special-char and NULL
        # partition values resolve to the real directory names
        seg = "/".join(
            f"{esc.escapePathName(c)}="
            + ("__HIVE_DEFAULT_PARTITION__" if v is None
               else esc.escapePathName(str(v)))
            for c, v in zip(parts, vals))
        jp = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/{seg}")
        jp.getFileSystem(fs_conf).delete(jp, True)
    return n


@register("bucketed_table")
def sink_bucketed_table(df: DataFrame, config: Mapping) -> int:
    """Bucketed (and optionally sorted) managed table via
    ``saveAsTable`` — the co-located-join sink. Two tables bucketed on
    the same keys with the same bucket count join with NO exchange on
    either side (asserted in tests/test_plans.py): at 100 TB,
    pre-bucketing fact tables on their join key pays the shuffle once
    at write time instead of on every query."""
    mode = config.get("mode", "overwrite")

    def write(d):
        writer = (d.write.mode(mode)
                  .format(config.get("format", "parquet"))
                  .bucketBy(int(config.get("buckets", 32)), *config["bucket_by"]))
        if config.get("sort_by"):
            writer = writer.sortBy(*config["sort_by"])
        writer.saveAsTable(config["table"])

    return _write_counted(
        df, mode, write,
        exists=lambda: df.sparkSession.catalog.tableExists(config["table"]))


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


@register("orc")
def sink_orc(df: DataFrame, config: Mapping) -> int:
    """Columnar ORC sink (symmetry with the orc source); same
    partition/sort layout options as parquet."""
    mode = config.get("mode", "overwrite")

    def write(d):
        if config.get("sort_by"):
            d = d.sortWithinPartitions(*config["sort_by"])
        writer = d.write.mode(mode)
        if config.get("max_records_per_file"):
            writer = writer.option("maxRecordsPerFile",
                                   int(config["max_records_per_file"]))
        if config.get("partition_by"):
            writer = writer.partitionBy(*config["partition_by"])
        writer.orc(config["path"])

    return _write_counted(df, mode, write,
                          exists=lambda: _target_exists(df, config["path"]))


@register("xml")
def sink_xml(df: DataFrame, config: Mapping) -> int:
    """XML sink (Spark 4 built-in xml format; symmetry with the xml
    source): one ``row_tag`` element per row under ``root_tag``.
    Struct columns nest; use for interchange with XML-consuming
    systems, not as a lake format (not columnar, no pushdown)."""
    mode = config.get("mode", "overwrite")

    def write(d):
        (d.write.mode(mode).format("xml")
         .option("rowTag", config.get("row_tag", "row"))
         .option("rootTag", config.get("root_tag", "rows"))
         .save(config["path"]))

    return _write_counted(df, mode, write,
                          exists=lambda: _target_exists(df, config["path"]))


def data_file_stats(spark, path: str) -> tuple[int, int]:
    """(count, bytes) of DATA files under ``path`` — skips _SUCCESS /
    hidden markers, recurses into partition directories. Hadoop FS
    listing, no Spark job."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    it = fs.listFiles(p, True)
    n = b = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
            b += st.getLen()
    return n, b


def compact_parquet(spark, src_path: str, dst_path: str,
                    target_file_mb: int = 512,
                    sort_by: list | None = None) -> tuple[int, int]:
    """Small-file compaction — the maintenance pass every
    streaming/incremental sink eventually needs at 100 TB (each
    availableNow drain and each upsert generation leaves its own
    files; thousands of small files turn listing + scan planning into
    the bottleneck long before the bytes do).

    Reads ``src_path``, sizes the output from the ACTUAL on-disk
    bytes (Hadoop FS ``getContentSummary`` — no sampling pass), and
    rewrites to ``dst_path`` as ceil(bytes / target_file_mb) files,
    optionally sorted (``sort_by`` — restores row-group min/max
    selectivity that interleaved appends destroy). Compaction writes
    to a NEW path by design: the parquet dataset swap (rename or view
    repoint) is the caller's atomic step; an in-place rewrite could
    not be made atomic on a plain filesystem and a half-finished one
    would destroy the only copy.

    Returns (n_files_before, n_files_after).
    """
    def data_files(path: str) -> tuple[int, int]:
        return data_file_stats(spark, path)

    n_before, n_bytes = data_files(src_path)
    n_files = max(1, -(-n_bytes // (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(src_path)
    if sort_by:
        # repartitionByRange + sortWithinPartitions: balanced output
        # files AND tight per-file min/max on the sort keys
        df = (df.repartitionByRange(int(n_files), *sort_by)
              .sortWithinPartitions(*sort_by))
    else:
        df = df.coalesce(int(n_files))
    df.write.mode("error").parquet(dst_path)
    n_after, _ = data_files(dst_path)
    return int(n_before), int(n_after)
