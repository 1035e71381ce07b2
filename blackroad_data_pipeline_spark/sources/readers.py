"""Source readers: name -> (spark, config) -> DataFrame.

Parity with the reference's source types (csv/json/sqlite/inline,
reference main.py:106-138) plus the Spark-native scale formats
(parquet, orc, jsonl, jdbc). Every reader returns a LAZY DataFrame —
the reference fully materializes ``list(reader)`` (main.py:123);
here the scan participates in pushdown/pruning.
"""

from __future__ import annotations

import json
import sqlite3
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SourceFn = Callable[[SparkSession, Mapping], DataFrame]

SOURCES: dict[str, SourceFn] = {}


def register(name: str):
    def deco(fn: SourceFn) -> SourceFn:
        SOURCES[name] = fn
        return fn

    return deco


def read_source(spark: SparkSession, source_type: str, config: Mapping) -> DataFrame:
    try:
        fn = SOURCES[source_type]
    except KeyError:
        raise ValueError(
            f"unknown source type: {source_type!r} (known: {sorted(SOURCES)})"
        ) from None
    return fn(spark, config)


def nanos_to_timestamp(df: DataFrame, col: str) -> DataFrame:
    """Normalize an event-time column to session-TZ TimestampType.

    Handles both parquet encodings the fixture generator has produced:
    - epoch-nanoseconds long (TIMESTAMP(NANOS) read under
      spark.sql.legacy.parquet.nanosAsLong): integer `div` — a double
      round-trip would lose precision at epoch-ns magnitude
      (~1.7e18 > 2^53).
    - TIMESTAMP_NTZ (isAdjustedToUTC=false micros): cast to TimestampType;
      the session timezone is pinned to UTC everywhere we read fixtures,
      so the wall-clock value is preserved and downstream epoch casts
      (`cast(ts as bigint)` = epoch seconds) resolve.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


@register("parquet")
def src_parquet(spark: SparkSession, config: Mapping) -> DataFrame:
    """Parquet scan — the columnar default at scale: splittable,
    predicate-pushdown + column pruning, row-group min/max skipping.
    ``nanos_timestamp_cols`` normalizes event-time columns (see
    nanos_to_timestamp)."""
    df = spark.read.parquet(config["path"])
    for c in config.get("nanos_timestamp_cols", []):
        df = nanos_to_timestamp(df, c)
    return df


@register("orc")
def src_orc(spark: SparkSession, config: Mapping) -> DataFrame:
    """ORC scan — same columnar properties as parquet for
    ORC-standardized lakes."""
    return spark.read.orc(config["path"])


@register("xml")
def src_xml(spark: SparkSession, config: Mapping) -> DataFrame:
    """XML scan via Spark 4's built-in xml source (the spark-xml
    package merged upstream in 4.0): one row per ``row_tag`` element,
    attributes as ``_attr`` columns, nested elements as structs.
    Splittable per file; schema inference reads the data once, so
    pass ``schema`` for large corpora. No reference counterpart
    (SURVEY.md §2.1 stops at csv/json/sqlite)."""
    reader = (spark.read.format("xml")
              .option("rowTag", config.get("row_tag", "row")))
    if config.get("schema"):
        reader = reader.schema(config["schema"])
    for k, v in config.get("options", {}).items():
        reader = reader.option(k, v)
    return reader.load(config["path"])


@register("table")
def src_table(spark: SparkSession, config: Mapping) -> DataFrame:
    """A catalog table (e.g. written by the ``bucketed_table`` sink).
    Bucketing metadata flows into planning, so same-bucketed joins
    skip their exchanges."""
    return spark.table(config["table"])


@register("csv")
def src_csv(spark: SparkSession, config: Mapping) -> DataFrame:
    """Header CSV. ``infer_schema=False`` by default: every column
    arrives as string, mirroring the reference's csv.DictReader typing
    (main.py:118-123). Set True for typed reads."""
    reader = (
        spark.read.option("header", config.get("header", True))
        .option("sep", config.get("delimiter", ","))
        .option("inferSchema", bool(config.get("infer_schema", False)))
    )
    if config.get("schema"):
        reader = reader.schema(config["schema"])
    return reader.csv(config["path"])


@register("json")
def src_json(spark: SparkSession, config: Mapping) -> DataFrame:
    """A JSON document file: top-level array -> rows, single object ->
    one row (reference main.py:125-128). multiLine handles the
    whole-file-array layout; ``lines=True`` switches to JSONL for the
    splittable, scalable layout."""
    if config.get("lines"):
        return spark.read.json(config["path"])
    return spark.read.option("multiLine", True).json(config["path"])


@register("inline")
def src_inline(spark: SparkSession, config: Mapping) -> DataFrame:
    """Rows embedded in the source config (reference main.py:113-114)."""
    data = config["data"]
    schema = config.get("schema")
    if schema:
        return spark.createDataFrame(data, schema=schema)
    if data and isinstance(data[0], dict):
        # stable column order: first row's keys, then any stragglers
        cols = list(data[0].keys())
        for row in data[1:]:
            for k in row:
                if k not in cols:
                    cols.append(k)
        rows = [tuple(row.get(c) for c in cols) for row in data]
        return spark.createDataFrame(rows, cols)
    return spark.createDataFrame(data)


@register("sqlite")
def src_sqlite(spark: SparkSession, config: Mapping) -> DataFrame:
    """Read a SQLite table or query (reference main.py:130-138).

    SQLite files are driver-local by nature, so this reads through the
    stdlib driver and parallelizes afterwards; row sets here are
    control-plane sized. Cluster-scale relational reads should use the
    ``jdbc`` source with a partition column instead.
    """
    database = config["database"]
    query = config.get("query") or f"SELECT * FROM {config['table']}"
    with sqlite3.connect(database) as con:
        con.row_factory = sqlite3.Row
        rows = [dict(r) for r in con.execute(query).fetchall()]
    return src_inline(spark, {"data": rows}) if rows else spark.createDataFrame([], "id string")


@register("api")
def src_api(spark: SparkSession, config: Mapping) -> DataFrame:
    """HTTP(S) JSON API source — declared but unimplemented in the
    reference (main.py:92 lists it; read() raises, main.py:115-116).

    Fetches once on the driver (APIs are control-plane-sized inputs;
    paginate with ``pages`` URLs). A top-level array becomes rows, an
    object with ``data_key`` unwraps, a bare object is one row.
    file:// URLs work for tests/offline use.
    """
    import json as _json
    import urllib.request

    urls = config.get("pages") or [config["url"]]
    rows: list[dict] = []
    for url in urls:
        with urllib.request.urlopen(url, timeout=config.get("timeout", 30)) as resp:
            doc = _json.loads(resp.read().decode("utf-8"))
        if config.get("data_key"):
            doc = doc[config["data_key"]]
        rows.extend(doc if isinstance(doc, list) else [doc])
    if not rows:
        return spark.createDataFrame([], config.get("schema", "id string"))
    return src_inline(spark, {"data": rows, "schema": config.get("schema")})


@register("postgres")
def src_postgres(spark: SparkSession, config: Mapping) -> DataFrame:
    """Alias for ``jdbc`` — the reference DECLARES a ``postgres``
    source type (main.py:92) without ever implementing it; a config
    written against that name runs here unchanged (reference-parity
    naming; supply a postgresql JDBC ``url``)."""
    return src_jdbc(spark, config)


@register("jdbc")
def src_jdbc(spark: SparkSession, config: Mapping) -> DataFrame:
    """Partitioned JDBC scan — the scale path for relational sources.
    Supply partition_column/num_partitions so executors read in
    parallel instead of one serialized result set."""
    reader = (
        spark.read.format("jdbc")
        .option("url", config["url"])
        .option("dbtable", config.get("table") or f"({config['query']}) q")
    )
    for opt in ("user", "password", "driver"):
        if config.get(opt):
            reader = reader.option(opt, config[opt])
    if config.get("partition_column"):
        reader = (
            reader.option("partitionColumn", config["partition_column"])
            .option("lowerBound", config["lower_bound"])
            .option("upperBound", config["upper_bound"])
            .option("numPartitions", config.get("num_partitions", 16))
        )
    return reader.load()


@register("range")
def src_range(spark: SparkSession, config: Mapping) -> DataFrame:
    """Synthetic integer range — handy for generators and tests."""
    return spark.range(config.get("start", 0), config["end"],
                       config.get("step", 1))


@register("text")
def src_text(spark: SparkSession, config: Mapping) -> DataFrame:
    """Raw text files — the LLM-corpus ingestion primitive. Default:
    one row per LINE (column ``value``; splittable, scales to any file
    size). ``whole_file=True``: one row per FILE with its path
    (column ``value`` + ``path`` via the metadata column) for
    document-per-file corpora; files are not split, so pair it with
    many input files rather than one giant one."""
    if config.get("whole_file"):
        df = spark.read.text(config["path"], wholetext=True)
        return df.select(F.col("value"),
                         F.col("_metadata.file_path").alias("path"))
    return spark.read.text(config["path"])


@register("binary_files")
def src_binary_files(spark: SparkSession, config: Mapping) -> DataFrame:
    """Opaque binary ingestion (images/audio/video) via Spark's
    ``binaryFile`` format: (path, modificationTime, length, content).
    ``content`` plugs straight into the multimodal operators
    (decode_image / audio_features / frame_sample take it as the
    payload column). ``glob`` filters by filename pattern, e.g.
    ``*.png``. Files are read whole per row; control task size with
    spark.sql.files.maxPartitionBytes when payloads are large."""
    reader = spark.read.format("binaryFile")
    if config.get("glob"):
        reader = reader.option("pathGlobFilter", config["glob"])
    if config.get("recursive"):
        reader = reader.option("recursiveFileLookup", True)
    return reader.load(config["path"])


@register("fixed_width")
def src_fixed_width(spark: SparkSession, config: Mapping) -> DataFrame:
    """Fixed-width (mainframe/COBOL-export style) text files:
    ``columns`` is an ordered list of {name, width} (or {name, start,
    end} 1-based inclusive positions); each field is a trimmed
    substring projection over the splittable line reader — pure
    codegen, no Python, scales like any text scan. All columns read
    as strings (reference CSV semantics); ``types`` optionally casts
    per column afterwards (try_cast — malformed cells become NULL,
    matching the map-op divergence note in SURVEY.md §7.4.1).
    ``trim: false`` keeps padding spaces."""
    cols = list(config["columns"])
    trim = config.get("trim", True)
    lines = spark.read.text(config["path"])
    out_cols = []
    pos = 1
    for c in cols:
        name = c["name"]
        if "start" in c:
            start, width = int(c["start"]), int(c["end"]) - int(c["start"]) + 1
        else:
            start, width = pos, int(c["width"])
            pos += width
        field = F.substring(F.col("value"), start, width)
        if trim:
            field = F.trim(field)
        out_cols.append(field.alias(name))
    df = lines.select(*out_cols)
    for name, typ in (config.get("types") or {}).items():
        df = df.withColumn(name, F.expr(f"try_cast({name} AS {typ})"))
    return df
