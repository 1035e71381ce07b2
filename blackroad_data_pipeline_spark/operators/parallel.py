"""Adaptive kernel-input parallelism (round-13 optimization).

Arrow/pandas kernels and per-row-expensive projections inherit the
upstream partitioning. A scan of one unsplittable file — or of a few
files with single large row groups, which is exactly what the local
fixtures are — yields fewer tasks than the session has cores, so a
per-doc Python kernel runs nearly serially no matter how wide the
cluster is (the "input skew: one huge unsplittable file" case of the
optimization playbook §2.5; the fix there is "repartition immediately
after the read").

``fan_out(df)`` widens such inputs with ONE round-robin repartition
placed BEFORE the kernel: the exchange moves the raw input rows once
(cheap relative to the kernel by construction — fan_out is only
applied where the per-row work dominates), and the exchange doubles
as the projection barrier that keeps Catalyst from collapsing the
kernel into the scan stage. When the input already has at least
``target`` partitions — any real at-scale table — it is a NO-OP: no
extra exchange is ever added at 100 TB, so the production plan shape
is unchanged.

Width is SIZE-AWARE with a measured floor (round 14): the target is

    min(defaultParallelism, max(8, leaf_scan_bytes // 128 MB))

so a genuinely large starved input (one 50 GB gzip) fans to a width
proportional to its bytes (guide §6's 128 MB split sizing) while small
local inputs keep the measured knee of 8. The byte estimate sums the
LEAF relation statistics of the optimized plan (real file sizes for
file scans); leaves without statistics report Spark's Long.Max
sentinel and are ignored, so join-heavy subtrees with garbage
estimates safely fall back to the floor. Measured width sweep (sf0.1,
min-of-N bench): standalone kernel queries plateau by width 8 (winnow
4.87 s un-fanned -> 1.25 s at 8 -> 1.51 s at 32), while composed
ingest chains whose band/signature subtrees re-execute per day
DEGRADE with width because every extra task multiplies per-stage
scheduling/Arrow overhead across dozens of stages.

``SPARK_GRAFT_KERNEL_FANOUT`` pins the TARGET width for deployments
whose starved inputs deserve more (``0`` disables fan-out entirely).
Note the ``n >= target`` no-op still applies: the knob can only
WIDEN a narrow input up to its value, never narrow an already-wide
one (narrowing would add an exchange to at-scale plans). A malformed
value is ignored with a one-time warning — it must never break the
operators that widen.

Only partition-INVARIANT kernels may be fanned out (every call site
is a per-row/per-doc deterministic function); order-sensitive kernels
(per-partition sketch candidate generation) must not use this helper.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)

# see module docstring: measured plateau/degradation knee at sf0.1
_DEFAULT_MAX_WIDTH = 8
# guide §6: 128 MB-1 GB per task for large scans; the floor above
# dominates until a starved input exceeds 1 GB
_TARGET_PARTITION_BYTES = 128 * 1024 * 1024
# leaf stats at or above this are Spark's "unknown size" sentinel
# (defaultSizeInBytes = Long.Max) or join-estimate garbage — ignore
_UNKNOWN_SIZE_FLOOR = 1 << 60

_warned: set[str] = set()


def _warn_once(key: str, msg: str, *args) -> None:
    if key not in _warned:
        _warned.add(key)
        log.warning(msg, *args)


def _knob_width() -> int | None:
    """SPARK_GRAFT_KERNEL_FANOUT parsed defensively: ``None`` when
    unset or malformed (ADVICE r13 — a bad value must not raise inside
    every kernel operator), else the non-negative int."""
    raw = os.environ.get("SPARK_GRAFT_KERNEL_FANOUT", "")
    if not raw:
        return None
    try:
        v = int(raw.strip())
        if v < 0:
            raise ValueError(raw)
        return v
    except ValueError:
        _warn_once(f"knob:{raw}",
                   "ignoring malformed SPARK_GRAFT_KERNEL_FANOUT=%r "
                   "(expected an int >= 0); using the default width", raw)
        return None


def _leaf_scan_bytes(df: DataFrame) -> int:
    """Sum of the optimized plan's LEAF relation size statistics —
    real file bytes for file scans. Leaves without statistics (Spark
    reports Long.Max) are skipped; any failure reports 0 so the caller
    falls back to the measured floor."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            b = int(leaves.apply(i).stats().sizeInBytes().toString())
            if 0 < b < _UNKNOWN_SIZE_FLOOR:
                total += b
        return total
    except Exception:
        _warn_once("leaf_stats",
                   "fan_out: leaf statistics unavailable for a plan; "
                   "using the default width floor")
        return 0


def fan_out(df: DataFrame, max_width: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin to the size-aware target width
    iff it currently has fewer partitions — a no-op on any input that
    already carries enough tasks. Streaming inputs are returned
    unchanged (their micro-batch partitioning is owned by the
    source)."""
    knob = _knob_width()
    if knob == 0:
        return df
    if df.isStreaming:
        return df
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if knob:
        target = knob
    else:
        by_size = _leaf_scan_bytes(df) // _TARGET_PARTITION_BYTES
        target = min(parallelism, max(_DEFAULT_MAX_WIDTH, by_size))
    if max_width:
        target = min(target, max_width)
    if target <= 1:
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        # plans the RDD conversion cannot express (should not happen
        # for batch inputs) — never let the widening break the query
        _warn_once("numparts",
                   "fan_out: partition count unavailable for a plan; "
                   "leaving the input unwidened")
        return df
    if n >= target:
        return df
    return df.repartition(target)


# Types the Arrow LocalRelation path converts with EXACTLY the same
# semantics as the pickled-RDD path (verified: big ints exact, NaN
# preserved, NULLs, float32 rounds-to-nearest identically). Timestamps
# are excluded — the RDD path interprets naive datetimes in the HOST
# zone while Arrow assumes UTC — as are Decimal/interval/UDT exotics.
_ARROW_SAFE_ATOMS = None  # populated lazily (pyspark.sql.types import)


def _arrow_safe_type(dt) -> bool:
    from pyspark.sql import types as T

    global _ARROW_SAFE_ATOMS
    if _ARROW_SAFE_ATOMS is None:
        _ARROW_SAFE_ATOMS = (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.StringType, T.BooleanType,
            T.BinaryType, T.DateType)
    if isinstance(dt, T.ArrayType):
        return _arrow_safe_type(dt.elementType)
    if isinstance(dt, T.MapType):
        return _arrow_safe_type(dt.keyType) and _arrow_safe_type(dt.valueType)
    if isinstance(dt, T.StructType):
        return all(_arrow_safe_type(f.dataType) for f in dt.fields)
    return type(dt) in _ARROW_SAFE_ATOMS


def arrow_local_frame(spark: SparkSession, rows: list, schema):
    """Build ``rows`` as an Arrow-backed **LocalRelation** — or return
    ``None`` when the data/schema cannot be converted faithfully.

    A LocalRelation executes as ``LocalTableScan``: no pickled-RDD
    scan, no Python-worker round trip on ANY consuming job, and
    Catalyst sees exact row counts/sizes (broadcast estimates stop
    being RDD guesses). Measured on this box: ``collect()`` of a
    20-row literal frame drops 208 ms -> 4 ms; a groupBy over it
    301 ms -> 83 ms. The caller must treat ``None`` as "use the RDD
    path" — conversion is attempted optimistically and ANY mismatch
    (unsafe type, nested Row structs, malformed rows) falls back."""
    from pyspark.sql import types as T

    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        if isinstance(schema, str):
            struct = T._parse_datatype_string(schema)
        elif isinstance(schema, T.StructType):
            struct = schema
        else:
            return None
        if not isinstance(struct, T.StructType) or not _arrow_safe_type(struct):
            return None
        names = struct.fieldNames()
        pylist = []
        for r in rows:
            if isinstance(r, dict):
                pylist.append(r)
            elif isinstance(r, (tuple, list)):
                # Row is a tuple subclass; nested Rows (struct cells
                # as tuples) make pa raise -> fallback
                pylist.append(dict(zip(names, r)))
            else:
                return None
        tbl = pa.Table.from_pylist(pylist, schema=to_arrow_schema(struct))
        return spark.createDataFrame(tbl, schema=struct)
    except Exception:
        return None


def lit_frame(spark: SparkSession, data, schema):
    """DataFrame over driver-held literal rows (model tables, probe
    rows, group-scalar rebuilds) with partitioning SIZED TO THE DATA.

    Plain ``createDataFrame(list)`` parallelizes any local list to
    ``defaultParallelism`` pickled-RDD slices, so a 4-row model frame
    scans as 32 Python-eval tasks on EVERY consuming job — measured
    0.32 s/job vs 0.16 s at one slice on 32 cores, and an EMPTY frame
    pays the same 0.3 s for zero rows. Model/probe frames are consumed
    by several jobs per query (drift gate, assignment scans, serve
    probes), so the tax multiplies.

    Round 14: model-sized frames (< 50k rows) additionally go through
    the Arrow **LocalRelation** path (``arrow_local_frame``) — zero
    Python-eval tasks per consuming job instead of one. Bigger driver
    rebuilds (the connected-components fast path) stay on pickled-RDD
    slices (one per 50k rows): a LocalRelation embeds every row in the
    plan, which is exactly wrong for bulk data."""
    rows = data if isinstance(data, list) else list(data)
    if len(rows) < 50_000:
        df = arrow_local_frame(spark, rows, schema)
        if df is not None:
            return df
    slices = max(1, -(-len(rows) // 50_000))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema)


def pin_width(spark: SparkSession) -> int | None:
    """Width for EXPLICIT repartitions that keep CPU-heavy, low-byte
    stages at session parallelism — AQE's size-based coalescing sees
    a few MB of sorted-adjacency/shingle arrays and folds the stage
    to a handful of tasks, idling the rest of the box (triangle_count
    measured 5.26 s -> 3.45 s at sf0.1 with the pin; the minhash
    verify stages are the same class). Returns ``None`` when pinning
    is disabled.

    Tunable via ``SPARK_GRAFT_WIDTH_PIN`` (``0`` disables the pins,
    ``N`` pins that width) so deployments can A/B it — the ADVICE r13
    ask. Distinct from SPARK_GRAFT_KERNEL_FANOUT because the two
    mechanisms bound different costs: fan-out's knee caps per-stage
    task overhead on RE-EXECUTED kernel subtrees, while pins apply to
    terminal CPU-bound stages that run once and want every core.
    """
    raw = os.environ.get("SPARK_GRAFT_WIDTH_PIN", "")
    if raw:
        try:
            v = int(raw.strip())
            if v < 0:
                raise ValueError(raw)
            return None if v == 0 else v
        except ValueError:
            _warn_once(f"pin:{raw}",
                       "ignoring malformed SPARK_GRAFT_WIDTH_PIN=%r "
                       "(expected an int >= 0); pinning to session "
                       "parallelism", raw)
    return spark.sparkContext.defaultParallelism
