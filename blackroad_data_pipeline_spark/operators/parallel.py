"""Adaptive kernel-input parallelism (round-13 optimization).

Arrow/pandas kernels and per-row-expensive projections inherit the
upstream partitioning. A scan of one unsplittable file — or of a few
files with single large row groups, which is exactly what the local
fixtures are — yields fewer tasks than the session has cores, so a
per-doc Python kernel runs nearly serially no matter how wide the
cluster is (the "input skew: one huge unsplittable file" case of the
optimization playbook §2.5; the fix there is "repartition immediately
after the read").

``fan_out(df)`` widens such inputs to the session's default
parallelism with ONE round-robin repartition placed BEFORE the kernel:
the exchange moves the raw input rows once (cheap relative to the
kernel by construction — fan_out is only applied where the per-row
work dominates), and the exchange doubles as the projection barrier
that keeps Catalyst from collapsing the kernel into the scan stage.
When the input already has at least ``defaultParallelism`` partitions
— any real at-scale table — it is a NO-OP: no extra exchange is ever
added at 100 TB, so the production plan shape is unchanged.

Scale-adaptivity, not local tuning: the target derives from the live
session (``sparkContext.defaultParallelism``), so the driver's
lower-core bench runs fan out to *their* width and the per-core
scaling measurement stays honest — but it is CAPPED at 8 by default.
Measured width sweep (sf0.1, min-of-N bench): the standalone kernel
queries plateau by width 8 (winnow 4.87 s un-fanned -> 1.25 s at 8
-> 1.51 s at 32), while composed ingest chains whose band/signature
subtrees re-execute per day DEGRADE with width (incremental ingest
probe: 6.5 s un-fanned, 7.2 s at 8, 9.7 s at 32) because every extra
task multiplies per-stage scheduling/Arrow overhead across dozens of
stages. A bounded default keeps the single-pass win and caps the
composed-pipeline tax; ``SPARK_GRAFT_KERNEL_FANOUT`` overrides the
width absolutely for deployments whose starved inputs are big enough
to deserve more (``0`` disables fan-out entirely).

Only partition-INVARIANT kernels may be fanned out (every call site
is a per-row/per-doc deterministic function); order-sensitive kernels
(per-partition sketch candidate generation) must not use this helper.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# see module docstring: measured plateau/degradation knee at sf0.1
_DEFAULT_MAX_WIDTH = 8


def fan_out(df: DataFrame, max_width: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin to the session default
    parallelism iff it currently has fewer partitions — a no-op on
    any input that already carries enough tasks. Streaming inputs are
    returned unchanged (their micro-batch partitioning is owned by the
    source)."""
    knob = os.environ.get("SPARK_GRAFT_KERNEL_FANOUT", "")
    if knob == "0":
        return df
    if df.isStreaming:
        return df
    target = min(df.sparkSession.sparkContext.defaultParallelism,
                 _DEFAULT_MAX_WIDTH)
    if knob:
        target = int(knob)
    if max_width:
        target = min(target, max_width)
    if target <= 1:
        return df
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        # plans the RDD conversion cannot express (should not happen
        # for batch inputs) — never let the widening break the query
        return df
    if n >= target:
        return df
    return df.repartition(target)
