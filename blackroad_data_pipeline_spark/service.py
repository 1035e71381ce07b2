"""PipelineService — the reference's service surface on a lazy DAG.

Same five entities and lifecycle as the reference (create_pipeline /
add_source / add_transform / add_sink / run_pipeline / validate_schema
/ list_*, reference main.py:369-510), with the execution model
replaced: instead of eagerly folding ``list[dict]`` through each
transform (main.py:437-447), run_pipeline builds ONE Catalyst logical
plan — sources become lazy scans registered as named views, transforms
chain DataFrame ops in order_index order, and nothing executes until a
sink triggers an action.

Differences by design (SURVEY.md §7.4.5): only *root* sources are
unioned into the transform chain; non-root sources (join dimensions)
are views. The reference unions every source into the stream, which
makes a join's right side self-join against itself — a bug, not a
behavior worth porting.
"""

from __future__ import annotations

import time
from functools import reduce

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .operators import apply_operator
from .sinks import write_sink
from .sources import read_source


def _dependency_order(transforms):
    """Execution order honoring ``depends_on``: a stable topological
    sort (Kahn; ready set ordered by the original order_index/rowid
    position, so pipelines without dependencies keep the reference's
    strictly linear order). The reference STORES depends_on but never
    reads it (main.py:59,146-149 — its README's "dependency graph
    execution" is aspirational and a bogus id runs fine, verified);
    here it is real, and validated: an unknown depends_on id or a
    dependency cycle raises instead of silently running in the wrong
    order."""
    if not any(t.depends_on for t in transforms):
        return transforms
    by_id = {t.id: t for t in transforms}
    for t in transforms:
        if t.depends_on and t.depends_on not in by_id:
            raise ValueError(
                f"transform {t.id} ({t.transform_type}) depends_on "
                f"unknown transform id {t.depends_on!r}")
    pos = {t.id: i for i, t in enumerate(transforms)}
    remaining = list(transforms)
    done: set[str] = set()
    ordered = []
    while remaining:
        ready = [t for t in remaining
                 if not t.depends_on or t.depends_on in done]
        if not ready:
            cyc = ", ".join(f"{t.transform_type}({t.id[:8]})"
                            for t in remaining)
            raise ValueError(f"dependency cycle among transforms: {cyc}")
        nxt = min(ready, key=lambda t: pos[t.id])
        remaining.remove(nxt)
        done.add(nxt.id)
        ordered.append(nxt)
    return ordered


class PipelineService:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.catalog = Catalog()

    # -- builder surface (parity: reference main.py:371-413) ----------------

    def create_pipeline(self, name: str, description: str = ""):
        return self.catalog.create_pipeline(name, description)

    def add_source(self, pipeline_id: str, name: str, source_type: str,
                   config: dict | None = None, root: bool = True):
        return self.catalog.add_source(pipeline_id, name, source_type, config, root)

    def add_transform(self, pipeline_id: str, transform_type: str,
                      config: dict | None = None, order_index: int = 0,
                      depends_on: str | None = None):
        return self.catalog.add_transform(pipeline_id, transform_type, config,
                                          order_index, depends_on)

    def add_sink(self, pipeline_id: str, sink_type: str,
                 config: dict | None = None):
        return self.catalog.add_sink(pipeline_id, sink_type, config)

    def list_pipelines(self):
        return self.catalog.list_pipelines()

    def list_runs(self, pipeline_id: str | None = None):
        return self.catalog.list_runs(pipeline_id)

    # -- plan construction ---------------------------------------------------

    def build_dataframe(self, pipeline_id: str) -> DataFrame:
        """Build the pipeline's logical plan without executing it —
        the analogue of the reference's load-plan stage
        (main.py:427-434), exposed so callers can .explain() it."""
        df, _ = self._build(pipeline_id, observe_input=False)
        return df

    def _build(self, pipeline_id: str, observe_input: bool) -> tuple[DataFrame, Observation | None]:
        sources, transforms, _ = self.catalog.components(pipeline_id)
        if not sources:
            raise ValueError(f"pipeline {pipeline_id} has no sources")

        views: dict[str, DataFrame] = {}
        roots: list[DataFrame] = []
        for s in sources:
            sdf = read_source(self.spark, s.source_type, s.config)
            # no createOrReplaceTempView here: session-global views would
            # leak across pipelines sharing a SparkSession and let same-
            # named sources clobber each other. SQL access goes through
            # the `views` dict — op_sql registers (and drops) its own
            # scoped views per query.
            views[s.name] = sdf
            if s.root:
                roots.append(sdf)
        if not roots:
            raise ValueError(f"pipeline {pipeline_id} has no root sources")

        df = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), roots)

        obs = None
        if observe_input:
            # rows_read bookkeeping without a second pass over the input:
            # an Observation rides along with whatever action the sinks run
            obs = Observation("rows_read")
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))

        for t in _dependency_order(transforms):
            df = apply_operator(t.transform_type, df, t.config, views)
        return df, obs

    # -- execution (parity: reference main.py:415-474) -----------------------

    def run_pipeline(self, pipeline_id: str) -> dict:
        run_id = self.catalog.start_run(pipeline_id)
        t0 = time.perf_counter()
        try:
            df, obs = self._build(pipeline_id, observe_input=True)
            _, _, sinks = self.catalog.components(pipeline_id)
            if not sinks:
                raise ValueError(f"pipeline {pipeline_id} has no sinks")

            if len(sinks) > 1:
                df = df.cache()  # pay the compute once across sinks
            rows_written = 0
            try:
                for sink in sinks:
                    rows_written += write_sink(df, sink.sink_type, sink.config)
            finally:
                if len(sinks) > 1:
                    df.unpersist()

            rows_read = int(obs.get["n"]) if obs is not None else 0
            duration_ms = int((time.perf_counter() - t0) * 1000)
            self.catalog.finish_run(run_id, "success", rows_read, rows_written,
                                    stats={"duration_ms": duration_ms})
            return {"run_id": run_id, "status": "success",
                    "rows_read": rows_read, "rows_written": rows_written,
                    "duration_ms": duration_ms}
        except Exception as e:  # noqa: BLE001 — parity: record any failure (main.py:467-474)
            self.catalog.finish_run(run_id, "failed", error=str(e))
            return {"run_id": run_id, "status": "failed", "error": str(e)}

    # -- validation (parity: reference main.py:476-497) -----------------------

    def validate_schema(self, source_id: str) -> dict:
        s = self.catalog.get_source(source_id)
        if s is None:
            raise ValueError(f"unknown source: {source_id}")
        df = read_source(self.spark, s.source_type, s.config)
        n = df.count()
        if n == 0:
            return {"valid": True, "rows": 0, "schema": {}, "warning": "Empty dataset"}
        schema = {f.name: [f.dataType.simpleString()] for f in df.schema.fields}
        return {"valid": True, "rows": n, "schema": schema}
