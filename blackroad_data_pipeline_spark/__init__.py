"""blackroad_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
BlackRoad-Labs/blackroad-data-pipeline (a single-file, eager,
list-of-dicts Python ETL framework — see SURVEY.md) as an idiomatic
Apache Spark engine:

- the data plane is lazy ``DataFrame`` DAGs optimized by Catalyst
  (the reference materializes every stage as ``list[dict]``,
  reference main.py:437-447);
- operators are pure functions ``(df, config, views) -> df`` in a
  registry (replacing the reference's if/elif dispatch,
  reference main.py:161-178);
- the control plane (pipelines/sources/transforms/sinks/runs
  catalog, reference main.py:34-79) is kept as SQLite for parity —
  it is driver-side metadata, never on the data path;
- LLM-scale extension operators (dedup, similarity search, text
  analysis, multimodal plumbing) live in :mod:`.llmops`.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
