"""Operator registry.

Every transform is a pure function over a lazy DataFrame::

    op(df: DataFrame, config: dict, views: dict[str, DataFrame]) -> DataFrame

``views`` maps source names to their DataFrames — the lazy analogue of
the reference's ``source_data`` context (reference main.py:438-447),
used by ``join`` to find its right side. Because operators only build
plan nodes, the whole pipeline stays a single Catalyst logical plan:
filters push down to the scan, projections prune columns, and the
optimizer reorders freely — none of which the reference's eager
``list[dict]`` fold could do (reference main.py:446-447).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame

Operator = Callable[[DataFrame, Mapping, Mapping[str, DataFrame]], DataFrame]

OPERATORS: dict[str, Operator] = {}


def register(name: str) -> Callable[[Operator], Operator]:
    def deco(fn: Operator) -> Operator:
        if name in OPERATORS:
            raise ValueError(f"operator {name!r} already registered")
        OPERATORS[name] = fn
        return fn

    return deco


def apply_operator(
    name: str,
    df: DataFrame,
    config: Mapping | None = None,
    views: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    try:
        op = OPERATORS[name]
    except KeyError:
        raise ValueError(
            f"unknown transform type: {name!r} (known: {sorted(OPERATORS)})"
        ) from None
    return op(df, config or {}, views or {})
