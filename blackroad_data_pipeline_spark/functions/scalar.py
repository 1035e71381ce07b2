"""Scalar function library.

The reference's entire scalar surface is six ``map`` operations
(str/int/float/upper/lower/strip, reference main.py:208-213) and no
expression language at all — configs are field+constant. Here the
``map`` operator resolves through this registry (date, math, string,
hash, JSON, array functions), and the ``expr`` operator exposes the
full Spark SQL expression language. Everything is a built-in Catalyst
expression — JVM-side, codegen-fused, never Python.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# name -> unary Column function; the `map` operator's extended surface
SCALAR_FUNCTIONS: dict[str, Callable[[Column], Column]] = {
    # dates
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "dayofweek": F.dayofweek,
    "hour": F.hour,
    "date_trunc_month": lambda c: F.date_trunc("month", c),
    "date_trunc_day": lambda c: F.date_trunc("day", c),
    "unix_seconds": lambda c: c.cast("long"),
    # math (exact ops only — transcendental fns live behind `expr`
    # where the caller owns cross-engine ULP tolerance)
    "floor": lambda c: F.floor(c),
    "ceil": lambda c: F.ceil(c),
    "sqrt": F.sqrt,
    "sign": F.signum,
    # strings
    "length": F.length,
    "reverse": F.reverse,
    "initcap": F.initcap,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    # hashing / fingerprints
    "md5": lambda c: F.md5(c.cast("string").cast("binary")),
    "sha256": lambda c: F.sha2(c.cast("string").cast("binary"), 256),
    "crc32": lambda c: F.crc32(c.cast("string").cast("binary")),
    "xxhash64": lambda c: F.xxhash64(c),
    # arrays
    "array_size": F.size,
    "array_distinct": F.array_distinct,
    "array_sort": F.sort_array,
    # null handling
    "is_null": lambda c: c.isNull(),
    "nullif_empty": lambda c: F.when(c.cast("string") != "", c),
}


def resolve(name: str) -> Callable[[Column], Column]:
    try:
        return SCALAR_FUNCTIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown scalar function: {name!r} (known: {sorted(SCALAR_FUNCTIONS)})"
        ) from None
