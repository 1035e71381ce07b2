"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001.
``queries()`` exposes one callable per implemented operator
(SURVEY.md §2); ``oracle_sql()`` gives each one's ANSI-SQL twin for
the DuckDB oracle. Column names are aliased identically on both
sides; double sums go through decimal(38,10) on both sides so the
result is bit-deterministic regardless of partitioning/order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blackroad_data_pipeline_spark.operators import apply_operator as op

SF001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: TPC-H Q1-shaped filter → groupBy → multi-agg → sort
# (reference pipeline "filter_agg": main.py:180-203 → 226-249 → 265-268)
# --------------------------------------------------------------------------


def q_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    df = op("filter", li, {"field": "l_quantity", "op": "gt", "value": 10})
    df = op(
        "aggregate",
        df,
        {
            "group_by": ["l_returnflag", "l_linestatus"],
            "aggregates": [
                {"field": "l_extendedprice", "function": "sum", "alias": "sum_extprice"},
                {"field": "l_quantity", "function": "sum", "alias": "sum_qty"},
                {"field": "l_extendedprice", "function": "avg", "alias": "avg_extprice"},
                {"field": "l_extendedprice", "function": "min", "alias": "min_extprice"},
                {"field": "l_extendedprice", "function": "max", "alias": "max_extprice"},
                {"field": "l_extendedprice", "function": "count", "alias": "n_rows"},
            ],
        },
    )
    return op("sort", df, {"fields": ["l_returnflag", "l_linestatus"]})


_SQL_FILTER_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_extprice,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_extprice,
       MIN(l_extendedprice) AS min_extprice,
       MAX(l_extendedprice) AS max_extprice,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_quantity > 10
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# filter variants — reference main.py:180-203
# --------------------------------------------------------------------------


def q_filter_eq(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    df = op("filter", o, {"field": "o_orderstatus", "op": "eq", "value": "O"})
    return op("select", df, {"fields": ["o_orderkey", "o_custkey", "o_totalprice"]})


_SQL_FILTER_EQ = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
"""


def q_filter_contains(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    df = op("filter", p, {"field": "p_name", "op": "contains", "value": "red"})
    return op("select", df, {"fields": ["p_partkey", "p_name", "p_type"]})


_SQL_FILTER_CONTAINS = """
SELECT p_partkey, p_name, p_type FROM part WHERE CAST(p_name AS VARCHAR) LIKE '%red%'
"""


def q_filter_notnull(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    df = op("filter", c, {"field": "c_mktsegment", "op": "notnull"})
    df = op("filter", df, {"field": "c_acctbal", "op": "lt", "value": 0.0})
    return op("select", df, {"fields": ["c_custkey", "c_acctbal", "c_mktsegment"]})


_SQL_FILTER_NOTNULL = """
SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
WHERE c_mktsegment IS NOT NULL AND c_mktsegment <> '' AND c_acctbal < 0.0
"""


# --------------------------------------------------------------------------
# map — reference main.py:205-224
# --------------------------------------------------------------------------


def q_map(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    df = op("map", c, {"field": "c_mktsegment", "operation": "upper", "as": "seg_upper"})
    df = op("map", df, {"field": "c_name", "operation": "lower", "as": "name_lower"})
    df = op("map", df, {"field": "c_acctbal", "operation": "int", "as": "bal_int"})
    return op("select", df, {"fields": ["c_custkey", "seg_upper", "name_lower", "bal_int"]})


_SQL_MAP = """
SELECT c_custkey,
       UPPER(c_mktsegment) AS seg_upper,
       LOWER(c_name) AS name_lower,
       CAST(TRUNC(TRY_CAST(c_acctbal AS DOUBLE)) AS BIGINT) AS bal_int
FROM customer
"""


# --------------------------------------------------------------------------
# aggregate single-fn parity — reference main.py:226-249 (output name {field}_{fn})
# --------------------------------------------------------------------------


def q_aggregate_count(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return op("aggregate", li, {"group_by": ["l_returnflag"], "field": "l_quantity",
                                "function": "count"})


_SQL_AGGREGATE_COUNT = """
SELECT l_returnflag, COUNT(*) AS l_quantity_count FROM lineitem GROUP BY l_returnflag
"""


def q_aggregate_global(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return op(
        "aggregate",
        li,
        {"group_by": [], "aggregates": [
            {"field": "l_extendedprice", "function": "sum", "alias": "total_extprice"},
            {"field": "l_orderkey", "function": "count_distinct", "alias": "n_orders"},
            {"field": "l_quantity", "function": "avg", "alias": "avg_qty"},
        ]},
    )


_SQL_AGGREGATE_GLOBAL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_extprice,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
FROM lineitem
"""


# --------------------------------------------------------------------------
# join — reference main.py:251-263 (r_-prefixed right columns)
# --------------------------------------------------------------------------


def q_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    df = op("filter", o, {"field": "o_orderstatus", "op": "eq", "value": "O"})
    df = op("join", df, {"right": c, "left_key": "o_custkey", "right_key": "c_custkey",
                         "broadcast": True}, views={})
    return op("select", df, {"fields": ["o_orderkey", "o_totalprice", "r_c_name",
                                        "r_c_mktsegment"]})


_SQL_JOIN = """
SELECT o_orderkey, o_totalprice, c_name AS r_c_name, c_mktsegment AS r_c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'O'
"""


def q_join_multi(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    df = op("join", li, {"right": o, "left_key": "l_orderkey", "right_key": "o_orderkey",
                         "prefix": ""}, views={})
    df = op("join", df, {"right": c, "left_key": "o_custkey", "right_key": "c_custkey",
                         "prefix": "", "broadcast": True}, views={})
    df = op("aggregate", df, {"group_by": ["c_mktsegment"], "aggregates": [
        {"field": "l_extendedprice", "function": "sum", "alias": "revenue"},
        {"field": "l_orderkey", "function": "count", "alias": "n_items"},
    ]})
    return op("sort", df, {"fields": ["c_mktsegment"]})


_SQL_JOIN_MULTI = """
SELECT c_mktsegment,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# sort + limit (top-k) — reference main.py:265-268 (sort only; limit absent)
# --------------------------------------------------------------------------


def q_sort_limit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    df = op("sort", o, {"fields": ["o_totalprice", "o_orderkey"], "descending": True})
    df = op("limit", df, {"n": 100})
    return op("select", df, {"fields": ["o_orderkey", "o_totalprice"]})


_SQL_SORT_LIMIT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 100
"""


# --------------------------------------------------------------------------
# deduplicate — reference main.py:270-279 (keep-first, made deterministic)
# --------------------------------------------------------------------------


def q_dedup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    df = op("deduplicate", li, {"keys": ["l_orderkey"], "keep": "first",
                                "order_by": ["l_linenumber", "l_partkey", "l_suppkey"]})
    return op("select", df, {"fields": ["l_orderkey", "l_linenumber", "l_partkey",
                                        "l_quantity"]})


_SQL_DEDUP = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
"""


# --------------------------------------------------------------------------
# rename / union — reference main.py:285-291, main.py:437-442
# --------------------------------------------------------------------------


def q_rename_union(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    n2 = op("rename", n, {"mapping": {"n_nationkey": "key", "n_name": "name"}})
    n2 = op("select", n2, {"fields": ["key", "name"]})
    r2 = op("rename", r, {"mapping": {"r_regionkey": "key", "r_name": "name"}})
    r2 = op("select", r2, {"fields": ["key", "name"]})
    return op("union", n2, {"others": [r2]}, views={})


_SQL_RENAME_UNION = """
SELECT n_nationkey AS key, n_name AS name FROM nation
UNION ALL
SELECT r_regionkey AS key, r_name AS name FROM region
"""


# --------------------------------------------------------------------------
# window / top-k per group — absent from reference (SURVEY.md §2.5)
# --------------------------------------------------------------------------


def q_topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    df = op("topk_per_group", o, {"partition_by": ["o_orderpriority"],
                                  "order_by": ["o_totalprice", "o_orderkey"],
                                  "descending": True, "k": 5})
    return op("select", df, {"fields": ["o_orderpriority", "o_orderkey", "o_totalprice"]})


_SQL_TOPK_PER_GROUP = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey DESC) <= 5
"""


def q_window_rank(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    df = op("window", c, {"function": "rank", "partition_by": ["c_nationkey"],
                          "order_by": ["c_acctbal", "c_custkey"], "descending": True,
                          "alias": "bal_rank"})
    df = op("filter", df, {"field": "bal_rank", "op": "le", "value": 3})
    return op("select", df, {"fields": ["c_nationkey", "c_custkey", "c_acctbal",
                                        "bal_rank"]})


_SQL_WINDOW_RANK = """
SELECT c_nationkey, c_custkey, c_acctbal,
       RANK() OVER (PARTITION BY c_nationkey
                    ORDER BY c_acctbal DESC, c_custkey DESC) AS bal_rank
FROM customer
QUALIFY bal_rank <= 3
"""


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_filter_agg(spark, SF001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "filter_agg": q_filter_agg,
        "filter_eq": q_filter_eq,
        "filter_contains": q_filter_contains,
        "filter_notnull": q_filter_notnull,
        "map_ops": q_map,
        "aggregate_count": q_aggregate_count,
        "aggregate_global": q_aggregate_global,
        "join": q_join,
        "join_multi": q_join_multi,
        "sort_limit": q_sort_limit,
        "dedup": q_dedup,
        "rename_union": q_rename_union,
        "topk_per_group": q_topk_per_group,
        "window_rank": q_window_rank,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "filter_agg": _SQL_FILTER_AGG,
        "filter_eq": _SQL_FILTER_EQ,
        "filter_contains": _SQL_FILTER_CONTAINS,
        "filter_notnull": _SQL_FILTER_NOTNULL,
        "map_ops": _SQL_MAP,
        "aggregate_count": _SQL_AGGREGATE_COUNT,
        "aggregate_global": _SQL_AGGREGATE_GLOBAL,
        "join": _SQL_JOIN,
        "join_multi": _SQL_JOIN_MULTI,
        "sort_limit": _SQL_SORT_LIMIT,
        "dedup": _SQL_DEDUP,
        "rename_union": _SQL_RENAME_UNION,
        "topk_per_group": _SQL_TOPK_PER_GROUP,
        "window_rank": _SQL_WINDOW_RANK,
    }
