"""Per-operator unit tests on tiny inline DataFrames.

Mirrors the reference's unit-test shape (test_data_pipeline.py:14-50)
but asserts collected row values, not just counts — and covers the
operators the reference left untested (join, select, rename, the
filter op family, sinks are covered in test_service.py).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from blackroad_data_pipeline_spark.operators import apply_operator as op


def rows(df, *cols):
    out = df if not cols else df.select(*cols)
    return [tuple(r) for r in out.collect()]


# -- filter ----------------------------------------------------------------


def test_filter_eq(employees):
    got = rows(op("filter", employees, {"field": "dept", "op": "eq", "value": "eng"}), "name")
    assert sorted(got) == [("Alice",), ("Bob",)]


def test_filter_numeric_coercion(employees):
    # int literal vs string column: coerce column to the literal's type
    # (reference type(value)(v) rule, main.py:188)
    got = rows(op("filter", employees, {"field": "age", "op": "gt", "value": 28}), "name")
    assert sorted(got) == [("Alice",), ("Carol",)]


def test_filter_string_comparison_is_lexicographic(employees):
    # string literal "28" → lexicographic: "25" < "28" < "30" < "35"
    got = rows(op("filter", employees, {"field": "age", "op": "gt", "value": "28"}), "name")
    assert sorted(got) == [("Alice",), ("Carol",)]


def test_filter_ne_lt_contains(employees):
    assert len(rows(op("filter", employees, {"field": "dept", "op": "ne", "value": "eng"}))) == 1
    assert len(rows(op("filter", employees, {"field": "age", "op": "lt", "value": 30}))) == 1
    got = rows(op("filter", employees, {"field": "name", "op": "contains", "value": "li"}), "name")
    assert got == [("Alice",)]


def test_filter_notnull_excludes_empty_string(spark):
    df = spark.createDataFrame([("a",), ("",), (None,)], ["v"])
    got = rows(op("filter", df, {"field": "v", "op": "notnull"}))
    assert got == [("a",)]


def test_filter_in_between(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    assert len(rows(op("filter", df, {"field": "v", "op": "in", "value": [1, 5]}))) == 2
    assert len(rows(op("filter", df, {"field": "v", "op": "between", "value": [3, 6]}))) == 4


def test_filter_unknown_op_raises(employees):
    with pytest.raises(ValueError, match="unknown filter op"):
        op("filter", employees, {"field": "age", "op": "zz", "value": 1})


# -- map -------------------------------------------------------------------


def test_map_upper_lower_strip(spark):
    df = spark.createDataFrame([("  Ab ",)], ["v"])
    assert rows(op("map", df, {"field": "v", "operation": "upper"}))[0] == ("  AB ",)
    assert rows(op("map", df, {"field": "v", "operation": "lower"}))[0] == ("  ab ",)
    assert rows(op("map", df, {"field": "v", "operation": "strip"}))[0] == ("Ab",)


def test_map_int_cast_failure_is_null(spark):
    # decided divergence (SURVEY.md §7.4.1): reference keeps "abc"; we NULL
    df = spark.createDataFrame([("30",), ("abc",), ("-10.7",)], ["v"])
    got = rows(op("map", df, {"field": "v", "operation": "int"}))
    assert got == [(30,), (None,), (-10,)]


def test_map_float_and_target_column(employees):
    got = rows(op("map", employees, {"field": "age", "operation": "float", "as": "age_f"}),
               "name", "age_f")
    assert ("Alice", 30.0) in got


def test_map_unknown_operation_raises(employees):
    with pytest.raises(ValueError, match="unknown scalar function"):
        op("map", employees, {"field": "age", "operation": "zz"})


# -- aggregate ---------------------------------------------------------------


def test_aggregate_count_groupby(employees):
    got = rows(op("aggregate", employees, {"group_by": ["dept"], "field": "age",
                                           "function": "count"}))
    assert sorted(got) == [("eng", 2), ("pm", 1)]


def test_aggregate_count_includes_nulls(spark):
    # reference counts rows, not non-null values (len(rows), main.py:239)
    df = spark.createDataFrame([("a", 1), ("a", None), ("b", 2)], ["k", "v"])
    got = rows(op("aggregate", df, {"group_by": ["k"], "field": "v", "function": "count"}))
    assert sorted(got) == [("a", 2), ("b", 1)]


def test_aggregate_sum_avg_min_max(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], ["k", "v"])
    got = rows(op("aggregate", df, {"group_by": ["k"], "aggregates": [
        {"field": "v", "function": "sum"},
        {"field": "v", "function": "avg"},
        {"field": "v", "function": "min"},
        {"field": "v", "function": "max"},
    ]}))
    assert sorted(got) == [("a", 3.0, 1.5, 1.0, 2.0), ("b", 5.0, 5.0, 5.0, 5.0)]
    # output naming parity: {field}_{fn} (reference main.py:239-247)
    df2 = op("aggregate", df, {"group_by": ["k"], "field": "v", "function": "sum"})
    assert df2.columns == ["k", "v_sum"]


def test_aggregate_global(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["v"])
    got = rows(op("aggregate", df, {"group_by": [], "field": "v", "function": "sum"}))
    assert got == [(6.0,)]


def test_aggregate_all_null_group_is_null(spark):
    # decided divergence (SURVEY.md §7.4.3): SQL NULL, not ragged omission
    df = spark.createDataFrame([("a", None), ("a", None)], "k string, v double")
    got = rows(op("aggregate", df, {"group_by": ["k"], "field": "v", "function": "sum"}))
    assert got == [("a", None)]


# -- join --------------------------------------------------------------------


def test_join_inner_prefix(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["id", "l"])
    right = spark.createDataFrame([(1, "A"), (2, "B")], ["id", "r"])
    df = op("join", left, {"right": right, "left_key": "id", "right_key": "id"})
    assert df.columns == ["id", "l", "r_id", "r_r"]
    assert sorted(rows(df, "l", "r_r")) == [("x", "A"), ("y", "B")]


def test_join_one_to_n_default(spark):
    left = spark.createDataFrame([(1, "x")], ["id", "l"])
    right = spark.createDataFrame([(1, "A"), (1, "B")], ["id", "r"])
    df = op("join", left, {"right": right})
    assert df.count() == 2


def test_join_dedupe_right_last_wins(spark):
    # reference 1:1 semantics: right collapsed to dict, last dup wins (main.py:256)
    left = spark.createDataFrame([(1, "x")], ["id", "l"])
    right = spark.createDataFrame([(1, "A", 1), (1, "B", 2)], ["id", "r", "seq"])
    df = op("join", left, {"right": right, "dedupe_right": "last",
                           "right_order_by": ["seq"]})
    assert rows(df, "r_r") == [("B",)]


def test_join_left_and_anti(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    right = spark.createDataFrame([(1,)], ["id"])
    assert op("join", left, {"right": right, "how": "left"}).count() == 3
    got = rows(op("join", left, {"right": right, "how": "left_anti", "prefix": ""}))
    assert sorted(got) == [(2,), (3,)]


def test_join_by_view_name(spark):
    left = spark.createDataFrame([(1, "x")], ["id", "l"])
    right = spark.createDataFrame([(1, "A")], ["id", "r"])
    df = op("join", left, {"right": "dim"}, views={"dim": right})
    assert df.count() == 1


# -- sort / limit / dedup ------------------------------------------------------


def test_sort_string_order(employees):
    # reference asserts "25" sorts first — string ordering (test_data_pipeline.py:41-44)
    got = rows(op("sort", employees, {"field": "age"}), "age")
    assert got == [("25",), ("30",), ("35",)]


def test_sort_descending_multi(spark):
    df = spark.createDataFrame([(1, 2), (1, 1), (2, 9)], ["a", "b"])
    got = rows(op("sort", df, {"fields": ["a", "b"], "descending": True}))
    assert got == [(2, 9), (1, 2), (1, 1)]


def test_limit(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    assert op("limit", df, {"n": 3}).count() == 3


def test_dedup_any(employees):
    df = op("deduplicate", employees, {"keys": ["dept"]})
    assert df.count() == 2


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 2, "x"), ("a", 1, "y"), ("b", 5, "z")], ["k", "seq", "v"])
    got = rows(op("deduplicate", df, {"keys": ["k"], "keep": "first",
                                      "order_by": ["seq"]}), "k", "v")
    assert sorted(got) == [("a", "y"), ("b", "z")]
    got = rows(op("deduplicate", df, {"keys": ["k"], "keep": "last",
                                      "order_by": ["seq"]}), "k", "v")
    assert sorted(got) == [("a", "x"), ("b", "z")]


def test_dedup_default_keys_all_columns(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (1, "b")], ["x", "y"])
    assert op("deduplicate", df, {}).count() == 2


# -- select / rename / union ---------------------------------------------------


def test_select_drops_missing_silently(employees):
    # reference drops fields a row lacks (main.py:283)
    df = op("select", employees, {"fields": ["name", "nope"]})
    assert df.columns == ["name"]


def test_rename(employees):
    df = op("rename", employees, {"mapping": {"name": "who", "nope": "x"}})
    assert df.columns == ["who", "age", "dept"]


def test_union_by_name_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "a_only"])
    b = spark.createDataFrame([(2, "y")], ["id", "b_only"])
    df = op("union", a, {"others": [b]})
    assert sorted(df.columns) == ["a_only", "b_only", "id"]
    got = {r["id"]: (r["a_only"], r["b_only"]) for r in df.collect()}
    assert got == {1: ("x", None), 2: (None, "y")}


# -- window / topk ---------------------------------------------------------


def test_window_row_number_and_running_sum(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 3.0)], ["k", "v"])
    out = op("window", df, {"function": "row_number", "partition_by": ["k"],
                            "order_by": ["v"], "alias": "rn"})
    assert sorted(rows(out, "k", "v", "rn")) == [("a", 1.0, 1), ("a", 2.0, 2), ("b", 3.0, 1)]
    run = op("window", df, {"function": "sum", "field": "v", "partition_by": ["k"],
                            "order_by": ["v"], "frame": "running", "alias": "rs"})
    assert sorted(rows(run, "k", "rs")) == [("a", 1.0), ("a", 3.0), ("b", 3.0)]


def test_window_global_frame_guarded(spark):
    """Empty partition_by + a frame plans a single-partition WindowExec
    (all rows to ONE task) — the scale-killer must be opt-in."""
    import pytest

    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["k", "v"])
    with pytest.raises(ValueError, match="one partition"):
        op("window", df, {"function": "sum", "field": "v",
                          "order_by": ["v"], "frame": "running"})
    out = op("window", df, {"function": "sum", "field": "v",
                            "order_by": ["v"], "frame": "running",
                            "allow_global": True, "alias": "rs"})
    assert sorted(rows(out, "k", "rs")) == [("a", 1.0), ("b", 3.0)]
    # frameless ordered global windows are the same single-partition
    # shape — guarded too, opt-in via allow_global
    with pytest.raises(ValueError, match="one partition"):
        op("window", df, {"function": "row_number", "order_by": ["v"],
                          "alias": "rn"})
    rn = op("window", df, {"function": "row_number", "order_by": ["v"],
                           "allow_global": True, "alias": "rn"})
    assert sorted(rows(rn, "k", "rn")) == [("a", 1), ("b", 2)]


def test_topk_per_group(spark):
    df = spark.createDataFrame([("a", i) for i in range(5)] + [("b", 9)], ["k", "v"])
    got = rows(op("topk_per_group", df, {"partition_by": ["k"], "order_by": ["v"],
                                         "k": 2}), "k", "v")
    assert sorted(got) == [("a", 3), ("a", 4), ("b", 9)]


def test_unknown_operator_raises(employees):
    with pytest.raises(ValueError, match="unknown transform type"):
        op("nope", employees, {})


# -- sampling / splits --------------------------------------------------------


def test_sample_seeded_deterministic(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in op("sample", df, {"fraction": 0.2, "seed": 7}).collect())
    b = sorted(r["k"] for r in op("sample", df, {"fraction": 0.2, "seed": 7}).collect())
    assert a == b
    assert 200 < len(a) < 600  # loose Bernoulli bounds


def test_stratified_sample(spark):
    rows = [("en", i) for i in range(900)] + [("fr", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["lang", "i"])
    out = op("sample", df, {"by": "lang", "fractions": {"en": 0.1, "fr": 1.0},
                            "seed": 1})
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts["fr"] == 100          # kept whole
    assert 40 < counts["en"] < 200      # ~10%


def test_split_assign_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    cfg = {"on": ["k"], "splits": {"train": 0.8, "val": 0.1, "test": 0.1}}
    a = {r["k"]: r["split"] for r in op("split_assign", df, cfg).collect()}
    b = {r["k"]: r["split"]
         for r in op("split_assign", df.repartition(13), cfg).collect()}
    assert a == b  # membership survives repartitioning (randomSplit's doesn't)
    from collections import Counter

    c = Counter(a.values())
    assert 3700 < c["train"] < 4300 and 300 < c["val"] < 700 and 300 < c["test"] < 700
    assert set(c) == {"train", "val", "test"}


def test_split_assign_appends_stable(spark):
    """New data doesn't move old rows between splits — the property
    randomSplit lacks and incremental corpus builds need."""
    small = spark.range(0, 1000).withColumnRenamed("id", "k")
    big = spark.range(0, 3000).withColumnRenamed("id", "k")
    cfg = {"on": ["k"], "splits": {"train": 0.9, "test": 0.1}}
    a = {r["k"]: r["split"] for r in op("split_assign", small, cfg).collect()}
    b = {r["k"]: r["split"] for r in op("split_assign", big, cfg).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_shuffle_rows_reproducible_order(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    cfg = {"on": ["k"], "salt": "epoch0", "as": "skey"}
    rows = op("shuffle_rows", df, cfg).collect()
    # the realized row order IS the key order
    keys = [r["skey"] for r in rows]
    assert keys == sorted(keys)
    # the permutation actually shuffles and is repartition-invariant
    order_a = [r["k"] for r in rows]
    assert order_a != sorted(order_a)
    order_b = [r["k"] for r in
               op("shuffle_rows", df.repartition(13), cfg).collect()]
    assert order_a == order_b
    # a different epoch salt yields a different permutation
    order_c = [r["k"] for r in
               op("shuffle_rows", df, {"on": ["k"], "salt": "epoch1"}).collect()]
    assert order_c != order_a


def test_mix_corpus_rates_and_stability(spark):
    import pyspark.sql.functions as F

    df = (spark.range(0, 3000).withColumnRenamed("id", "k")
          .withColumn("grp", F.when(F.col("k") % 3 == 0, "web")
                      .when(F.col("k") % 3 == 1, "code")
                      .otherwise("books")))
    cfg = {"by": "grp", "on": ["k"],
           "rates": {"web": 0.3, "code": 1.0}, "default_rate": 0.0}
    out = op("mix_corpus", df, cfg)
    counts = {r["grp"]: r["count"]
              for r in out.groupBy("grp").count().collect()}
    assert counts["code"] == 1000            # rate 1.0 keeps everything
    assert "books" not in counts             # default_rate 0.0 drops stratum
    assert 200 < counts["web"] < 400         # ~30%
    # keep set is partition-invariant and append-stable
    a = {r["k"] for r in out.select("k").collect()}
    b = {r["k"] for r in
         op("mix_corpus", df.repartition(13), cfg).select("k").collect()}
    assert a == b
    small = {r["k"] for r in
             op("mix_corpus", df.filter("k < 1000"), cfg).select("k").collect()}
    assert small == {k for k in a if k < 1000}


def test_mix_corpus_rejects_bad_rate(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="keep rate"):
        op("mix_corpus", df, {"by": "k", "on": ["k"], "rates": {"0": 1.5}})


def test_group_scalar_collects_fail_loud_on_high_cardinality(spark):
    """The collect-and-rebroadcast group scalars (mad_outlier medians,
    mix_corpus temperature counts) must raise a NAMED error when the
    group cardinality exceeds max_groups — not OOM the driver."""
    from blackroad_data_pipeline_spark.operators.relational import (
        GroupCardinalityError)

    df = (spark.range(0, 200)
          .withColumn("g", F.col("id") % 100)
          .withColumn("x", F.col("id").cast("double")))
    with pytest.raises(GroupCardinalityError, match="mad_outlier.*50"):
        op("mad_outlier", df,
           {"field": "x", "by": ["g"], "max_groups": 50})
    with pytest.raises(GroupCardinalityError, match="mix_corpus.*50"):
        op("mix_corpus", df,
           {"by": "g", "on": ["id"], "temperature": 0.5, "max_groups": 50})
    # at-the-cap cardinality still works (the +1 probe row is the
    # only overflow signal)
    ok = op("mad_outlier", df,
            {"field": "x", "by": ["g"], "max_groups": 100})
    assert ok.count() == 200
    ok2 = op("mix_corpus", df, {"by": "g", "on": ["id"],
                                "temperature": 1.0, "max_groups": 100})
    assert ok2.count() == 200  # alpha=1 keeps everything
    # a NULL stratum must NOT count toward the cap (it is excluded
    # from the proportion stats and always kept)
    withnull = df.withColumn(
        "g", F.when(F.col("id") < 198, F.col("g")))
    ok3 = op("mix_corpus", withnull, {"by": "g", "on": ["id"],
                                      "temperature": 1.0,
                                      "max_groups": 100})
    assert ok3.count() == 200


def test_profile_single_pass(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, 5.0, "y"), (2, 7.5, None)],
        "k int, v double, s string")
    got = {r["col_name"]: r for r in op("profile", df, {}).collect()}
    assert got["k"]["n_rows"] == 3 and got["k"]["n_distinct"] == 2
    assert got["v"]["n_nulls"] == 1 and got["v"]["min_val"] == 5.0
    assert got["s"]["n_nulls"] == 1 and got["s"]["min_val"] is None
    # exact mode: Expand + 2 shuffles (multi-column exact distinct);
    # approx (HLL++) mode is the single-shuffle scale path
    from blackroad_data_pipeline_spark import plans

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plans.assert_max_shuffles(op("profile", orders, {}), 2)
    plans.assert_max_shuffles(op("profile", orders, {"approx": True}), 1)


def test_unpivot_melt(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0)], ["id", "a", "b"])
    out = op("unpivot", df, {"ids": ["id"], "values": ["a", "b"],
                             "variable_name": "metric", "value_name": "v"})
    got = {(r["id"], r["metric"], r["v"]) for r in out.collect()}
    assert got == {(1, "a", 10.0), (1, "b", 20.0)}


def test_explode_with_position_and_nulls(spark):
    df = spark.createDataFrame([(1, [5, 6]), (2, None)],
                               "id int, xs array<int>")
    out = op("explode", df, {"field": "xs", "as": "x"})
    assert {(r["id"], r["x"]) for r in out.collect()} == {(1, 5), (1, 6)}
    outer = op("explode", df, {"field": "xs", "as": "x", "keep_nulls": True})
    assert (2, None) in {(r["id"], r["x"]) for r in outer.collect()}
    pos = op("explode", df, {"field": "xs", "as": "x", "with_position": True})
    assert {(r["pos"], r["x"]) for r in pos.collect()} == {(0, 5), (1, 6)}


def test_repartition_layout(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    assert op("repartition", df, {"n": 7}).rdd.getNumPartitions() == 7
    assert op("repartition", df, {"n": 2, "coalesce": True}).rdd.getNumPartitions() == 2
    byk = op("repartition", df, {"by": ["k"], "n": 5})
    assert byk.rdd.getNumPartitions() == 5
    assert byk.count() == 1000


def test_window_rows_and_range_frames(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 10, 30.0)], ["k", "t", "v"])
    rows_f = op("window", df, {"function": "sum", "field": "v",
                               "partition_by": ["k"], "order_by": ["t"],
                               "frame": "rows", "frame_bounds": [-1, 0],
                               "alias": "s"})
    got = {r["t"]: r["s"] for r in rows_f.collect()}
    assert got == {1: 10.0, 2: 30.0, 10: 50.0}  # trailing 2 rows
    range_f = op("window", df, {"function": "sum", "field": "v",
                                "partition_by": ["k"], "order_by": ["t"],
                                "frame": "range", "frame_bounds": [-1, 0],
                                "alias": "s"})
    got = {r["t"]: r["s"] for r in range_f.collect()}
    # value-based: t=10 has no rows within [9,10] except itself
    assert got == {1: 10.0, 2: 30.0, 10: 30.0}


def test_first_last_value_null_semantics(spark):
    """ANSI default: FIRST_VALUE/LAST_VALUE RESPECT NULLS; the
    ignore-nulls variant is opt-in (ignore_nulls: true)."""
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 20.0), ("a", 3, None)],
        "k string, t int, v double")
    base = {"partition_by": ["k"], "order_by": ["t"], "frame": "rows",
            "frame_bounds": ["unbounded", "unbounded"]}
    out = op("window", df, {**base, "function": "first_value",
                            "field": "v", "alias": "fv"})
    out = op("window", out, {**base, "function": "last_value",
                             "field": "v", "alias": "lv"})
    r = out.filter("t = 2").collect()[0]
    assert r["fv"] is None and r["lv"] is None  # RESPECT NULLS
    out2 = op("window", df, {**base, "function": "first_value",
                             "field": "v", "alias": "fv",
                             "ignore_nulls": True})
    out2 = op("window", out2, {**base, "function": "last_value",
                               "field": "v", "alias": "lv",
                               "ignore_nulls": True})
    r2 = out2.filter("t = 2").collect()[0]
    assert r2["fv"] == 20.0 and r2["lv"] == 20.0


def test_parse_json(spark):
    df = spark.createDataFrame([(1, '{"k": 7, "tag": "x"}')], ["id", "props"])
    out = op("parse_json", df, {"field": "props",
                                "schema": "k int, tag string",
                                "flatten": True})
    r = out.collect()[0]
    assert (r["id"], r["k"], r["tag"]) == (1, 7, "x")
    assert "props_parsed" not in out.columns


def test_topk_ties_keep(spark):
    df = spark.createDataFrame(
        [("a", 9.0, 1), ("a", 9.0, 2), ("a", 5.0, 3), ("b", 1.0, 4)],
        ["k", "score", "id"])
    exact = op("topk_per_group", df, {"partition_by": ["k"],
                                      "order_by": ["score"], "k": 1})
    assert exact.filter("k = 'a'").count() == 1
    ties = op("topk_per_group", df, {"partition_by": ["k"],
                                     "order_by": ["score"], "k": 1,
                                     "ties": "keep"})
    assert ties.filter("k = 'a'").count() == 2  # both 9.0 rows survive


def test_budget_select_exact_and_partition_invariant(spark):
    """Distributed prefix-sum selection == the naive model, and the
    kept set ignores input partitioning."""
    rows = [(i, float(100 - i), (i * 37) % 50 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "score", "toks"])
    cfg = {"weight_field": "toks", "budget": 1000,
           "order_by": ["score", "id"], "descending": True,
           "as": "run"}
    got = {r["id"]: r["run"] for r in op("budget_select", df, cfg).collect()}
    # naive model: sort by (score desc, id desc), accumulate
    acc, want = 0, {}
    for i, s, t in sorted(rows, key=lambda r: (-r[1], -r[0])):
        acc += t
        if acc > 1000:
            break
        want[i] = acc
    assert got == want
    got2 = {r["id"]: r["run"]
            for r in op("budget_select", df.repartition(13), cfg).collect()}
    assert got2 == want
    # budget boundary: total of kept <= budget, and adding any dropped
    # row in order would exceed it
    assert max(want.values()) <= 1000


def test_budget_select_handles_empty_and_small(spark):
    df = spark.createDataFrame([], "id long, score double, toks long")
    out = op("budget_select", df, {"weight_field": "toks", "budget": 10,
                                   "order_by": ["score", "id"]})
    assert out.count() == 0


def test_corpus_diff_statuses(spark):
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (4, "delta CHANGED")],
        ["doc_id", "text"])
    old = spark.createDataFrame(
        [(2, "beta"), (3, "gamma"), (4, "delta")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["status"]
           for r in op("corpus_diff", new, {"other": old}).collect()}
    assert out == {1: "added", 2: "unchanged", 3: "removed", 4: "changed"}


def test_corpus_diff_fingerprint_store(spark):
    """The 100 TB path: diff against a stored (id, fp) manifest."""
    import hashlib

    new = spark.createDataFrame([(1, "alpha"), (2, "beta")],
                                ["doc_id", "text"])
    fp = lambda t: hashlib.md5(t.encode()).hexdigest()
    manifest = spark.createDataFrame(
        [(2, fp("beta")), (9, fp("gone"))], ["doc_id", "fp"])
    out = {r["doc_id"]: r["status"]
           for r in op("corpus_diff", new,
                       {"other": manifest,
                        "other_is_fingerprint": True}).collect()}
    assert out == {1: "added", 2: "unchanged", 9: "removed"}


def test_expect_filter_and_tag_modes(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 50.0), (3, "zz", -1.0), (4, None, 7.0)],
        "id long, cat string, v double")
    checks = [
        {"type": "in_set", "field": "cat", "values": ["a", "b"]},
        {"type": "in_range", "field": "v", "min": 0, "max": 10},
        {"type": "unique", "field": "cat"},
    ]
    kept = {r["id"] for r in
            op("expect", df, {"checks": checks}).collect()}
    # 1: cat dup fails unique; 2: range+unique; 3: set+range; 4: NULL
    # cat passes set AND unique (NULL convention), v in range -> kept
    assert kept == {4}
    tagged = {r["id"]: list(r["violations"]) for r in
              op("expect", df, {"checks": checks,
                                "on_fail": "tag"}).collect()}
    assert tagged[1] == ["unique_cat"]
    assert tagged[2] == ["in_range_v", "unique_cat"]
    assert tagged[3] == ["in_set_cat", "in_range_v"]
    assert tagged[4] == []


def test_expect_expr_matches_and_errors(spark):
    df = spark.createDataFrame([(1, "ab12"), (2, "nope")], "id long, code string")
    out = op("expect", df, {"checks": [
        {"type": "matches", "field": "code", "pattern": "^[a-z]+[0-9]+$"},
        {"type": "expr", "sql": "id < 10", "name": "id_small"},
    ]})
    assert {r["id"] for r in out.collect()} == {1}
    with pytest.raises(ValueError, match="unknown expectation"):
        op("expect", df, {"checks": [{"type": "zz", "field": "id"}]})
    with pytest.raises(ValueError, match="unknown on_fail"):
        op("expect", df, {"checks": [], "on_fail": "explode"})


def test_expect_null_valued_expr_fails_both_modes(spark):
    """A user expr that evaluates to NULL counts as FAILED in both
    filter and tag modes (WHERE semantics)."""
    df = spark.createDataFrame([(1, None), (2, 5)], "id long, v int")
    checks = [{"type": "expr", "sql": "v > 3", "name": "v_gt3"}]
    kept = {r["id"] for r in op("expect", df, {"checks": checks}).collect()}
    assert kept == {2}
    tagged = {r["id"]: list(r["violations"]) for r in
              op("expect", df, {"checks": checks, "on_fail": "tag"}).collect()}
    assert tagged == {1: ["v_gt3"], 2: []}


def test_expect_foreign_key_check(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long")
    dims = spark.createDataFrame([(10,), (20,), (30,)], "k long")
    tagged = {r["id"]: list(r["violations"]) for r in op(
        "expect", facts,
        {"on_fail": "tag", "checks": [
            {"type": "foreign_key", "field": "fk", "ref": dims,
             "ref_field": "k"}]}, views={}).collect()}
    # NULL FK passes (MATCH SIMPLE); 99 violates
    assert tagged == {1: [], 2: [], 3: ["foreign_key_fk"], 4: []}
    kept = sorted(r["id"] for r in op(
        "expect", facts,
        {"checks": [{"type": "foreign_key", "field": "fk", "ref": dims,
                     "ref_field": "k"}]}, views={}).collect())
    assert kept == [1, 2, 4]
    # column order preserved, marker columns dropped
    out = op("expect", facts,
             {"checks": [{"type": "foreign_key", "field": "fk",
                          "ref": dims, "ref_field": "k"}]}, views={})
    assert out.columns == ["id", "fk"]


def test_fixed_width_source(spark, tmp_path):
    from blackroad_data_pipeline_spark.sources import read_source

    p = tmp_path / "fw.txt"
    p.write_text("001alpha     42\n"
                 "002beta     x07\n"
                 "003gamma     -5\n")
    df = read_source(spark, "fixed_width", {
        "path": str(p),
        "columns": [{"name": "id", "width": 3},
                    {"name": "word", "width": 9},
                    {"name": "n", "width": 3}],
        "types": {"id": "int", "n": "int"},
    })
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["word"] == "alpha" and rows[1]["n"] == 42
    assert rows[2]["n"] is None          # 'x07' fails try_cast -> NULL
    assert rows[3]["n"] == -5
    # explicit start/end positions
    df2 = read_source(spark, "fixed_width", {
        "path": str(p),
        "columns": [{"name": "word", "start": 4, "end": 12}],
    })
    assert sorted(r["word"] for r in df2.collect()) == [
        "alpha", "beta", "gamma"]


def test_xml_source_and_sink_roundtrip(spark, tmp_path):
    from blackroad_data_pipeline_spark.sinks import write_sink
    from blackroad_data_pipeline_spark.sources import read_source

    p = tmp_path / "in.xml"
    p.write_text("<rows>"
                 "<row><id>1</id><name>a</name></row>"
                 "<row><id>2</id><name>b</name></row>"
                 "</rows>")
    df = read_source(spark, "xml", {"path": str(p), "row_tag": "row"})
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [
        (1, "a"), (2, "b")]
    out = tmp_path / "out"
    n = write_sink(df, "xml", {"path": str(out), "row_tag": "item",
                               "root_tag": "items"})
    assert n == 2
    back = read_source(spark, "xml", {"path": str(out),
                                      "row_tag": "item"})
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [
        (1, "a"), (2, "b")]


def test_k_anonymity_modes(spark):
    rows = [(1, "us", 30), (2, "us", 30), (3, "us", 30),
            (4, "fr", 40), (5, None, 50), (6, None, 50)]
    df = spark.createDataFrame(rows, "id long, country string, age long")
    cfg = {"quasi_identifiers": ["country", "age"], "k": 2}
    tagged = {r["id"]: (r["eq_class_size"], r["k_anonymous"])
              for r in op("k_anonymity", df, cfg, views={}).collect()}
    assert tagged[1] == (3, True) and tagged[4] == (1, False)
    assert tagged[5] == (2, True)          # NULLs group together
    kept = sorted(r["id"] for r in op(
        "k_anonymity", df, {**cfg, "mode": "filter"}, views={}).collect())
    assert kept == [1, 2, 3, 5, 6]
    sup = {r["id"]: (r["country"], r["age"]) for r in op(
        "k_anonymity", df, {**cfg, "mode": "suppress"}, views={}).collect()}
    assert sup[4] == (None, None) and sup[1] == ("us", 30)


def test_l_diversity_modes_and_null_semantics(spark):
    rows = [(1, "us", "flu"), (2, "us", "flu"), (3, "us", "cold"),
            (4, "fr", "flu"), (5, "fr", "flu"),
            (6, None, "hiv"), (7, None, None), (8, None, "flu")]
    df = spark.createDataFrame(rows, "id long, country string, dx string")
    cfg = {"quasi_identifiers": ["country"], "sensitive": "dx", "l": 2}
    tagged = {r["id"]: (r["sensitive_diversity"], r["l_diverse"])
              for r in op("l_diversity", df, cfg, views={}).collect()}
    assert tagged[1] == (2, True)            # us: {flu, cold}
    assert tagged[4] == (1, False)           # fr: {flu} — k-anonymous but NOT diverse
    # NULL QI groups together; NULL sensitive does NOT count
    assert tagged[6] == (2, True) and tagged[7] == (2, True)
    kept = sorted(r["id"] for r in op(
        "l_diversity", df, {**cfg, "mode": "filter"}, views={}).collect())
    assert kept == [1, 2, 3, 6, 7, 8]
    sup = {r["id"]: r["country"] for r in op(
        "l_diversity", df, {**cfg, "mode": "suppress"}, views={}).collect()}
    assert sup[4] is None and sup[1] == "us"


def test_l_diversity_single_shuffle(spark):
    from blackroad_data_pipeline_spark.plans import quality as plans

    df = spark.createDataFrame([(1, "us", "flu")],
                               "id long, country string, dx string")
    out = op("l_diversity", df, {"quasi_identifiers": ["country"],
                                 "sensitive": "dx"}, views={})
    plans.assert_no_row_python(out)
    plans.assert_max_shuffles(out, 1)


def test_sample_pps_exact_size_and_invariance(spark):
    rows = [(i, (i % 7) + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    cfg = {"weight_field": "w", "n": 25, "id_field": "doc_id"}
    out = {r["doc_id"]: r["n_copies"]
           for r in op("sample_pps", df, cfg, views={}).collect()}
    assert sum(out.values()) == 25          # EXACT sample size
    assert all(c >= 1 for c in out.values())
    again = {r["doc_id"]: r["n_copies"] for r in op(
        "sample_pps", df.repartition(13), cfg, views={}).collect()}
    assert again == out                      # partition-invariant
    # a different salt draws a different (but still exact-n) sample
    other = {r["doc_id"]: r["n_copies"] for r in op(
        "sample_pps", df, {**cfg, "salt": "s2"}, views={}).collect()}
    assert sum(other.values()) == 25 and other != out


def test_sample_pps_heavy_row_multiplicity_and_zero_weight(spark):
    df = spark.createDataFrame(
        [(1, 1000), (2, 1), (3, 0)], "doc_id long, w long")
    out = {r["doc_id"]: r["n_copies"] for r in op(
        "sample_pps", df, {"weight_field": "w", "n": 10,
                           "id_field": "doc_id"}, views={}).collect()}
    assert sum(out.values()) == 10
    assert out[1] >= 9                       # dominant weight drawn ~10x
    assert 3 not in out                      # zero weight never drawn


def test_sample_pps_rejects_negative_weight(spark):
    """A negative weight makes the running sum non-monotonic — the op
    must raise (executor-side assert on the weight expression), never
    silently emit negative/inflated n_copies (ADVICE r4-low)."""
    df = spark.createDataFrame(
        [(1, 10), (2, -3), (3, 5)], "doc_id long, w long")
    with pytest.raises(Exception, match="non-negative"):
        op("sample_pps", df, {"weight_field": "w", "n": 5,
                              "id_field": "doc_id"}, views={}).collect()
    with pytest.raises(Exception, match="non-negative"):
        op("sample_pps", df.withColumn("g", F.lit("a")),
           {"weight_field": "w", "n": 5, "id_field": "doc_id",
            "group_by": ["g"]}, views={}).collect()


def test_sample_pps_rejects_null_weight_with_named_message(spark):
    """A NULL weight must fail LOUD AND NAMED (VERDICT r6 #4). Two
    historical failure shapes: (a) `raw_w + coalesce(assert_true(...))`
    never evaluates the assert — binary Add short-circuits to NULL on a
    NULL left operand, so the row silently vanished from the sample;
    (b) a bare `raw_w >= 0` assert condition raises but with a NULL
    (blank) message, the concat'd message being NULL too. The guard is
    now a when/otherwise VALUE expression with a coalesced message."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, w long")
    with pytest.raises(Exception, match="non-NULL.*got NULL"):
        op("sample_pps", df, {"weight_field": "w", "n": 2,
                              "id_field": "doc_id"}, views={}).collect()
    with pytest.raises(Exception, match="non-NULL.*got NULL"):
        op("sample_pps", df.withColumn("g", F.lit("a")),
           {"weight_field": "w", "n": 2, "id_field": "doc_id",
            "group_by": ["g"]}, views={}).collect()


def test_sample_pps_rejects_int64_overflow(spark):
    """W·n approaching 2^63 must raise instead of wrapping — DuckDB
    silently widens to HUGEINT, so a wrapped Spark result would
    diverge from every oracle exactly at the boundary (VERDICT r4
    #6). Just-below-boundary totals still work exactly."""
    big = (1 << 62)
    df = spark.createDataFrame(
        [(1, big), (2, big - 1)], "doc_id long, w long")   # W ~ 2^63-1
    with pytest.raises(ValueError, match="exceeds int64"):
        op("sample_pps", df, {"weight_field": "w", "n": 2,
                              "id_field": "doc_id"}, views={})
    with pytest.raises(Exception, match="exceeds int64"):
        op("sample_pps", df.withColumn("g", F.lit("a")),
           {"weight_field": "w", "n": 2, "id_field": "doc_id",
            "group_by": ["g"]}, views={}).collect()
    # n=1: W*1 fits — exact draw still works at the extreme magnitude
    out = {r["doc_id"]: r["n_copies"] for r in op(
        "sample_pps", df, {"weight_field": "w", "n": 1,
                           "id_field": "doc_id"}, views={}).collect()}
    assert sum(out.values()) == 1


def test_top_p_select_minimal_prefix(spark):
    """Keep the smallest highest-weight prefix covering p of the
    total: the crossing row is kept, everything after is dropped, and
    an exact boundary (cum == p*total) keeps nothing extra."""
    df = spark.createDataFrame(
        [(1, "a", 50), (2, "a", 30), (3, "a", 15), (4, "a", 5),
         (5, "b", 10), (6, "b", 1), (7, "b", 0)],
        "doc_id long, lang string, w long")
    got = sorted(r["doc_id"] for r in op(
        "top_p_select", df, {"weight_field": "w", "p": 0.8,
                             "id_field": "doc_id",
                             "group_by": ["lang"]}, views={}).collect())
    # a: 50+30 == 0.8*100 exactly -> minimal prefix is {1,2};
    # b: 10 >= 0.8*11 -> {5}; zero-weight row 7 never selected
    assert got == [1, 2, 5]
    glob = sorted(r["doc_id"] for r in op(
        "top_p_select", df, {"weight_field": "w", "p": 0.8,
                             "id_field": "doc_id"}, views={}).collect())
    # global: total=111, need cum >= 88.8 -> 50+30+15=95 -> {1,2,3}
    assert glob == [1, 2, 3]
    # partition invariance (global path is a distributed prefix sum)
    again = sorted(r["doc_id"] for r in op(
        "top_p_select", df.repartition(7),
        {"weight_field": "w", "p": 0.8,
         "id_field": "doc_id"}, views={}).collect())
    assert again == glob
    # p=1 keeps every positive-weight row
    assert sorted(r["doc_id"] for r in op(
        "top_p_select", df, {"weight_field": "w", "p": 1.0,
                             "id_field": "doc_id",
                             "group_by": ["lang"]}, views={}).collect()) \
        == [1, 2, 3, 4, 5, 6]


def test_winsorize_group_global_and_nulls(spark):
    rows = [(i, "g", float(i)) for i in range(1, 11)] + [(20, "g", None)]
    df = spark.createDataFrame(rows, "id long, g string, x double")
    for cfg in ({"by": ["g"]}, {}):
        got = {r["id"]: r["x_wins"] for r in op(
            "winsorize", df, {"field": "x", "lower": 0.1, "upper": 0.9,
                              **cfg}, views={}).collect()}
        # n=10: k_lo=ceil(1)=1 -> lo=1.0, k_hi=ceil(9)=9 -> hi=9.0
        assert got[1] == 1.0 and got[9] == 9.0
        assert got[10] == 9.0              # clipped down
        assert got[20] is None             # NULL stays NULL
    # single-value group: both bounds are that value
    one = spark.createDataFrame([(1, "h", 42.0)], "id long, g string, x double")
    r = op("winsorize", one, {"field": "x", "lower": 0.25, "upper": 0.75,
                              "by": ["g"]}, views={}).collect()[0]
    assert r["x_wins"] == 42.0
    # lower=0 default means "the minimum", not a missing bound
    r2 = {r["id"]: r["x_wins"] for r in op(
        "winsorize", df, {"field": "x", "by": ["g"]}, views={}).collect()}
    assert r2[1] == 1.0 and r2[10] == 10.0


def test_group_scalar_joinback_null_group_keys(spark):
    """NULL group keys form a regular group in groupBy/Window, but a
    plain equi-join joinback silently drops that group's match
    (VERDICT r6 #1) — the rows passed through unclipped / NULL-binned
    / NULL-scored. The joinbacks in winsorize, bucketize and
    mad_outlier are eqNullSafe, so NULL-key rows get THEIR OWN
    group's scalars, exactly as if the key were any other value."""
    rows = [(1, "g", 1.0), (2, "g", 2.0),
            (3, None, 10.0), (4, None, 20.0), (5, None, 30.0)]
    df = spark.createDataFrame(rows, "id long, g string, x double")
    w = {r["id"]: r["x_wins"] for r in op(
        "winsorize", df, {"field": "x", "by": ["g"], "upper": 0.5},
        views={}).collect()}
    # NULL group: n=3, k_hi=ceil(0.5*3)=2 -> hi=20.0; 30 clips DOWN
    assert w[5] == 20.0 and w[3] == 10.0 and w[4] == 20.0
    b = {r["id"]: r["bucket"] for r in op(
        "bucketize", df, {"field": "x", "n_buckets": 2,
                          "group_by": ["g"]}, views={}).collect()}
    # NULL group boundary: rank ceil(3/2)=2 -> 20.0; ties go LOWER
    assert b[3] == 0 and b[4] == 0 and b[5] == 1
    m = {r["id"]: r for r in op(
        "mad_outlier", df, {"field": "x", "by": ["g"]},
        views={}).collect()}
    # NULL group: med=20 (rank ceil(3/2)=2), MAD=10 -> z(30)=1.0
    assert m[5]["robust_z"] == 1.0 and m[4]["robust_z"] == 0.0
    assert m[3]["robust_z"] == 1.0


def test_time_resample_null_group_key_keeps_aggregates(spark):
    """Empty buckets come from a per-key LAG + sequence explode, not
    a grid join-back — so a NULL group key (a regular group to
    groupBy/Window) keeps its observed aggregates and still gets its
    gap buckets, instead of the join silently zeroing the group."""
    rows = [("a", 100, 1.0), (None, 100, 5.0), (None, 130, 7.0)]
    df = spark.createDataFrame(rows, "g string, ts long, v double")
    out = {(r["g"], r["bucket"]): r["n_rows"] for r in op(
        "time_resample", df,
        {"ts_field": "ts", "interval": 10, "group_by": ["g"],
         "fill": "zero"}, views={}).collect()}
    assert out[("a", 100)] == 1
    # NULL-key group: observed buckets keep counts, gaps fill zero
    assert out[(None, 100)] == 1 and out[(None, 130)] == 1
    assert out[(None, 110)] == 0 and out[(None, 120)] == 0
    assert len(out) == 5


def test_time_resample_bucket_exact_near_2pow53(spark):
    """Bucket assignment is exact long floor-to-multiple
    (e - pmod(e, step)): the previous double floor(e/step)*step
    rounds UP across a multiple boundary at 2^53-magnitude raw-long
    timestamps (CLAUDE.md invariant; VERDICT r6 #2) — double(
    9007199254740999) ties-to-even to ...741000, so the old bucket
    START landed AFTER the event. bucket_ts for such epochs exceeds
    Python datetime range, so assert on the long bucket only."""
    e = 9_007_199_254_740_999
    df = spark.createDataFrame([(e,)], "ts long")
    out = op("time_resample", df, {"ts_field": "ts", "interval": 10},
             views={}).select("bucket", "n_rows").collect()
    assert [(r["bucket"], r["n_rows"]) for r in out] == [(e - 9, 1)]


def test_winsorize_definition_pinned_at_boundary(spark):
    """n=10, q=0.99: our pinned ceil(q*n) picks rank 10 (the max).
    This is exactly where ANSI percentile_disc and DuckDB
    quantile_disc diverge from each other — the pinned arithmetic is
    what makes the oracle engine-proof."""
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                               "id long, x double")
    got = {r["id"]: r["x_wins"] for r in op(
        "winsorize", df, {"field": "x", "upper": 0.99}, views={}).collect()}
    assert got[10] == 10.0                 # ceil(9.9)=10 -> no clip


def test_mad_outlier_group_degenerate_and_filter(spark):
    rows = ([(i, "g", float(v)) for i, v in
             enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
            + [(20, "h", 5.0), (21, "h", 5.0), (22, "h", 5.0),
               (23, "h", 9.0)]
            + [(30, "g", None)])
    df = spark.createDataFrame(rows, "id long, g string, x double")
    got = {r["id"]: r for r in op(
        "mad_outlier", df, {"field": "x", "by": ["g"]},
        views={}).collect()}
    # g: median=5 (rank ceil(10/2)=5), MAD=2 -> z(100)=95/2
    assert got[9]["robust_z"] == 47.5 and got[9]["is_outlier"]
    assert got[4]["robust_z"] == 0.0 and not got[4]["is_outlier"]
    # degenerate group (MAD=0): z NULL, any nonzero deviation flags
    assert got[23]["robust_z"] is None and got[23]["is_outlier"]
    assert got[20]["is_outlier"] is False
    # NULL value: NULL score, never flagged
    assert got[30]["robust_z"] is None and got[30]["is_outlier"] is None
    kept = sorted(r["id"] for r in op(
        "mad_outlier", df, {"field": "x", "by": ["g"], "mode": "filter"},
        views={}).collect())
    assert 9 not in kept and 23 not in kept and 30 in kept
    # global path (distributed prefix-sum ranks), partition-invariant
    g1 = sorted((r["id"], r["is_outlier"]) for r in op(
        "mad_outlier", df, {"field": "x"}, views={}).collect())
    g2 = sorted((r["id"], r["is_outlier"]) for r in op(
        "mad_outlier", df.repartition(7), {"field": "x"},
        views={}).collect())
    assert g1 == g2
    # all-NULL input keeps its rows with NULL scores
    nulls = spark.createDataFrame([(1, None), (2, None)],
                                  "id long, x double")
    out = op("mad_outlier", nulls, {"field": "x"}, views={}).collect()
    assert len(out) == 2 and all(r["robust_z"] is None for r in out)


def test_dedup_embedding_against(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.999, 0.01, 0.0, 0.0]),
         (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    hist = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>")
    cfg = {"threshold": 0.9, "dim": 4, "n_planes": 2, "n_tables": 10}
    kept = sorted(r["vec_id"] for r in op(
        "dedup_embedding_against", vecs, {**cfg, "history": hist},
        views={}).collect())
    assert kept == [2]                     # 0 and 1 match history
    # history as a registered view name
    kept2 = sorted(r["vec_id"] for r in op(
        "dedup_embedding_against", vecs, {**cfg, "history": "h"},
        views={"h": hist}).collect())
    assert kept2 == [2]
    # int8-quantized history (the 4x-narrower store) dedups the same
    q = op("quantize_embedding", hist, {"dim": 4}, views={})
    dq = op("dequantize_embedding", q, {"dim": 4}, views={})
    kept3 = sorted(r["vec_id"] for r in op(
        "dedup_embedding_against", vecs, {**cfg, "history": dq},
        views={}).collect())
    assert kept3 == [2]


def test_sample_pps_per_group_exact_size(spark):
    rows = [(g * 100 + i, f"g{g}", (i % 5) + 1)
            for g in range(3) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    out = op("sample_pps", df,
             {"weight_field": "w", "n": 7, "id_field": "doc_id",
              "group_by": ["grp"]}, views={}).collect()
    per = {}
    for r in out:
        per[r["grp"]] = per.get(r["grp"], 0) + r["n_copies"]
    assert per == {"g0": 7, "g1": 7, "g2": 7}
    # per-group path is partition-invariant too
    again = op("sample_pps", df.repartition(11),
               {"weight_field": "w", "n": 7, "id_field": "doc_id",
                "group_by": ["grp"]}, views={}).collect()
    assert sorted((r["doc_id"], r["n_copies"]) for r in again) == \
        sorted((r["doc_id"], r["n_copies"]) for r in out)


def test_round4_operators_handle_empty_input(spark):
    """Empty frames must flow through every round-4 operator without
    errors and produce empty (or empty-aggregate) results — the
    incremental-pipeline edge every first run hits."""
    empty_obs = spark.createDataFrame([], "k long, ts long, v string")
    assert op("scd2", empty_obs, {"keys": ["k"], "attrs": ["v"]},
              views={}).count() == 0

    empty_vals = spark.createDataFrame([], "value string")
    assert op("heavy_hitters", empty_vals, {"field": "value", "k": 3},
              views={}).count() == 0
    assert op("heavy_hitters", empty_vals,
              {"field": "value", "k": 3, "mode": "approx"},
              views={}).count() == 0

    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert op("triangle_count", empty_edges, {}, views={}).collect()[0][
        "n_triangles"] == 0
    assert op("triangle_count", empty_edges, {"per_node": True},
              views={}).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert op("sample_pps", empty_docs,
              {"weight_field": "doc_id", "n": 5, "id_field": "doc_id"},
              views={}).count() == 0
    assert op("bm25_score", empty_docs, {"query": "x"},
              views={}).count() == 0
    assert op("k_anonymity", empty_docs,
              {"quasi_identifiers": ["text"], "k": 2},
              views={}).count() == 0
    assert op("merge_agg", empty_docs,
              {"group_by": ["text"], "aggregates": [
                  {"field": "doc_id", "function": "count", "alias": "n"}]},
              views={}).count() == 0
    assert op("url_parts", empty_docs.withColumnRenamed("text", "url"),
              {}, views={}).count() == 0
    # train_bpe on an empty corpus yields an empty merge table, and
    # applying it still tokenizes (character fallback)
    merges = op("train_bpe", empty_docs, {"num_merges": 5}, views={})
    assert merges.count() == 0
    applied = op("bpe_apply",
                 spark.createDataFrame([(1, "ab")], ["doc_id", "text"]),
                 {"merges": merges}, views={}).collect()[0]
    assert applied["bpe_tokens"] == ["a", "b", "</w>"]


def test_round5_operators_handle_empty_input(spark):
    """Empty frames must flow through every round-5 operator without
    errors — the incremental-pipeline first-run edge."""
    empty_docs = spark.createDataFrame([], "doc_id long, lang string, "
                                           "n_chars long")
    assert op("top_p_select", empty_docs,
              {"weight_field": "n_chars", "p": 0.5, "id_field": "doc_id",
               "group_by": ["lang"]}, views={}).count() == 0
    assert op("top_p_select", empty_docs,
              {"weight_field": "n_chars", "p": 0.5,
               "id_field": "doc_id"}, views={}).count() == 0
    for cfg in ({"by": ["lang"]}, {}):
        out = op("winsorize", empty_docs,
                 {"field": "n_chars", "lower": 0.1, "upper": 0.9, **cfg},
                 views={})
        assert out.count() == 0 and "n_chars_wins" in out.columns
        assert op("mad_outlier", empty_docs,
                  {"field": "n_chars", **cfg}, views={}).count() == 0
    empty_events = spark.createDataFrame([], "user_id long, ts timestamp, "
                                             "value double")
    assert op("time_resample", empty_events,
              {"ts_field": "ts", "interval": 60, "group_by": ["user_id"],
               "fill": "zero"}, views={}).count() == 0
    empty_vecs = spark.createDataFrame([], "vec_id long, "
                                           "embedding array<float>")
    assert op("dedup_embedding_against", empty_vecs,
              {"threshold": 0.5, "dim": 4, "n_planes": 2, "n_tables": 2,
               "history": empty_vecs}, views={}).count() == 0


def test_category_drift_per_category_and_nulls(spark):
    cur = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "cat string")
    base = spark.createDataFrame(
        [("a",), ("c",), ("c",), (None,), (None,), (None,)], "cat string")
    got = {r["category"]: r for r in op(
        "category_drift", cur, {"baseline": base, "field": "cat"},
        views={}).collect()}
    assert set(got) == {"a", "b", "c", None}
    assert (got["a"]["n_cur"], got["a"]["n_base"]) == (2, 1)
    assert (got["b"]["n_cur"], got["b"]["n_base"]) == (1, 0)
    assert (got["c"]["n_cur"], got["c"]["n_base"]) == (0, 2)
    assert (got[None]["n_cur"], got[None]["n_base"]) == (1, 3)
    assert got["a"]["share_cur"] == 2 / 4 and got["a"]["share_base"] == 1 / 6
    assert got["b"]["share_diff"] == 1 / 4 - 0.0


def test_category_drift_summary_tvd(spark):
    cur = spark.createDataFrame([("a",)] * 3 + [("b",)], "cat string")
    base = spark.createDataFrame([("a",)] * 2 + [("c",)] * 2, "cat string")
    row = op("category_drift", cur, {
        "baseline": base, "field": "cat", "mode": "summary"},
        views={}).collect()[0]
    assert (row["n_categories"], row["n_new"], row["n_gone"]) == (3, 1, 1)
    # shares: cur a=.75 b=.25 c=0; base a=.5 b=0 c=.5 -> tvd = .5
    assert row["tvd"] == 0.5
    # identical snapshots -> zero drift
    same = op("category_drift", cur, {
        "baseline": cur, "field": "cat", "mode": "summary"},
        views={}).collect()[0]
    assert same["tvd"] == 0.0 and same["n_new"] == 0


def test_category_drift_empty_and_validation(spark):
    cur = spark.createDataFrame([("a",)], "cat string")
    empty = cur.where("cat = 'zz'")
    row = op("category_drift", cur, {
        "baseline": empty, "field": "cat", "mode": "summary"},
        views={}).collect()[0]
    assert row["n_categories"] == 1 and row["tvd"] is None
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mode"):
        op("category_drift", cur, {"baseline": empty, "field": "cat",
                                   "mode": "x"}, views={})


def test_ks_drift_exact_statistic(spark):
    # cur: {1,2,3,4}; base: {3,4,5,6} -> D = max|F_c - F_b| = 0.5 at v=2
    cur = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)],
                                "x double")
    base = spark.createDataFrame([(float(v),) for v in (3, 4, 5, 6)],
                                 "x double")
    row = op("ks_drift", cur, {"baseline": base, "field": "x"},
             views={}).collect()[0]
    assert (row["n_cur"], row["n_base"]) == (4, 4)
    assert row["ks"] == 0.5 and row["ks_at"] == 2.0
    # identical distributions -> ks 0, ks_at the smallest value (ties)
    same = op("ks_drift", cur, {"baseline": cur, "field": "x"},
              views={}).collect()[0]
    assert same["ks"] == 0.0 and same["ks_at"] == 1.0


def test_ks_drift_nulls_and_empty_side(spark):
    cur = spark.createDataFrame([(1.0,), (None,)], "x double")
    base = spark.createDataFrame([(2.0,)], "x double")
    row = op("ks_drift", cur, {"baseline": base, "field": "x"},
             views={}).collect()[0]
    assert (row["n_cur"], row["n_base"], row["ks"]) == (1, 1, 1.0)
    empty = base.where("x < 0")
    out = op("ks_drift", cur, {"baseline": empty, "field": "x"}, views={})
    assert out.count() == 0
    assert out.columns == ["n_cur", "n_base", "ks_at", "ks"]


def test_ks_drift_matches_scipy_model(spark):
    # brute-force two-sample KS on asymmetric multisets with dup values
    import itertools
    cur_v = [1.0, 1.0, 2.5, 3.0, 7.0]
    base_v = [0.5, 2.5, 2.5, 6.0]
    def ecdf(vals, x):
        return sum(1 for v in vals if v <= x) / len(vals)
    xs = sorted(set(cur_v) | set(base_v))
    exp = max(abs(ecdf(cur_v, x) - ecdf(base_v, x)) for x in xs)
    cur = spark.createDataFrame([(v,) for v in cur_v], "x double")
    base = spark.createDataFrame([(v,) for v in base_v], "x double")
    row = op("ks_drift", cur, {"baseline": base, "field": "x"},
             views={}).collect()[0]
    assert abs(row["ks"] - exp) < 1e-12


def test_bucketize_grouped_quantiles_and_ties(spark):
    rows = [("g", float(v)) for v in (1, 2, 3, 4, 5, 6, 7, 8)] + \
           [("h", 10.0), ("h", 20.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r["g"], r["v"]): r["bucket"] for r in op(
        "bucketize", df, {"field": "v", "n_buckets": 4,
                          "group_by": ["g"]}, views={}).collect()}
    # g: n=8, boundaries at ranks ceil(j*8/4)={2,4,6} -> values 2,4,6
    assert out[("g", 1.0)] == 0 and out[("g", 2.0)] == 0   # tie -> lower
    assert out[("g", 3.0)] == 1 and out[("g", 4.0)] == 1
    assert out[("g", 5.0)] == 2 and out[("g", 7.0)] == 3
    assert out[("g", None)] is None
    # h: n=2, ranks {1,1,2} dedup -> boundaries {10, 20} -> merged bins
    assert out[("h", 10.0)] == 0 and out[("h", 20.0)] == 1


def test_bucketize_global_and_explicit(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)],
                               "v double")
    out = {r["v"]: r["bucket"] for r in op(
        "bucketize", df, {"field": "v", "n_buckets": 2},
        views={}).collect()}
    # global: boundary at rank ceil(10/2)=5 -> value 5.0
    assert out[1.0] == 0 and out[5.0] == 0 and out[6.0] == 1
    exp = {r["v"]: r["bucket"] for r in op(
        "bucketize", df, {"field": "v", "boundaries": [3.0, 7.0]},
        views={}).collect()}
    assert exp[3.0] == 0 and exp[4.0] == 1 and exp[8.0] == 2
    with pytest.raises(ValueError, match="n_buckets"):
        op("bucketize", df, {"field": "v", "n_buckets": 1}, views={})


def test_key_skew_stats_exact_percentiles(spark):
    """percentiles='exact': pinned rank max(ceil(q*k),1) over the
    counts table — k=4 counts sorted [1,2,3,10]: p50 -> rank 2 (2),
    p99 -> rank 4 (10); approx mode agrees here (tiny cardinality)
    but only exact is oracle-safe."""
    rows = ([("a",)] * 1 + [("b",)] * 2 + [("c",)] * 3 + [("d",)] * 10)
    df = spark.createDataFrame(rows, "k string")
    for mode in ("exact", "approx"):
        r = op("key_skew_stats", df,
               {"keys": ["k"], "percentiles": mode}, views={}).collect()[0]
        assert (r["n_keys"], r["n_rows"], r["max_count"]) == (4, 16, 10)
        assert (r["p50_count"], r["p99_count"]) == (2, 10)
        assert abs(r["max_share"] - 10 / 16) < 1e-15
    import pytest as _pt
    with _pt.raises(ValueError, match="percentiles"):
        op("key_skew_stats", df, {"keys": ["k"], "percentiles": "p2"},
           views={})
