"""Frequency/cardinality sketch operators (llmops/sketch.py):
heavy_hitters' approx mode must be byte-identical to exact mode (the
MG candidates only route work), and the HLL sketches must estimate
within their configured error and merge losslessly."""

from __future__ import annotations

import random

import pytest

from blackroad_data_pipeline_spark.operators import apply_operator as op


def _skewed(spark, seed=7, n=5000):
    rng = random.Random(seed)
    # zipf-ish: a few dominant keys + a long tail
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.30:
            v = "alpha"
        elif r < 0.50:
            v = "beta"
        elif r < 0.58:
            v = "gamma"
        else:
            v = f"tail_{rng.randrange(2000)}"
        rows.append((i, v))
    return spark.createDataFrame(rows, ["id", "value"])


def _hh(df, **cfg):
    out = op("heavy_hitters", df, {"field": "value", **cfg}, views={})
    return sorted((r["value"], r["n_occurrences"], round(r["share"], 12))
                  for r in out.collect())


def test_heavy_hitters_exact_matches_python_model(spark):
    df = _skewed(spark)
    rows = [(r["id"], r["value"]) for r in df.collect()]
    from collections import Counter

    c = Counter(v for _, v in rows)
    n = sum(c.values())
    k = 10
    expect = sorted((v, cnt, round(cnt / n, 12))
                    for v, cnt in c.items() if cnt * k > n)
    assert _hh(df, k=k) == expect
    assert {v for v, _, _ in expect} == {"alpha", "beta"} | (
        {"gamma"} if c["gamma"] * k > n else set())


def test_heavy_hitters_approx_equals_exact(spark):
    """The whole point: MG candidates + exact recount == exact mode,
    value-for-value, even with a small capacity and many partitions."""
    df = _skewed(spark).repartition(16)
    k = 12
    assert _hh(df, k=k, mode="approx", capacity=2 * k) == _hh(df, k=k)


def test_heavy_hitters_excludes_nulls_in_both_modes(spark):
    df = spark.createDataFrame(
        [(i, "x" if i % 2 else None) for i in range(40)], ["id", "value"])
    for mode in ("exact", "approx"):
        got = _hh(df, k=3, mode=mode)
        # 20 non-null rows, all "x": share 1.0 over the non-null N
        assert got == [("x", 20, 1.0)]


def test_heavy_hitters_capacity_below_k_raises(spark):
    df = _skewed(spark)
    with pytest.raises(ValueError, match="capacity"):
        op("heavy_hitters", df,
           {"field": "value", "k": 10, "mode": "approx", "capacity": 5},
           views={})


def test_distinct_sketch_estimates_within_error(spark):
    df = spark.createDataFrame(
        [(i, f"u{i % 977}", "a" if i % 3 else "b") for i in range(6000)],
        ["id", "user", "grp"])
    out = {r["grp"]: r["distinct_user"]
           for r in op("distinct_sketch", df,
                       {"fields": ["user"], "group_by": ["grp"],
                        "lgk": 14}, views={}).collect()}
    exact = {r["grp"]: r["n"] for r in df.groupBy("grp").agg(
        __import__("pyspark.sql.functions", fromlist=["f"])
        .count_distinct("user").alias("n")).collect()}
    for g, est in out.items():
        assert abs(est - exact[g]) / exact[g] < 0.03, (g, est, exact[g])


def test_sketch_merge_estimates_union_within_error(spark):
    """Mergeability: sketch two halves, union them — the merged
    estimate must land within HLL error of the true union cardinality
    (datasketches' union gadget is not bit-identical to a direct
    sketch, so the guarantee is the error bound, not equality)."""
    df = spark.createDataFrame(
        [(i, f"u{i % 500}") for i in range(4000)], ["id", "user"])
    whole = op("distinct_sketch", df, {"fields": ["user"], "lgk": 12},
               views={}).collect()[0]["distinct_user"]
    halves = df.withColumn(
        "half", (df["id"] % 2))
    parts = op("distinct_sketch", halves,
               {"fields": ["user"], "group_by": ["half"], "lgk": 12,
                "keep_sketch": True}, views={})
    merged = op("sketch_merge", parts.select("sketch_user"),
                {"sketch_field": "sketch_user"}, views={}
                ).collect()[0]["distinct_merged"]
    assert abs(merged - 500) / 500 < 0.03, (merged, whole)
    assert abs(merged - whole) / whole < 0.03


# -- bottom-k quantile sketch -------------------------------------------------


def test_quantile_sketch_deterministic_and_bounded(spark):
    import random

    rng = random.Random(5)
    rows = [(i, "a" if i % 2 else "b", rng.randrange(1000))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    cfg = {"field": "v", "id_field": "id", "k": 128, "group_by": ["g"]}
    sk = op("quantile_sketch", df, cfg, views={})
    assert sk.count() == 256            # k rows per group, bounded
    # deterministic under any partitioning
    again = op("quantile_sketch", df.repartition(13), cfg, views={})
    assert sorted(map(tuple, sk.collect())) == \
        sorted(map(tuple, again.collect()))
    # estimates land within the ~1/sqrt(k) order-statistic band
    est = {r["g"]: r for r in op(
        "quantile_estimate", sk,
        {"field": "v", "group_by": ["g"], "quantiles": [0.5, 0.9]},
        views={}).collect()}
    exact = {r["g"]: r for r in op(
        "quantile_estimate", df,
        {"field": "v", "group_by": ["g"], "quantiles": [0.5, 0.9]},
        views={}).collect()}
    for g in ("a", "b"):
        assert abs(est[g]["q50"] - exact[g]["q50"]) < 1000 * 0.15
        assert abs(est[g]["q90"] - exact[g]["q90"]) < 1000 * 0.15


def test_quantile_sketch_global_is_distributed_topk(spark):
    """Global (empty group_by) mode must NEVER sort the corpus in one
    task (VERDICT r6 #3): the physical plan is a TakeOrdered
    (per-partition bottom-k + k·P merge), with the only Window —
    the rank stamp — running over the ≤k surviving rows. Results are
    identical to the old single-partition-window definition."""
    df = spark.createDataFrame(
        [(i, float(i % 97)) for i in range(3000)],
        "doc_id long, v double").repartition(16)
    sk = op("quantile_sketch", df, {"field": "v", "k": 32}, views={})
    from blackroad_data_pipeline_spark import plans
    plan = plans.explain_text(sk)
    assert "TakeOrdered" in plan, plan
    rows = sk.collect()
    assert len(rows) == 32
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 33))
    # bottom-32 by hash: recompute driver-side and compare exactly
    import hashlib
    exact = sorted(
        (hashlib.md5(f"{i}\x1fqsk".encode()).hexdigest(), i)
        for i in range(3000))[:32]
    got = sorted((r["sample_hash"], r["doc_id"]) for r in rows)
    assert got == exact


def test_quantile_sketch_merge_law_and_overlap(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) row-for-row —
    including when A and B OVERLAP (duplicate ids collapse before the
    re-take)."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(500)) for i in range(800)]
    df = spark.createDataFrame(rows, "id long, v long")
    cfg = {"field": "v", "id_field": "id", "k": 64}
    full = op("quantile_sketch", df, cfg, views={})
    a = op("quantile_sketch", df.filter("id < 500"), cfg, views={})
    b = op("quantile_sketch", df.filter("id >= 300"), cfg, views={})  # overlap
    merged = op("quantile_sketch_merge", a,
                {"id_field": "id", "k": 64, "others": [b]}, views={})
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, merged.collect()))
    # view-name resolution for others
    merged2 = op("quantile_sketch_merge", a,
                 {"id_field": "id", "k": 64, "others": ["bb"]},
                 views={"bb": b})
    assert merged2.count() == 64


def test_quantile_estimate_global_distributed(spark):
    """Global (empty group_by) mode runs on the distributed
    prefix-sum rank (winsorize precedent), not a single-partition
    window — the op also accepts raw corpora, not just k-row
    sketches. Pinned values: n=10, q50 -> rank ceil(5)=5, q90 ->
    rank 9; partition-invariant; empty input -> one all-NULL row."""
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                               "id long, v double")
    for frame in (df, df.repartition(7)):
        r = op("quantile_estimate", frame,
               {"field": "v", "quantiles": [0.5, 0.9]},
               views={}).collect()
        assert len(r) == 1
        assert (r[0]["q50"], r[0]["q90"]) == (5.0, 9.0)
    empty = df.filter("v IS NULL")
    r = op("quantile_estimate", empty, {"field": "v"}, views={}).collect()
    assert len(r) == 1 and r[0]["q50"] is None


def test_quantile_estimate_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="duplicate"):
        op("quantile_estimate", df,
           {"field": "v", "quantiles": [0.991, 0.992]}, views={})
    with pytest.raises(ValueError, match="aliases"):
        op("quantile_estimate", df,
           {"field": "v", "quantiles": [0.5], "aliases": ["a", "b"]},
           views={})
    with pytest.raises(ValueError, match="mode"):
        op("quantile_estimate", df, {"field": "v", "mode": "approx"},
           views={})


def test_quantile_estimate_cont_interpolates(spark):
    """mode='cont': the PINNED continuous percentile — h = (n-1)·q in
    exact ppb integers, result = v[lo+1] + (v[lo+2]-v[lo+1])·frac.
    On [1,2,4,8]: q50 -> h=1.5 -> 2+0.5·2=3; q25 -> 1.75; exact
    indices (q=0/1) return the boundary values with NO float
    round-trip. Grouped and global modes agree; global is
    partition-invariant."""
    rows = [("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 8.0),
            ("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    cfg = {"field": "v", "quantiles": [0.0, 0.25, 0.5, 1.0],
           "aliases": ["q0", "q25", "q50", "q100"], "mode": "cont"}
    g = {r["k"]: (r["q0"], r["q25"], r["q50"], r["q100"]) for r in op(
        "quantile_estimate", df, {**cfg, "group_by": ["k"]},
        views={}).collect()}
    assert g["a"] == (1.0, 1.75, 3.0, 8.0)
    assert g["b"] == (5.0, 5.0, 5.0, 5.0)   # single value: all ranks 1
    onlya = df.filter("k = 'a'")
    for frame in (onlya, onlya.repartition(7)):
        r = op("quantile_estimate", frame, cfg, views={}).collect()
        assert len(r) == 1
        assert (r[0]["q0"], r[0]["q25"], r[0]["q50"], r[0]["q100"]) \
            == (1.0, 1.75, 3.0, 8.0)
    # empty input: one all-NULL row, like disc mode
    r = op("quantile_estimate", df.filter("v IS NULL"), cfg,
           views={}).collect()
    assert len(r) == 1 and r[0]["q50"] is None
