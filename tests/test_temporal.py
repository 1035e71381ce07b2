"""Value tests for as-of and range joins (plan shape is covered in
test_plans.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from blackroad_data_pipeline_spark.operators import apply_operator as op


@pytest.fixture()
def quotes(spark):
    # (symbol, ts, price) — the "right" side of the classic as-of
    return spark.createDataFrame(
        [("A", 8, 1.0), ("A", 25, 2.0), ("B", 7, 9.0)],
        ["sym", "qts", "price"],
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [("A", 10), ("A", 25), ("B", 5)], ["sym", "tts"]
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_asof_backward_basic(trades, quotes):
    out = op("asof_join", trades, {
        "right": quotes, "by": ["sym"], "left_ts": "tts", "right_ts": "qts",
        "values": ["price"],
    }, views={})
    got = _rows(out.select("sym", "tts", "r_price"))
    assert got == {
        ("A", 10, 1.0),   # latest quote at/before 10 is ts=8
        ("A", 25, 2.0),   # quote AT the trade instant is visible
        ("B", 5, None),   # no quote yet -> NULL (how=left)
    }


def test_asof_inner_drops_unmatched(trades, quotes):
    out = op("asof_join", trades, {
        "right": quotes, "by": ["sym"], "left_ts": "tts", "right_ts": "qts",
        "values": ["price"], "how": "inner",
    }, views={})
    assert out.count() == 2


def test_asof_tolerance(trades, quotes):
    out = op("asof_join", trades, {
        "right": quotes, "by": ["sym"], "left_ts": "tts", "right_ts": "qts",
        "values": ["price"], "tolerance_seconds": 1,
    }, views={})
    got = _rows(out.select("sym", "tts", "r_price"))
    # A@10 is 2s stale -> rejected; A@25 is 0s stale -> kept
    assert got == {("A", 10, None), ("A", 25, 2.0), ("B", 5, None)}


def test_asof_equal_ts_tiebreak_last_wins(spark, trades):
    dup = spark.createDataFrame(
        [("A", 8, 1.0, 1), ("A", 8, 7.0, 2)], ["sym", "qts", "price", "seq"]
    )
    out = op("asof_join", trades.filter("sym = 'A' AND tts = 10"), {
        "right": dup, "by": ["sym"], "left_ts": "tts", "right_ts": "qts",
        "values": ["price"], "right_tiebreak": "seq",
    }, views={})
    assert _rows(out.select("r_price")) == {(7.0,)}


def test_range_join_point_in_interval(spark):
    points = spark.createDataFrame([("u1", 10), ("u1", 100), ("u2", 10)],
                                   ["uid", "ts"])
    intervals = spark.createDataFrame(
        [("u1", 5, 15, "w1"), ("u1", 90, 95, "w2"), ("u2", 5, 35, "w3")],
        ["uid", "start", "end", "wname"],
    )
    out = op("range_join", points, {
        "right": intervals, "by": ["uid"], "left_ts": "ts",
        "start_field": "start", "end_field": "end", "bucket_seconds": 10,
    }, views={})
    got = _rows(out.select("uid", "ts", "r_wname"))
    # u1@100 not in [90,95); u2@10 in the 3-bucket-wide w3 exactly once
    assert got == {("u1", 10, "w1"), ("u2", 10, "w3")}


def test_range_join_end_bound(spark):
    points = spark.createDataFrame([("u", 15)], ["uid", "ts"])
    intervals = spark.createDataFrame([("u", 5, 15, "w")],
                                      ["uid", "start", "end", "wname"])
    cfg = {"right": intervals, "by": ["uid"], "left_ts": "ts",
           "start_field": "start", "end_field": "end", "bucket_seconds": 7}
    assert op("range_join", points, cfg, views={}).count() == 0
    assert op("range_join", points, {**cfg, "end_inclusive": True},
              views={}).count() == 1


def test_asof_nearest_basic_ties_and_tolerance(spark):
    """direction='nearest' (pandas merge_asof parity, round 8): picks
    whichever directional candidate is closer in exact native units;
    at-instant rows win at distance 0; equidistant ties resolve
    BACKWARD; tolerance_seconds bounds BOTH candidates before the
    choice; still one shuffle."""
    from blackroad_data_pipeline_spark.plans import quality as plans

    quotes = spark.createDataFrame(
        [("A", 10, 1.0), ("A", 30, 2.0),
         ("B", 50, 3.0), ("B", 70, 4.0),   # left at 60: equidistant
         ("C", 40, 5.0), ("C", 40, 6.0),   # at-instant tie: max tiebreak
         ("D", 1000, 7.0)],
        "sym string, qts long, price double")
    trades = spark.createDataFrame(
        [("A", 24, 100), ("B", 60, 101), ("C", 40, 102), ("D", 10, 103),
         ("E", 5, 104)],
        "sym string, tts long, trade_id long")
    cfg = {"right": quotes, "by": ["sym"], "left_ts": "tts",
           "right_ts": "qts", "values": ["price"],
           "right_tiebreak": "price", "direction": "nearest"}
    out = {r["sym"]: (r["r_price"], r["r_qts_asof"]) for r in op(
        "asof_join", trades, cfg, views={}).collect()}
    assert out["A"] == (2.0, 30)        # 24: |24-10|=14 > |30-24|=6
    assert out["B"] == (3.0, 50)        # 60: equidistant -> backward
    assert out["C"] == (6.0, 40)        # at-instant, backward max tiebreak
    assert out["D"] == (7.0, 1000)      # only a forward candidate
    assert out["E"] == (None, None)     # no candidate, how=left
    # tolerance bounds both sides before the choice: D's 990s-away
    # forward candidate drops, E stays unmatched; inner drops both
    tout = {r["sym"]: r["r_price"] for r in op(
        "asof_join", trades, {**cfg, "tolerance_seconds": 100},
        views={}).collect()}
    assert tout["D"] is None and tout["A"] == 2.0
    iout = {r["sym"] for r in op(
        "asof_join", trades,
        {**cfg, "tolerance_seconds": 100, "how": "inner"},
        views={}).collect()}
    assert iout == {"A", "B", "C"}
    # the two directional frames share one sort: exactly one shuffle
    plans.assert_no_row_python(op("asof_join", trades, cfg, views={}))
    plans.assert_max_shuffles(op("asof_join", trades, cfg, views={}), 1)


def test_asof_nearest_timestamp_microsecond_distance(spark):
    """nearest compares EXACT µs distances on timestamp columns: a
    candidate 0.4s before beats one 0.5s after, even though both are
    in the same whole second."""
    quotes = spark.createDataFrame(
        [("A", 99.8, 1.0), ("A", 100.7, 2.0)],
        "sym string, sec double, price double",
    ).select("sym", "price", F.col("sec").cast("timestamp").alias("qts"))
    trades = spark.createDataFrame(
        [("A", 100.2, 10)], "sym string, sec double, trade_id long",
    ).select("sym", "trade_id",
             F.col("sec").cast("timestamp").alias("tts"))
    out = op("asof_join", trades, {
        "right": quotes, "by": ["sym"], "left_ts": "tts",
        "right_ts": "qts", "values": ["price"],
        "direction": "nearest"}, views={}).collect()
    assert out[0]["r_price"] == 1.0     # 0.4s back < 0.5s forward


def test_range_join_timestamp_bounds_are_second_granular(spark):
    """Pin the containment contract the round-8 sf1 sweep exposed:
    timestamp points/bounds floor through epoch_seconds, so
    containment compares WHOLE SECONDS — a point earlier in the same
    second as the window start is IN (floor equal), and a point in
    the same second as an exclusive end is OUT even when its µs value
    is below the exact end. Any oracle for this op must replay the
    floored arithmetic (an exact-µs replay disagrees on same-second
    boundary pairs — q_range_join docstring)."""
    pts = spark.createDataFrame(
        [("u", 100.2, "early_in_start_second"),
         ("u", 100.8, "late_in_start_second"),
         ("u", 110.3, "in_end_second")],
        "uid string, sec double, tag string",
    ).select("uid", "tag", F.col("sec").cast("timestamp").alias("ts"))
    win = spark.createDataFrame(
        [("u", 100.5, 110.5, "w")],
        "uid string, s double, e double, wname string",
    ).select("uid", "wname",
             F.col("s").cast("timestamp").alias("start"),
             F.col("e").cast("timestamp").alias("end"))
    out = op("range_join", pts, {
        "right": win, "by": ["uid"], "left_ts": "ts",
        "start_field": "start", "end_field": "end",
        "bucket_seconds": 5}, views={})
    got = {r["tag"] for r in out.collect()}
    # floors: points 100,100,110 vs window [100, 110): both
    # start-second points in (even 100.2 < exact 100.5), the
    # end-second point out (even 110.3 < exact 110.5)
    assert got == {"early_in_start_second", "late_in_start_second"}


def test_asof_timestamp_tiebreak(spark):
    """right_tiebreak of a non-numeric type (timestamp) must union
    cleanly with the left side's placeholder."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    quotes = spark.createDataFrame(
        [("A", 8, 1.0, t), ("A", 8, 7.0, t + dt.timedelta(hours=1))],
        ["sym", "qts", "price", "updated_at"])
    trades = spark.createDataFrame([("A", 10)], ["sym", "tts"])
    out = op("asof_join", trades, {
        "right": quotes, "by": ["sym"], "left_ts": "tts", "right_ts": "qts",
        "values": ["price"], "right_tiebreak": "updated_at",
    }, views={})
    assert [r["r_price"] for r in out.collect()] == [7.0]  # latest update wins


def test_asof_forward_basic(trades, quotes):
    out = op("asof_join", trades, {
        "right": quotes, "by": ["sym"], "left_ts": "tts", "right_ts": "qts",
        "values": ["price"], "direction": "forward",
    }, views={})
    got = _rows(out.select("sym", "tts", "r_price"))
    assert got == {
        ("A", 10, 2.0),   # next quote at/after 10 is ts=25
        ("A", 25, 2.0),   # quote AT the instant counts
        ("B", 5, 9.0),    # next B quote is ts=7
    }


def test_asof_forward_tolerance_and_tiebreak(spark, trades):
    dup = spark.createDataFrame(
        [("A", 25, 1.0, 2), ("A", 25, 7.0, 1)], ["sym", "qts", "price", "seq"])
    out = op("asof_join", trades, {
        "right": dup, "by": ["sym"], "left_ts": "tts", "right_ts": "qts",
        "values": ["price"], "right_tiebreak": "seq", "direction": "forward",
        "tolerance_seconds": 10,
    }, views={})
    got = _rows(out.select("sym", "tts", "r_price"))
    # A@10: next quote 15s ahead > tolerance -> NULL; A@25: at-instant,
    # min seq wins (forward picks FIRST); B@5: no B quotes -> NULL
    assert got == {("A", 10, None), ("A", 25, 7.0), ("B", 5, None)}


def test_asof_bad_direction(trades, quotes):
    with pytest.raises(ValueError, match="backward|forward"):
        op("asof_join", trades, {"right": quotes, "by": ["sym"],
                                 "left_ts": "tts", "right_ts": "qts",
                                 "values": ["price"], "direction": "up"},
           views={})


# -- funnel ----------------------------------------------------------------


def _funnel_events(spark, rows):
    df = spark.createDataFrame(rows, ["user_id", "sec", "event_type"])
    return df.withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")


def test_funnel_users_strict_ordering(spark):
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),  # full
        (2, 10, "click"), (2, 20, "view"),                       # click BEFORE view
        (2, 30, "click"),                                        # ...then after: step 2 ok
        (3, 10, "view"),                                         # stalls at step 1
        (4, 10, "purchase"),                                     # never views
    ]
    out = {r["user_id"]: r for r in op(
        "funnel", _funnel_events(spark, rows),
        {"steps": ["view", "click", "purchase"]}, views={}).collect()}
    assert out[1]["step_3_ts"] is not None
    assert out[2]["step_2_ts"] is not None      # the t=30 click counts
    assert out[2]["step_3_ts"] is None
    assert out[3]["step_2_ts"] is None
    assert out[4]["step_1_ts"] is None


def test_funnel_within_seconds_deadline(spark):
    rows = [(1, 0, "view"), (1, 50, "click"),
            (2, 0, "view"), (2, 500, "click")]
    out = {r["user_id"]: r for r in op(
        "funnel", _funnel_events(spark, rows),
        {"steps": ["view", "click"], "within_seconds": 100},
        views={}).collect()}
    assert out[1]["step_2_ts"] is not None
    assert out[2]["step_2_ts"] is None          # click past the deadline


def test_funnel_summary_counts(spark):
    rows = [(1, 10, "view"), (1, 20, "click"),
            (2, 10, "view"),
            (3, 5, "click")]                    # clicks but never views
    got = [(r["step"], r["n_reached"], r["conversion"]) for r in op(
        "funnel", _funnel_events(spark, rows),
        {"steps": ["view", "click"], "mode": "summary"},
        views={}).orderBy("step_idx").collect()]
    assert got == [("view", 2, 1.0), ("click", 1, 0.5)]


# -- retention_cohorts / event_transitions ---------------------------------


def test_retention_cohorts_day_period(spark):
    rows = [(1, 0, "view"), (1, 86400 * 2, "view"),     # day 0 and day 2
            (2, 86400, "click"),                        # cohort day 1 only
            (2, 86400 + 100, "view")]                   # same day: one period
    df = _funnel_events(spark, rows)
    got = {(str(r["cohort"]), r["period_offset"]): r["n_active"]
           for r in op("retention_cohorts", df,
                       {"key": "user_id", "period": "day"},
                       views={}).collect()}
    assert got[("1970-01-01 00:00:00", 0)] == 1
    assert got[("1970-01-01 00:00:00", 2)] == 1
    assert got[("1970-01-02 00:00:00", 0)] == 1
    assert len(got) == 3


def test_event_transitions_counts_and_probability(spark):
    rows = [(1, 10, "a"), (1, 20, "b"), (1, 30, "a"),
            (2, 10, "a"), (2, 20, "b")]
    out = {(r["src"], r["dst"]): (r["n"], r["p"])
           for r in op("event_transitions", _funnel_events(spark, rows),
                       {"key": "user_id", "probability": True},
                       views={}).collect()}
    assert out[("a", "b")] == (2, 1.0)     # every 'a' with a successor -> b
    assert out[("b", "a")] == (1, 1.0)
    assert len(out) == 2


# -- scd2 -------------------------------------------------------------------


def _obs(spark, rows):
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_scd2_compresses_change_points(spark):
    df = _obs(spark, [(1, 10, "a"), (1, 20, "a"), (1, 30, "b"),
                      (1, 40, "b"), (1, 50, "a"), (2, 10, "x")])
    out = sorted(map(tuple, op("scd2", df, {"keys": ["k"], "attrs": ["v"]},
                               views={}).collect()))
    assert out == [
        (1, "a", 10, 30, False), (1, "a", 50, None, True),
        (1, "b", 30, 50, False), (2, "x", 10, None, True)]


def test_scd2_null_safe_change_detection(spark):
    """NULL->value and value->NULL are changes; NULL->NULL is not."""
    df = _obs(spark, [(1, 10, None), (1, 20, None), (1, 30, "a"),
                      (1, 40, None)])
    out = sorted(
        map(tuple, op("scd2", df, {"keys": ["k"], "attrs": ["v"]},
                      views={}).collect()),
        key=lambda t: t[2])
    assert out == [(1, None, 10, 30, False), (1, "a", 30, 40, False),
                   (1, None, 40, None, True)]


def test_scd2_incremental_merge_rebuilds_only_touched_keys(spark):
    base = _obs(spark, [(1, 10, "a"), (1, 30, "b"), (2, 10, "x")])
    hist = op("scd2", base, {"keys": ["k"], "attrs": ["v"]}, views={})
    upd = _obs(spark, [(1, 60, "c"), (3, 5, "z")])
    out = sorted(map(tuple, op(
        "scd2", upd, {"keys": ["k"], "attrs": ["v"], "history": hist},
        views={}).collect()))
    assert out == [
        (1, "a", 10, 30, False), (1, "b", 30, 60, False),
        (1, "c", 60, None, True),
        (2, "x", 10, None, True),       # untouched: passed through
        (3, "z", 5, None, True)]
    # merge result must be reusable as the next history (idempotent
    # under an empty-change update replaying the current state)
    hist2 = op("scd2", upd, {"keys": ["k"], "attrs": ["v"],
                             "history": hist}, views={})
    upd2 = _obs(spark, [(1, 60, "c")])  # same state, same instant
    again = sorted(map(tuple, op(
        "scd2", upd2, {"keys": ["k"], "attrs": ["v"], "history": hist2},
        views={}).collect()))
    assert again == out


def test_scd2_single_key_shuffle(spark):
    from blackroad_data_pipeline_spark.plans import quality as plans

    df = _obs(spark, [(1, 10, "a")])
    out = op("scd2", df, {"keys": ["k"], "attrs": ["v"]}, views={})
    plans.assert_no_row_python(out)
    plans.assert_max_shuffles(out, 1)


def test_funnel_timing_mode(spark):
    rows = [("u1", 100, "view"), ("u1", 160, "click"),
            ("u1", 400, "purchase"),
            ("u2", 100, "view"), ("u2", 130, "click"),
            ("u3", 50, "view")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["step_idx"]: r for r in op(
        "funnel", df, {"steps": ["view", "click", "purchase"],
                       "key": "user_id", "mode": "timing"},
        views={}).collect()}
    assert out[2]["n_converted"] == 2
    assert out[2]["sum_seconds"] == (160 - 100) + (130 - 100)
    assert out[2]["from_step"] == "view" and out[2]["to_step"] == "click"
    assert out[3]["n_converted"] == 1
    assert out[3]["sum_seconds"] == 400 - 160


# -- time_resample -----------------------------------------------------------


def test_time_resample_gap_fill_and_ffill(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2020, 1, 1, 0, 0, 5), 10.0),
        (1, dt.datetime(2020, 1, 1, 0, 0, 55), 20.0),
        (1, dt.datetime(2020, 1, 1, 0, 3, 10), 5.0),   # minutes 1,2 empty
        (2, dt.datetime(2020, 1, 1, 0, 1, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = op("time_resample", df,
             {"ts_field": "ts", "interval": 60, "group_by": ["k"],
              "aggregates": [{"function": "count", "alias": "n"},
                             {"field": "v", "function": "sum"}],
              "fill": "zero"}, views={}).orderBy("k", "bucket").collect()
    base = 1577836800  # 2020-01-01T00:00:00Z
    assert [(r["k"], r["bucket"], r["n"], r["v_sum"]) for r in got] == [
        (1, base, 2, 30.0),
        (1, base + 60, 0, 0.0),        # generated empty bucket
        (1, base + 120, 0, 0.0),
        (1, base + 180, 1, 5.0),
        (2, base + 60, 1, 1.0),        # key 2's grid spans only itself
    ]
    ff = op("time_resample", df,
            {"ts_field": "ts", "interval": 60, "group_by": ["k"],
             "aggregates": [{"field": "v", "function": "max",
                             "alias": "vm"}],
             "fill": "ffill"}, views={}).orderBy("k", "bucket").collect()
    assert [r["vm"] for r in ff if r["k"] == 1] == [20.0, 20.0, 20.0, 5.0]
    # bucket_ts mirrors bucket
    assert all(int(r["bucket_ts"].timestamp()) == r["bucket"] for r in got)
    # linear: minutes 1,2 interpolate between the bucket sums 30 -> 5;
    # observed buckets cast to double
    li = op("time_resample", df,
            {"ts_field": "ts", "interval": 60, "group_by": ["k"],
             "aggregates": [{"field": "v", "function": "sum",
                             "alias": "sv"}],
             "fill": "linear"}, views={}).orderBy("k", "bucket").collect()
    k1 = [r["sv"] for r in li if r["k"] == 1]
    third = (5.0 - 30.0) * (1 / 3)
    assert k1 == [30.0, 30.0 + third, 30.0 + (5.0 - 30.0) * (2 / 3), 5.0]
    assert all(isinstance(r["sv"], float) for r in li)


def test_time_resample_guard_and_validation(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1), 1.0),
         (1, dt.datetime(2020, 1, 3), 2.0)],
        "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="buckets"):
        op("time_resample", df, {"ts_field": "ts", "interval": 1,
                                 "group_by": ["k"], "max_buckets": 1000},
           views={})
    with pytest.raises(ValueError, match="fill"):
        op("time_resample", df, {"ts_field": "ts", "interval": 60,
                                 "fill": "bogus"}, views={})
    with pytest.raises(ValueError, match="interval"):
        op("time_resample", df, {"ts_field": "ts", "interval": 0}, views={})


def test_interval_merge_overlap_touch_and_gap(spark):
    iv = spark.createDataFrame(
        [("u", 0, 10, 1), ("u", 5, 20, 2),    # overlap -> one island
         ("u", 20, 30, 3),                    # touch (start == max end)
         ("u", 40, 50, 4),                    # 10 apart -> new island
         ("v", 0, 5, 5)],
        ["k", "s", "e", "id"])
    out = op("interval_merge", iv, {
        "start_field": "s", "end_field": "e", "group_by": ["k"],
        "tiebreak": ["id"]}, views={})
    got = _rows(out.select("k", "island", "island_start", "island_end",
                           "n_intervals"))
    assert got == {("u", 1, 0, 30, 3), ("u", 2, 40, 50, 1),
                   ("v", 1, 0, 5, 1)}
    # gap=10 bridges the 30->40 hole
    out = op("interval_merge", iv, {
        "start_field": "s", "end_field": "e", "group_by": ["k"],
        "gap": 10, "tiebreak": ["id"]}, views={})
    got = _rows(out.select("k", "island", "n_intervals"))
    assert got == {("u", 1, 4), ("v", 1, 1)}


def test_interval_merge_contained_and_degenerate(spark):
    # second interval is CONTAINED in the first (running max must not
    # retreat to its smaller end); third is degenerate (e < s)
    iv = spark.createDataFrame(
        [("u", 0, 100, 1), ("u", 10, 20, 2), ("u", 50, 40, 3),
         ("u", 150, 160, 4)],
        ["k", "s", "e", "id"])
    out = op("interval_merge", iv, {
        "start_field": "s", "end_field": "e", "group_by": ["k"],
        "tiebreak": ["id"]}, views={})
    got = _rows(out.select("k", "island", "island_start", "island_end",
                           "n_intervals"))
    assert got == {("u", 1, 0, 100, 3), ("u", 2, 150, 160, 1)}


def test_interval_merge_annotate_mode(spark):
    iv = spark.createDataFrame(
        [("u", 0, 10, 1), ("u", 5, 20, 2), ("u", 100, 110, 3)],
        ["k", "s", "e", "id"])
    out = op("interval_merge", iv, {
        "start_field": "s", "end_field": "e", "group_by": ["k"],
        "mode": "annotate", "island_field": "grp", "tiebreak": ["id"]},
        views={})
    assert set(out.columns) == {"k", "s", "e", "id", "grp"}
    got = {(r["id"], r["grp"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 2)}


def test_interval_merge_global_guard_and_empty(spark):
    iv = spark.createDataFrame([("u", 0, 10, 1)], ["k", "s", "e", "id"])
    with pytest.raises(ValueError, match="allow_global"):
        op("interval_merge", iv, {"start_field": "s", "end_field": "e"},
           views={})
    out = op("interval_merge", iv, {
        "start_field": "s", "end_field": "e", "allow_global": True},
        views={})
    assert _rows(out.select("island", "island_start", "island_end",
                            "n_intervals")) == {(1, 0, 10, 1)}
    empty = iv.where("s < 0")
    out = op("interval_merge", empty, {
        "start_field": "s", "end_field": "e", "group_by": ["k"]}, views={})
    assert out.count() == 0


def test_interval_merge_single_key_shuffle(spark):
    from blackroad_data_pipeline_spark.plans import quality as plans

    iv = spark.createDataFrame(
        [("u", 0, 10, 1), ("u", 5, 20, 2)], ["k", "s", "e", "id"])
    out = op("interval_merge", iv, {
        "start_field": "s", "end_field": "e", "group_by": ["k"],
        "tiebreak": ["id"]}, views={})
    plans.assert_no_row_python(out)
    # windows + merge aggregate all share the one hash shuffle on k
    plans.assert_max_shuffles(out, 1)


def _att(spark):
    touches = spark.createDataFrame(
        [("u1", 100, 1), ("u1", 200, 2), ("u1", 200, 3),   # tie at 200
         ("u1", 5000, 4),                                   # out of window
         ("u2", 50, 5)],
        "user_id string, ts long, event_id long")
    convs = spark.createDataFrame(
        [("u1", 250, 10), ("u2", 40, 11), ("u3", 99, 12)],
        "user_id string, conv_ts long, conv_id long")
    return touches, convs


def test_attribution_last_first_tiebreak(spark):
    touches, convs = _att(spark)
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "lookback": 300, "tiebreak": "event_id"}
    last = {r["conv_id"]: (r["touch_id"], r["credit"]) for r in op(
        "attribution", touches, {**cfg, "model": "last"},
        views={}).collect()}
    # conv 10: ties at ts=200 -> max tiebreak wins; 11/12 unmatched drop
    assert last == {10: (3, 1.0)}
    first = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, {**cfg, "model": "first"},
        views={}).collect()}
    assert first == {10: 1}    # earliest in [conv-300, conv]


def test_attribution_linear_and_unmatched_keep(spark):
    touches, convs = _att(spark)
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "lookback": 300, "model": "linear"}
    got = {(r["conv_id"], r["touch_id"]): r["credit"] for r in op(
        "attribution", touches, cfg, views={}).collect()}
    third = 1.0 / 3
    assert got == {(10, 1): third, (10, 2): third, (10, 3): third}
    kept = {r["conv_id"]: (r["touch_id"], r["credit"]) for r in op(
        "attribution", touches, {**cfg, "unmatched": "keep"},
        views={}).collect() if r["touch_id"] is None}
    assert kept == {11: (None, 0.0), 12: (None, 0.0)}


def test_attribution_lookback_boundary_and_validation(spark):
    touches, convs = _att(spark)
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "model": "last"}
    # touch at ts=100, conv at 250: lookback 150 includes it (inclusive)
    got = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, {**cfg, "lookback": 50},
        views={}).collect()}
    assert got == {10: 3}
    with pytest.raises(ValueError, match="model"):
        op("attribution", touches, {**cfg, "lookback": 1, "model": "x"},
           views={})
    with pytest.raises(ValueError, match="lookback"):
        op("attribution", touches, {**cfg, "lookback": -1}, views={})


def test_attribution_first_subsecond_bounds(spark):
    # 'first' evaluates BOTH window bounds at native (sub-second)
    # precision: a touch after the conversion within the same second
    # must NOT be credited, nor may a touch up to 1s before the
    # nominal window start (both slipped through the old
    # second-truncated wstart/tolerance).
    touches = spark.createDataFrame(
        [("u1", 5.2, 1),            # 0.3s before window start 5.5
         ("u2", 10.8, 2),           # 0.3s AFTER conv, same second
         ("u3", 5.6, 3), ("u3", 7.0, 4)],
        "user_id string, sec double, event_id long",
    ).select("user_id", "event_id",
             F.col("sec").cast("timestamp").alias("ts"))
    convs = spark.createDataFrame(
        [("u1", 10.5, 10), ("u2", 10.5, 11), ("u3", 10.5, 12)],
        "user_id string, sec double, conv_id long",
    ).select("user_id", "conv_id",
             F.col("sec").cast("timestamp").alias("conv_ts"))
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "lookback": 5, "model": "first", "tiebreak": "event_id",
           "precision": "exact"}
    got = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, cfg, views={}).collect()}
    assert got == {12: 3}   # 10 and 11 unmatched -> dropped
    kept = {r["conv_id"]: (r["touch_id"], r["credit"]) for r in op(
        "attribution", touches, {**cfg, "unmatched": "keep"},
        views={}).collect()}
    assert kept == {10: (None, 0.0), 11: (None, 0.0), 12: (3, 1.0)}


def test_attribution_first_integer_touch_mixed_precision(spark):
    """Integer-second touch domain with sub-second conv_ts (ADVICE
    r6): a whole-second touch t is in-window iff
    t >= ceil(conv_exact) - lookback. The old floor-truncated wstart
    admitted touches up to ~1s before the nominal window start. The
    inclusive boundary for whole-second conversions is unchanged."""
    touches = spark.createDataFrame(
        [("u1", 5, 1),      # 0.5s before exact window start 5.5
         ("u2", 6, 2),      # exactly at the ceil'd start
         ("u3", 5, 3)],     # whole-second conv: boundary stays inclusive
        "user_id string, ts long, event_id long")
    convs = spark.createDataFrame(
        [("u1", 10.5, 10), ("u2", 10.5, 11), ("u3", 10.0, 12)],
        "user_id string, sec double, conv_id long",
    ).select("user_id", "conv_id",
             F.col("sec").cast("timestamp").alias("conv_ts"))
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "lookback": 5, "model": "first", "unmatched": "keep",
           "precision": "exact"}
    got = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, cfg, views={}).collect()}
    assert got == {10: None, 11: 2, 12: 3}


def test_attribution_last_single_shuffle(spark):
    from blackroad_data_pipeline_spark.plans import quality as plans

    touches, convs = _att(spark)
    out = op("attribution", touches, {
        "conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
        "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
        "lookback": 300, "model": "last"}, views={})
    plans.assert_no_row_python(out)
    plans.assert_max_shuffles(out, 1)


def test_sequence_assemble_order_truncation_and_plan(spark):
    rows = [("u1", 30, 3, "c"), ("u1", 10, 1, "a"), ("u1", 20, 2, "b"),
            ("u1", 20, 1, "x"),      # ts tie -> event_id orders x before b
            ("u2", 5, 9, "solo")]
    df = spark.createDataFrame(rows, "user_id string, ts long, "
                                     "event_id long, event_type string")
    cfg = {"key": ["user_id"], "ts_field": "ts",
           "token_field": "event_type", "tiebreak": ["event_id"]}
    got = {r["user_id"]: (r["sequence"], r["n_events"])
           for r in op("sequence_assemble", df, cfg, views={}).collect()}
    assert got["u1"] == ("a x b c", 4)
    assert got["u2"] == ("solo", 1)
    # max_len keeps the EARLIEST events; n_events still counts all
    capped = {r["user_id"]: (r["sequence"], r["n_events"]) for r in op(
        "sequence_assemble", df, {**cfg, "max_len": 2},
        views={}).collect()}
    assert capped["u1"] == ("a x", 4)
    with pytest.raises(ValueError, match="max_len"):
        op("sequence_assemble", df, {**cfg, "max_len": 0}, views={})
    from blackroad_data_pipeline_spark.plans import quality as plans

    out = op("sequence_assemble", df, cfg, views={})
    plans.assert_no_row_python(out)
    plans.assert_max_shuffles(out, 1)


# -- interval_join ---------------------------------------------------------


def _ij_fixture(spark):
    left = spark.createDataFrame(
        [("u1", 0, 100, "a"), ("u1", 200, 300, "b"), ("u2", 0, 50, "c"),
         (None, 0, 10, "n"), ("u1", 400, 400, "z")],
        "user string, start long, end long, lid string")
    right = spark.createDataFrame(
        [("u1", 90, 250, "R1"), ("u1", 300, 350, "R2"),
         ("u2", 50, 60, "R3"), (None, 0, 10, "RN")],
        "user string, start long, end long, rid string")
    return left, right


def test_interval_join_halfopen_pairs_and_overlap_columns(spark):
    left, right = _ij_fixture(spark)
    out = op("interval_join", left, {
        "right": right, "by": ["user"], "bucket_width": 64,
        "overlap": True}, views={})
    got = {(r["lid"], r["r_rid"]): (r["overlap_start"], r["overlap_end"],
                                    r["overlap_len"])
           for r in out.collect()}
    # a=[0,100) x R1=[90,250) overlap [90,100); b x R1 [200,250);
    # c=[0,50) touches R3=[50,60) -> no match half-open; b touches R2
    # at 300 -> no; NULL keys never match; z=[400,400) is empty.
    assert got == {("a", "R1"): (90, 100, 10), ("b", "R1"): (200, 250, 50)}


def test_interval_join_end_inclusive_touching(spark):
    left, right = _ij_fixture(spark)
    out = op("interval_join", left, {
        "right": right, "by": ["user"], "bucket_width": 64,
        "end_inclusive": True}, views={})
    got = {(r["lid"], r["r_rid"]) for r in out.collect()}
    # touching pairs now match; z=[400,400] is a 1-point interval and
    # touches nothing in range
    assert got == {("a", "R1"), ("b", "R1"), ("b", "R2"), ("c", "R3")}


def test_interval_join_pair_counted_once_across_shared_buckets(spark):
    # both intervals span MANY common buckets: the overlap-start
    # bucket rule must keep exactly one copy, no distinct
    left = spark.createDataFrame([("k", 0, 1000, "L")],
                                 "user string, start long, end long, lid string")
    right = spark.createDataFrame([("k", 5, 995, "R")],
                                  "user string, start long, end long, rid string")
    out = op("interval_join", left, {
        "right": right, "by": ["user"], "bucket_width": 10}, views={})
    assert out.count() == 1


def test_interval_join_negative_bounds_exact(spark):
    # div truncates toward zero (monotone), so bucket containment
    # stays exact for negative epochs
    l2 = spark.createDataFrame([("k", -130, -10, "L")],
                               "user string, start long, end long, lid string")
    r2 = spark.createDataFrame(
        [("k", -50, -5, "A"), ("k", -200, -130, "B"),
         ("k", -200, -129, "C"), ("k", -400, -301, "D")],
        "user string, start long, end long, rid string")
    cfg = {"right": r2, "by": ["user"], "bucket_width": 7}
    got = {r["r_rid"] for r in
           op("interval_join", l2, cfg, views={}).collect()}
    assert got == {"A", "C"}  # B touches at -130 (half-open: no)
    got_inc = {r["r_rid"] for r in
               op("interval_join", l2, {**cfg, "end_inclusive": True},
                  views={}).collect()}
    assert got_inc == {"A", "B", "C"}


def test_interval_join_null_bounds_drop_and_guard(spark):
    left = spark.createDataFrame([("k", None, 100, "L"), ("k", 0, 9, "M")],
                                 "user string, start long, end long, lid string")
    right = spark.createDataFrame([("k", 0, 50, "R")],
                                  "user string, start long, end long, rid string")
    out = op("interval_join", left, {
        "right": right, "by": ["user"], "bucket_width": 16}, views={})
    assert [r["lid"] for r in out.collect()] == ["M"]
    # executor-side explosion guard fails loud and named
    wide = spark.createDataFrame([("k", 0, 10_000, "W")],
                                 "user string, start long, end long, lid string")
    with pytest.raises(Exception, match="interval_join"):
        op("interval_join", wide, {
            "right": right, "by": ["user"], "bucket_width": 1,
            "max_buckets": 100}, views={}).collect()


def test_interval_join_timestamp_bounds(spark):
    # timestamp bound columns route through epoch_seconds
    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", "2024-01-01 02:00:00", "L")],
        "user string, s string, e string, lid string"
    ).selectExpr("user", "cast(s as timestamp) as s",
                 "cast(e as timestamp) as e", "lid")
    right = spark.createDataFrame(
        [("k", "2024-01-01 01:00:00", "2024-01-01 03:00:00", "R"),
         ("k", "2024-01-01 02:30:00", "2024-01-01 03:00:00", "S")],
        "user string, s string, e string, rid string"
    ).selectExpr("user", "cast(s as timestamp) as s",
                 "cast(e as timestamp) as e", "rid")
    out = op("interval_join", left, {
        "right": right, "by": ["user"], "left_start": "s",
        "left_end": "e", "bucket_width": 3600, "overlap": True}, views={})
    rows = out.collect()
    assert [r["r_rid"] for r in rows] == ["R"]
    assert rows[0]["overlap_len"] == 3600


def test_interval_join_plan_no_cartesian_no_row_python(spark):
    from blackroad_data_pipeline_spark.plans import quality as plans

    left, right = _ij_fixture(spark)
    out = op("interval_join", left, {
        "right": right, "by": ["user"], "bucket_width": 64}, views={})
    plans.assert_no_row_python(out)
    strategies = plans.join_strategies(out)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_interval_join_rejects_float_bounds(spark):
    left = spark.createDataFrame([("k", 0.5, 10.5, "L")],
                                 "user string, start double, end double, lid string")
    right = spark.createDataFrame([("k", 0, 50, "R")],
                                  "user string, start long, end long, rid string")
    with pytest.raises(ValueError, match="must be integral"):
        op("interval_join", left, {"right": right, "by": ["user"]},
           views={})


def test_range_join_integral_ts_bypasses_saturation(spark):
    """Integral ts/bound columns are used directly: the old
    epoch_seconds roundtrip SATURATED past ~9.2e12 s, silently
    clamping raw epoch-ns longs so every huge point landed in the
    max-timestamp bucket (and 'contained' compared clamped values)."""
    big = 4_102_444_800 * 1_000_000_000  # year-2100 epoch-ns
    points = spark.createDataFrame([("u", big + 500)], "uid string, ts long")
    intervals = spark.createDataFrame(
        [("u", big, big + 1000, "in"), ("u", big + 600, big + 1000, "out")],
        "uid string, start long, end long, wname string")
    out = op("range_join", points, {
        "right": intervals, "by": ["uid"], "left_ts": "ts",
        "start_field": "start", "end_field": "end",
        "bucket_seconds": 1000}, views={})
    assert [r["r_wname"] for r in out.collect()] == ["in"]


def test_time_resample_global_gap_fill(spark):
    """Empty group_by: the gap window runs single-partition but over
    OBSERVED BUCKETS (grid-sized, max_buckets-guarded), never the raw
    corpus — gaps still fill and ffill carries across them."""
    rows = [(100, 1.0), (101, 2.0), (140, 7.0)]
    df = spark.createDataFrame(rows, "ts long, v double")
    out = {r["bucket"]: (r["n_rows"], r["v_last"]) for r in op(
        "time_resample", df,
        {"ts_field": "ts", "interval": 10,
         "aggregates": [{"function": "count", "alias": "n_rows"},
                        {"field": "v", "function": "max",
                         "alias": "v_last"}],
         "fill": "ffill"}, views={}).collect()}
    assert out[100] == (2, 2.0)
    # ffill carries EVERY aggregate column across gap buckets
    assert out[110] == (2, 2.0) and out[130] == (2, 2.0)
    assert out[140] == (1, 7.0)
    assert len(out) == 5


def test_interval_join_no_keys_global(spark):
    """Empty ``by``: the join runs on the bucket alone — global
    interval overlap (maintenance windows x incident spans)."""
    left = spark.createDataFrame([(0, 100, "L1"), (500, 600, "L2")],
                                 "start long, end long, lid string")
    right = spark.createDataFrame([(90, 110, "R1"), (700, 800, "R2")],
                                  "start long, end long, rid string")
    out = op("interval_join", left, {"right": right, "bucket_width": 50},
             views={})
    assert {(r["lid"], r["r_rid"]) for r in out.collect()} == {("L1", "R1")}


def test_attribution_last_precision_exact(spark):
    """precision='exact' for model=last (ADVICE r6 #2): the picked
    touch must satisfy the exact microsecond window start, so last
    and first agree on boundary touches. Default 'second' keeps the
    oracle-parity floor-depth semantics."""
    touches = spark.createDataFrame(
        [("u1", 5.2, 1),             # 0.3s before exact start 5.5
         ("u2", 5.6, 2),             # inside the exact window
         ("u3", 5.2, 3), ("u3", 5.6, 4)],  # last in-window: 4
        "user_id string, sec double, event_id long",
    ).select("user_id", "event_id",
             F.col("sec").cast("timestamp").alias("ts"))
    convs = spark.createDataFrame(
        [("u1", 10.5, 10), ("u2", 10.5, 11), ("u3", 10.5, 12)],
        "user_id string, sec double, conv_id long",
    ).select("user_id", "conv_id",
             F.col("sec").cast("timestamp").alias("conv_ts"))
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "lookback": 5, "model": "last", "tiebreak": "event_id"}
    # default second-granular depth admits the u1 boundary touch
    loose = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, cfg, views={}).collect()}
    assert loose == {10: 1, 11: 2, 12: 4}
    # exact: u1's only touch fails the exact bound -> dropped
    exact = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, {**cfg, "precision": "exact"},
        views={}).collect()}
    assert exact == {11: 2, 12: 4}
    # keep mode: failed pick nulls out with credit 0
    kept = {r["conv_id"]: (r["touch_id"], r["credit"]) for r in op(
        "attribution", touches,
        {**cfg, "precision": "exact", "unmatched": "keep"},
        views={}).collect()}
    assert kept == {10: (None, 0.0), 11: (2, 1.0), 12: (4, 1.0)}
    # integer-second touches: exact t*1e6 path
    itouch = spark.createDataFrame([("u1", 5, 1), ("u2", 6, 2)],
                                   "user_id string, ts long, event_id long")
    iexact = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", itouch,
        {**cfg, "precision": "exact", "unmatched": "keep"},
        views={}).collect()}
    assert iexact[10] is None and iexact[11] == 2
    with pytest.raises(ValueError, match="precision"):
        op("attribution", touches, {**cfg, "precision": "ns"}, views={})


def test_attribution_first_precision_second(spark):
    """precision='second' IS the default for model=first since the
    round-9 cross-model unification (VERDICT r8 #6): window depth at
    floor granularity — floor(c) - floor(t) <= lookback — with the
    upper bound exact; the round-6 exact-both-bounds behavior is
    opt-in via precision='exact'."""
    touches = spark.createDataFrame(
        [("u1", 5.2, 1),             # 0.3s before the exact start 5.5
         ("u2", 10.8, 2)],           # after conv (same second)
        "user_id string, sec double, event_id long",
    ).select("user_id", "event_id",
             F.col("sec").cast("timestamp").alias("ts"))
    convs = spark.createDataFrame(
        [("u1", 10.5, 10), ("u2", 10.5, 11)],
        "user_id string, sec double, conv_id long",
    ).select("user_id", "conv_id",
             F.col("sec").cast("timestamp").alias("conv_ts"))
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "lookback": 5, "model": "first", "unmatched": "keep"}
    # exact (opt-in): the boundary touch fails, the late touch fails
    assert {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, {**cfg, "precision": "exact"},
        views={}).collect()} == {10: None, 11: None}
    # default == second: floor depth admits u1's boundary touch; the
    # exact upper bound still rejects u2's post-conversion touch
    got = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, cfg, views={}).collect()}
    assert got == {10: 1, 11: None}
    # integral touches, second mode: t >= floor(c) - L
    itouch = spark.createDataFrame([("u1", 5, 1), ("u2", 4, 2)],
                                   "user_id string, ts long, event_id long")
    igot = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", itouch, {**cfg, "precision": "second"},
        views={}).collect()}
    assert igot == {10: 1, 11: None}    # floor(10.5)-5=5: 5 in, 4 out


def test_attribution_linear_precision_exact(spark):
    """precision='exact' for model=linear (round 8): the bucketized
    range join runs on microsecond longs — window
    [conv - lookback*1e6 us, conv], both bounds exact. Default
    'second' keeps the oracle-pinned floor-granular bounds."""
    touches = spark.createDataFrame(
        [("u1", 5.2, 1),    # in floor window [5,10], out of exact [5.5,10.5]
         ("u1", 5.6, 2),    # in both
         ("u1", 10.8, 3),   # after conv exactly; floor 10 <= 10 admits it
         ("u2", 5.2, 4)],   # u2's only touch -> unmatched under exact
        "user_id string, sec double, event_id long",
    ).select("user_id", "event_id",
             F.col("sec").cast("timestamp").alias("ts"))
    convs = spark.createDataFrame(
        [("u1", 10.5, 10), ("u2", 10.5, 11)],
        "user_id string, sec double, conv_id long",
    ).select("user_id", "conv_id",
             F.col("sec").cast("timestamp").alias("conv_ts"))
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "lookback": 5, "model": "linear"}
    loose = {(r["conv_id"], r["touch_id"]): r["credit"] for r in op(
        "attribution", touches, cfg, views={}).collect()}
    assert loose == {(10, 1): 1 / 3, (10, 2): 1 / 3, (10, 3): 1 / 3,
                     (11, 4): 1.0}
    exact = {(r["conv_id"], r["touch_id"]): r["credit"] for r in op(
        "attribution", touches, {**cfg, "precision": "exact"},
        views={}).collect()}
    assert exact == {(10, 2): 1.0}
    kept = {r["conv_id"]: (r["touch_id"], r["credit"]) for r in op(
        "attribution", touches,
        {**cfg, "precision": "exact", "unmatched": "keep"},
        views={}).collect() if r["touch_id"] is None}
    assert kept == {11: (None, 0.0)}
    # integral whole-second touches ride the same x1e6 mapping
    itouch = spark.createDataFrame([("u1", 5, 1), ("u1", 6, 2)],
                                   "user_id string, ts long, event_id long")
    iexact = {(r["conv_id"], r["touch_id"]) for r in op(
        "attribution", itouch, {**cfg, "precision": "exact"},
        views={}).collect()}
    assert iexact == {(10, 2)}          # 5 < exact start 5.5


def test_attribution_int_touch_overflow_fails_loud(spark):
    """ADVICE r7: an IntegerType touch column meeting a conversion
    past 2038-01-19 must raise, not silently wrap the as-of key
    (Spark's non-ANSI long->int cast wraps)."""
    import pyspark.errors

    touches = spark.createDataFrame(
        [("u1", 100, 1)], "user_id string, ts int, event_id long")
    convs = spark.createDataFrame(
        [("u1", float(1 << 33), 10)],     # epoch ~2242, > int32 max
        "user_id string, sec double, conv_id long",
    ).select("user_id", "conv_id",
             F.col("sec").cast("timestamp").alias("conv_ts"))
    cfg = {"conversions": convs, "by": ["user_id"], "conv_id": "conv_id",
           "touch_id": "event_id", "touch_ts": "ts", "conv_ts": "conv_ts",
           "lookback": 5}
    for model in ("last", "first"):
        with pytest.raises(Exception, match="overflows the int"):
            op("attribution", touches, {**cfg, "model": model},
               views={}).collect()
    # in-range conversions on an int touch column still work
    ok_convs = spark.createDataFrame(
        [("u1", 100.5, 10)], "user_id string, sec double, conv_id long",
    ).select("user_id", "conv_id",
             F.col("sec").cast("timestamp").alias("conv_ts"))
    got = {r["conv_id"]: r["touch_id"] for r in op(
        "attribution", touches, {**cfg, "conversions": ok_convs},
        views={}).collect()}
    assert got == {10: 1}


# -- rolling -----------------------------------------------------------------


def test_rolling_range_frame_basic(spark):
    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 20), ("a", 10, 30), ("a", 100, 40),
         ("b", 7, 5)],
        "k string, ts long, v long")
    got = {(r["k"], r["ts"]): (r["n"], r["s"]) for r in op(
        "rolling", df,
        {"group_by": ["k"], "window": 10,
         "aggregates": [{"function": "count", "alias": "n"},
                        {"field": "v", "function": "sum",
                         "alias": "s"}]}, views={}).collect()}
    # frame is [t-10, t] inclusive both ends
    assert got[("a", 0)] == (1, 10)
    assert got[("a", 5)] == (2, 30)
    assert got[("a", 10)] == (3, 60)       # 0 is exactly 10 back: in
    assert got[("a", 100)] == (1, 40)
    assert got[("b", 7)] == (1, 5)


def test_rolling_ties_avg_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 5, 2.0), ("a", 5, 4.0), ("a", 6, None)],
        "k string, ts long, v double")
    rows = op("rolling", df, {
        "group_by": ["k"], "window": 3,
        "aggregates": [{"field": "v", "function": "avg", "alias": "m"},
                       {"field": "v", "function": "count", "alias": "nv"},
                       {"field": "v", "function": "max", "alias": "mx"}]},
        views={}).collect()
    got = {(r["ts"], r["v"]): (r["m"], r["nv"], r["mx"]) for r in rows}
    # equal instants share the frame (value-based RANGE): both ts=5
    # rows see both values; the NULL v at 6 counts 0, avg ignores it
    assert got[(5, 2.0)] == (3.0, 2, 4.0)
    assert got[(5, 4.0)] == (3.0, 2, 4.0)
    assert got[(6, None)] == (3.0, 2, 4.0)
    with pytest.raises(ValueError, match="group_by"):
        op("rolling", df, {"group_by": [], "window": 3,
                           "aggregates": []}, views={})
    with pytest.raises(ValueError, match="window"):
        op("rolling", df, {"group_by": ["k"], "window": 0,
                           "aggregates": []}, views={})


def test_rolling_timestamp_microseconds_and_plan(spark):
    from blackroad_data_pipeline_spark.plans import quality as plans

    df = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 10.4, 1), ("a", 11.0, 1)],
        "k string, sec double, one long",
    ).select("k", "one", F.col("sec").cast("timestamp").alias("ts"))
    out = op("rolling", df, {
        "group_by": ["k"], "window": 1,
        "aggregates": [{"function": "count", "alias": "n"}]}, views={})
    got = sorted(r["n"] for r in out.collect())
    # µs frame: 11.0 sees 10.0 (exactly 1s back, inclusive) and 10.4
    assert got == [1, 2, 3]
    plans.assert_no_row_python(out)
    # count shuffles with AQE off (AQE-on explain repeats exchanges
    # per consuming branch — CLAUDE.md invariant)
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out2 = op("rolling", df, {
            "group_by": ["k"], "window": 1,
            "aggregates": [{"function": "count", "alias": "n"}]},
            views={})
        plans.assert_max_shuffles(out2, 1)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


# -- time_weighted -----------------------------------------------------------


def test_time_weighted_grouped_basic(spark):
    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 10, 20.0), ("a", 30, 0.0),
         ("b", 5, 4.0),                      # single obs: span 0
         ("c", 0, 5.0), ("c", 0, 7.0), ("c", 10, 1.0),  # dup instant
         ("d", 0, None), ("d", 3, 6.0), ("d", 9, 0.0)],  # NULL excluded
        "k string, ts long, v double")
    got = {r["k"]: (r["n_obs"], r["span"], r["twa"]) for r in op(
        "time_weighted", df,
        {"value_field": "v", "group_by": ["k"]}, views={}).collect()}
    # a: 10*10 + 20*20 = 500 over span 30
    assert got["a"] == (3, 30, 500.0 / 30.0)
    assert got["b"] == (1, 0, None)
    # c: dup instant -> lower value holds 0s: 7*10 = 70 over 10
    assert got["c"] == (3, 10, 7.0)
    # d: NULL-value row excluded: 6*(9-3)=36 over 6
    assert got["d"] == (2, 6, 6.0)


def test_time_weighted_global_and_partition_invariance(spark):
    rows = [(i, float((i * 7) % 13)) for i in range(0, 400, 3)]
    df = spark.createDataFrame(rows, "ts long, v double")
    expected = None
    srt = sorted(rows)
    num = sum(v * (srt[i + 1][0] - t)
              for i, (t, v) in enumerate(srt[:-1]))
    span = srt[-1][0] - srt[0][0]
    expected = (len(rows), span, num / span)
    for parts in (1, 7, 32):
        got = op("time_weighted", df.repartition(parts),
                 {"value_field": "v", "n_partitions": parts},
                 views={}).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["n_obs"], r["span"], r["twa"]) == expected, parts


def test_time_weighted_timestamp_microseconds(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 2.0), ("a", 10.5, 4.0), ("a", 11.0, 0.0)],
        "k string, sec double, v double",
    ).select("k", "v", F.col("sec").cast("timestamp").alias("ts"))
    r = op("time_weighted", df,
           {"value_field": "v", "group_by": ["k"]}, views={}).collect()[0]
    # µs units: 2*500000 + 4*500000 = 3e6 over 1e6 -> 3.0
    assert r["span"] == 1_000_000
    assert r["twa"] == 3.0


def test_time_weighted_bucketed_clips_at_boundaries(spark):
    """Bucketed mode: a value holding across a bucket boundary
    weights each bucket by exactly the clipped duration; partial
    first/last buckets divide by covered time, not bucket width;
    duplicate instants contribute nothing."""
    df = spark.createDataFrame(
        [("a", 5, 10.0),     # holds [5,12): 5s in bucket 0, 2s in 10
         ("a", 12, 20.0),    # holds [12,25): 8s in 10, 5s in 20
         ("a", 25, 0.0),     # last: holds nothing
         ("b", 3, 4.0), ("b", 3, 6.0), ("b", 4, 1.0)],  # dup instant
        "k string, ts long, v double")
    got = {(r["k"], r["bucket"]): (r["n_obs"], r["covered"], r["twa"])
           for r in op("time_weighted", df,
                       {"value_field": "v", "group_by": ["k"],
                        "interval": 10}, views={}).collect()}
    assert got[("a", 0)] == (1, 5, 10.0)
    # bucket 10: 10*2 + 20*8 = 180 over 10s covered
    assert got[("a", 10)] == (2, 10, 18.0)
    assert got[("a", 20)] == (1, 5, 20.0)
    # b: only the 6-value holds (dup instant at 3 contributes 0-time)
    assert got[("b", 0)] == (1, 1, 6.0)
    assert len(got) == 4


def test_time_weighted_bucketed_timestamp_and_guard(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 2.0), ("a", 7200.0, 4.0), ("a", 7260.0, 0.0)],
        "k string, sec double, v double",
    ).select("k", "v", F.col("sec").cast("timestamp").alias("ts"))
    rows = op("time_weighted", df,
              {"value_field": "v", "group_by": ["k"],
               "interval": 3600}, views={}).collect()
    got = {r["bucket"]: (r["covered"], r["twa"],
                         str(r["bucket_ts"])) for r in rows}
    hour = 3600 * 1_000_000
    assert got[0] == (hour, 2.0, "1970-01-01 00:00:00")
    assert got[hour] == (hour, 2.0, "1970-01-01 01:00:00")
    assert got[2 * hour][0] == 60 * 1_000_000   # partial: 60s covered
    assert got[2 * hour][1] == 4.0
    # explosion guard fails loud
    import pyspark.errors
    with pytest.raises(Exception, match="max_buckets"):
        op("time_weighted", df,
           {"value_field": "v", "group_by": ["k"], "interval": 1,
            "max_buckets": 100}, views={}).collect()


def test_time_weighted_grouped_single_shuffle(spark):
    from blackroad_data_pipeline_spark.plans import quality as plans

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, ts long, v double")
    out = op("time_weighted", df, {"value_field": "v", "group_by": ["k"]},
             views={})
    plans.assert_no_row_python(out)
    plans.assert_max_shuffles(out, 1)


# -- time_rollup -------------------------------------------------------------


def test_time_rollup_two_granularities(spark):
    df = spark.createDataFrame(
        [("a", 3600, 1.0), ("a", 3700, 2.0), ("a", 90000, 4.0),
         ("b", 100, 8.0)],
        "k string, ts long, v double")
    out = {(r["granularity"], r["k"], r["bucket"]): (r["n"], r["sv"])
           for r in op("time_rollup", df, {
               "ts_field": "ts", "intervals": [3600, 86400],
               "group_by": ["k"],
               "aggregates": [{"function": "count", "alias": "n"},
                              {"field": "v", "function": "sum",
                               "alias": "sv"}]}, views={}).collect()}
    assert out[(3600, "a", 3600)] == (2, 3.0)
    assert out[(3600, "a", 90000)] == (1, 4.0)
    assert out[(86400, "a", 0)] == (2, 3.0)
    assert out[(86400, "a", 86400)] == (1, 4.0)
    assert out[(86400, "b", 0)] == (1, 8.0)
    assert len(out) == 6


def test_time_rollup_validation_and_exact_buckets(spark):
    df = spark.createDataFrame([(1, 1.0)], "ts long, v double")
    for bad in ([], [0, 3600], [3600, 3600]):
        with pytest.raises(ValueError):
            op("time_rollup", df, {"ts_field": "ts", "intervals": bad},
               views={})
    # integral ts bypasses the saturating roundtrip; bucket math is
    # exact long near 2^53 (the double floor(e/s)*s class of bug)
    e = (1 << 53) + 3
    big = spark.createDataFrame([(e,)], "ts long")
    r = op("time_rollup", big, {"ts_field": "ts", "intervals": [10]},
           views={}).select("bucket").collect()[0]  # bucket_ts saturates
    assert r["bucket"] == e - (e % 10)


def test_time_rollup_negative_epoch_buckets_replay_in_duckdb(spark):
    """ADVICE r7: the time_rollup/resample oracles bucketed with
    DuckDB `(e // step) * step`, which truncates toward zero
    (-7 // 2 = -3), while the operator floors via `e - pmod(e, step)`
    — divergent for pre-1970 epochs. The repaired oracle arithmetic
    `e - ((e % step) + step) % step` must replay the operator's floor
    buckets on NEGATIVE epochs too."""
    duckdb = pytest.importorskip("duckdb")

    rows = [-90000, -86400, -7, -1, 0, 1, 3599, 3600]
    df = spark.createDataFrame([(e,) for e in rows], "ts long")
    got = {(r["granularity"], r["bucket"]): r["n"]
           for r in op("time_rollup", df, {
               "ts_field": "ts", "intervals": [3600, 86400],
               "aggregates": [{"function": "count", "alias": "n"}]},
               views={}).collect()}
    want = {}
    con = duckdb.connect()
    for step in (3600, 86400):
        q = con.sql(
            f"SELECT e - ((e % {step}) + {step}) % {step} AS b, COUNT(*) "
            f"FROM (SELECT UNNEST({rows!r}) AS e) GROUP BY b").fetchall()
        for b, n in q:
            want[(step, b)] = n
    assert got == want
    # and the floor semantics themselves: -7 lands in bucket -3600
    assert got[(3600, -3600)] >= 2      # -7 and -1


def test_time_rollup_single_shuffle_plan(spark):
    from blackroad_data_pipeline_spark.plans import quality as plans

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, ts long, v double")
    out = op("time_rollup", df, {
        "ts_field": "ts", "intervals": [60, 3600, 86400],
        "group_by": ["k"]}, views={})
    plans.assert_no_row_python(out)
    plans.assert_max_shuffles(out, 1)


# -- NULL event-time contract (round-9 NULL-fixture sweep) ----------------------


def test_null_ts_excluded_from_asof(spark):
    """A NULL-ts right row must NOT become a carry candidate (Spark
    windows order NULLS FIRST, so before this contract it INVENTED a
    match for every left row preceding the first real right row), and
    NULL-ts left rows emit nothing even with how='left'."""
    trades = spark.createDataFrame(
        [("A", 10), ("A", None)], "sym string, tts long")
    quotes = spark.createDataFrame(
        [("A", None, 666.0), ("A", 20, 2.0)],
        "sym string, qts long, price double")
    out = op("asof_join", trades, {
        "right": quotes, "by": ["sym"], "left_ts": "tts",
        "right_ts": "qts", "values": ["price"], "how": "left"}, views={})
    rows = out.collect()
    # the NULL-ts trade is gone; the t=10 trade has no backward match
    # (the NULL-ts 666.0 quote must not carry into it)
    assert len(rows) == 1
    assert rows[0]["tts"] == 10 and rows[0]["r_price"] is None


def test_null_ts_excluded_from_sessions_and_sequences(spark):
    """sessionize / sequence_assemble / event_transitions drop NULL-ts
    events instead of seeding phantom sessions in NULLS-FIRST order."""
    e = spark.createDataFrame(
        [(1, 100, "u", "a"), (2, None, "u", "zzz"), (3, 1000, "u", "b")],
        "event_id long, ts long, user_id string, event_type string")
    sess = op("sessionize", e, {"ts_field": "ts", "key": "user_id",
                                "gap_seconds": 600,
                                "tiebreak": ["event_id"]})
    assert {r["event_id"] for r in sess.collect()} == {1, 3}
    seq = op("sequence_assemble", e, {
        "key": ["user_id"], "ts_field": "ts",
        "token_field": "event_type", "tiebreak": ["event_id"]},
        views={}).collect()
    assert seq[0]["sequence"] == "a b" and seq[0]["n_events"] == 2
    tr = op("event_transitions", e, {"key": "user_id"}).collect()
    assert {(r["src"], r["dst"]) for r in tr} == {("a", "b")}


def test_null_ts_excluded_from_resample_scd2_intervals(spark):
    """time_resample / scd2 / interval_merge exclude NULL event-times
    (and NULL interval endpoints) instead of emitting NULL buckets or
    phantom versions."""
    e = spark.createDataFrame(
        [(1, 0, "u", "a"), (2, None, "u", "b"), (3, 7200, "u", "c")],
        "event_id long, ts long, user_id string, event_type string")
    rs = op("time_resample", e, {
        "ts_field": "ts", "interval": 3600, "group_by": ["user_id"]},
        views={})
    assert {r["bucket"] for r in rs.collect()} == {0, 3600, 7200}
    sc = op("scd2", e, {"keys": ["user_id"], "ts_field": "ts",
                        "attrs": ["event_type"],
                        "tiebreak": ["event_id"]}, views={})
    assert [r["event_type"] for r in
            sorted(sc.collect(), key=lambda r: r["valid_from"])] == ["a", "c"]
    iv = spark.createDataFrame(
        [("u", 0, 10, 1), ("u", None, 99, 2), ("u", 5, None, 3),
         ("u", 8, 20, 4)],
        "k string, s long, e long, i long")
    m = op("interval_merge", iv, {
        "start_field": "s", "end_field": "e", "group_by": ["k"],
        "tiebreak": ["i"]}, views={}).collect()
    assert len(m) == 1 and m[0]["n_intervals"] == 2
    assert m[0]["island_start"] == 0 and m[0]["island_end"] == 20
