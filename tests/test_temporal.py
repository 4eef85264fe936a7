"""As-of join and interval-overlap range join: hand-checked tie/null
semantics on tiny frames, corpus invariants, and plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gpt4ocontentextraction_spark.operators import temporal as T

SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double"
    )


def _t(minute, second=0, hour=12, day=1):
    return dt.datetime(2024, 1, day, hour, minute, second)


def test_asof_hand_semantics(spark):
    ev = _ev(
        spark,
        [
            # user 1: purchase, click after (attributed), click before (null)
            (1, _t(0), 1, "purchase", 10.0),
            (2, _t(5), 1, "click", 1.0),
            (3, _t(0, 0, hour=11), 1, "click", 2.0),
            # equal-ts click and purchase: ts >= ts attributes (side order)
            (4, _t(30), 1, "purchase", 20.0),
            (5, _t(30), 1, "click", 3.0),
            # two purchases at the SAME instant: max event_id wins
            (6, _t(40), 2, "purchase", 5.0),
            (7, _t(40), 2, "purchase", 6.0),
            (8, _t(45), 2, "click", 4.0),
            # a later purchase must not attribute backwards
            (9, _t(50), 2, "purchase", 7.0),
        ],
    )
    out = {r["click_id"]: r for r in T.asof_attribution(ev).collect()}
    assert len(out) == 4
    assert out[2]["purchase_id"] == 1 and out[2]["gap_us"] == 5 * 60_000_000
    assert out[3]["purchase_id"] is None and out[3]["gap_us"] is None
    assert out[5]["purchase_id"] == 4 and out[5]["gap_us"] == 0
    r8 = out[8]
    assert r8["purchase_id"] == 7  # max event_id at the tied instant
    assert r8["purchase_value"] == 6.0
    assert r8["gap_us"] == 5 * 60_000_000  # not the later purchase (id 9)


def test_asof_corpus_invariants(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = T.asof_attribution(ev).collect()
    n_clicks = ev.where(F.col("event_type") == "click").count()
    assert len(rows) == n_clicks  # LEFT semantics: every click kept
    matched = [r for r in rows if r["purchase_id"] is not None]
    assert matched and len(matched) < len(rows)  # both classes occur
    for r in matched:
        assert r["gap_us"] >= 0
        assert r["purchase_us"] <= r["click_us"]


def test_promo_overlap_hand_semantics(spark):
    ev = _ev(
        spark,
        [
            # user 1: one session 11:55 -> 12:25 (events 5 min apart),
            # overlap with the 12:00-14:00 window = 25 min
            (1, _t(55, hour=11), 1, "view", 0.0),
            (2, _t(0, hour=12), 1, "view", 0.0),
            (3, _t(5, hour=12), 1, "view", 0.0),
            (4, _t(10, hour=12), 1, "view", 0.0),
            (5, _t(15, hour=12), 1, "view", 0.0),
            (6, _t(20, hour=12), 1, "view", 0.0),
            (7, _t(25, hour=12), 1, "view", 0.0),
            # user 2: session entirely outside the window -> no row
            (8, _t(0, hour=9), 2, "view", 0.0),
            (9, _t(5, hour=9), 2, "view", 0.0),
            # user 3: zero-length session inside the window -> overlap 0,
            # excluded by the strict > 0 rule
            (10, _t(30, hour=13), 3, "view", 0.0),
        ],
    )
    rows = T.session_promo_overlap(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1 and r["n_events"] == 7
    assert r["overlap_us"] == 25 * 60_000_000


def test_promo_overlap_midnight_spanning_session(spark):
    # one session from day-1 13:50 to day-2 12:10 (continuous 9-minute
    # steps): overlaps day 1's window by 10 min and day 2's by 10 min
    start = dt.datetime(2024, 1, 1, 13, 50)
    rows = [
        (i, start + dt.timedelta(minutes=9 * i), 1, "view", 0.0)
        for i in range(150)  # 149*9 = 1341 min -> ends 12:11 next day
    ]
    out = T.session_promo_overlap(_ev(spark, rows)).collect()
    days = {r["day_idx"]: r for r in out}
    assert len(out) == 2 and len(days) == 2
    lo, hi = sorted(days)
    assert hi == lo + 1
    assert days[lo]["overlap_us"] == 10 * 60_000_000  # 13:50 -> 14:00
    # day 2: window opens 12:00, session ends 12:11
    assert days[hi]["overlap_us"] == 11 * 60_000_000


def test_temporal_plan_shape(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    for df in (T.asof_attribution(ev), T.session_promo_overlap(ev)):
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p  # grain join is equality
        assert "Window" in p  # the ordered-carry / islands form
    # the promo side is tiny and must broadcast
    p = (
        T.session_promo_overlap(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p
