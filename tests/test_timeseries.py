"""timeseries.py: gap sessionization and as-of join — hand-computed
goldens on crafted timelines plus the union-and-carry invariants (ties,
boundary inclusivity, null padding, left-payload carriage)."""
from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from git_prov_spark.timeseries import asof_join, sessionize


def _ts(minute, second=0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


@pytest.fixture(scope="module")
def timeline(spark):
    # user 1: events at 0, 10, 29, 70, 95 min → sessions {0,10,29}, {70,95}
    #   (29→70 is 41 min > 30; 70→95 is 25 min ≤ 30)
    # user 2: single event
    # user 3: two events exactly 30 min apart → ONE session (strict >)
    rows = [
        (100, _ts(0), 1), (101, _ts(10), 1), (102, _ts(29), 1),
        (103, _ts(70), 1), (104, _ts(95), 1),
        (200, _ts(5), 2),
        (300, _ts(0), 3), (301, _ts(30), 3),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long")


def test_sessionize_golden(timeline):
    got = {(r.user_id, r.session_seq): (r.n_events, r.duration_sec)
           for r in sessionize(timeline).collect()}
    assert got == {
        (1, 1): (3, 29 * 60), (1, 2): (2, 25 * 60),
        (2, 1): (1, 0),
        (3, 1): (2, 30 * 60),  # exactly the gap continues the session
    }


def test_sessionize_gap_param(timeline):
    # with a 20-min gap user 1 splits further: consecutive diffs are
    # 10, 19, 41, 25 min → {0,10,29}, {70}, {95}
    got = {(r.user_id, r.session_seq): r.n_events
           for r in sessionize(timeline, gap_min=20).collect() if r.user_id == 1}
    assert got == {(1, 1): 3, (1, 2): 1, (1, 3): 1}


def test_asof_golden(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 11), (1, 50, 12), (2, 100, 13)],
        "user_id long, ts long, event_id long")
    right = spark.createDataFrame(
        [(1, 100, 7.0), (1, 150, 8.0), (2, 500, 9.0)],
        "user_id long, ts long, value double")
    got = {r.event_id: r.value_asof
           for r in asof_join(left, right, key="user_id", ts="ts").collect()}
    assert got[10] == 7.0     # boundary inclusive: ts_r == ts_l matches
    assert got[11] == 8.0     # most recent prior wins, not first
    assert got[12] is None    # nothing precedes → null-padded
    assert got[13] is None    # right row is in the future
    # left payload columns survive the union-and-carry round trip
    rows = asof_join(left, right, key="user_id", ts="ts").collect()
    assert {r.event_id for r in rows} == {10, 11, 12, 13}


def test_asof_partitioning_invariant(spark):
    left = spark.createDataFrame(
        [(u, t, u * 1000 + t) for u in (1, 2, 3) for t in (5, 10, 20, 40)],
        "user_id long, ts long, event_id long")
    right = spark.createDataFrame(
        [(u, t, float(u + t)) for u in (1, 2, 3) for t in (1, 8, 30)],
        "user_id long, ts long, value double")
    a = sorted(map(tuple, asof_join(left, right).collect()))
    b = sorted(map(tuple,
                   asof_join(left.repartition(7), right.repartition(3))
                   .collect()))
    assert a == b


def test_asof_no_cartesian(spark):
    left = spark.createDataFrame([(1, 10, 1)],
                                 "user_id long, ts long, event_id long")
    right = spark.createDataFrame([(1, 5, 1.0)],
                                  "user_id long, ts long, value double")
    plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_windowed_counts_golden(spark):
    from git_prov_spark.timeseries import windowed_counts
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 5, "click", 2.0),
        (2, datetime(2024, 1, 1, 0, 50), 5, "click", 7.0),
        (3, datetime(2024, 1, 1, 0, 55), 6, "view", 1.0),
        (4, datetime(2024, 1, 1, 1, 5), 5, "click", 3.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = {(r.window_start_epoch, r.event_type):
           (r.n_events, r.n_users, r.max_value)
           for r in windowed_counts(ev).collect()}
    h0 = int(datetime(2024, 1, 1, 0, 0).timestamp())
    h1 = h0 + 3600
    assert got == {
        (h0, "click"): (2, 1, 7.0),
        (h0, "view"): (1, 1, 1.0),
        (h1, "click"): (1, 1, 3.0),
    }


# ---------------------------------------------------------------------------
# interval join


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, iid long, start timestamp, end timestamp")


def _pt(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, pid long, ts timestamp")


def test_interval_join_matches_naive_range_join(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import interval_join

    t0 = datetime(2024, 1, 1)
    ivs, pts = [], []
    for u in range(4):
        for i in range(6):
            s = t0 + timedelta(minutes=17 * i + u)
            ivs.append((u, u * 100 + i, s, s + timedelta(minutes=25)))
        for p in range(30):
            pts.append((u, u * 1000 + p, t0 + timedelta(minutes=4 * p)))
    ivdf, ptdf = _iv(spark, ivs), _pt(spark, pts)
    got = sorted((r.user_id, r.iid, r.pid)
                 for r in interval_join(ivdf, ptdf).collect())
    want = sorted(
        (u, i, p)
        for (u, i, s, e) in ivs
        for (u2, p, t) in pts
        if u == u2 and s <= t <= e)
    assert got == want and got  # non-vacuous


def test_interval_join_boundaries_inclusive_and_cross_bucket(spark):
    from datetime import datetime

    from git_prov_spark.timeseries import interval_join

    # interval spans many 600s buckets; points at exact start/end match
    s, e = datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 2, 0, 0)
    ivdf = _iv(spark, [(1, 1, s, e)])
    ptdf = _pt(spark, [
        (1, 1, s), (1, 2, e),
        (1, 3, datetime(2024, 1, 1, 1, 0, 0)),
        (1, 4, datetime(2024, 1, 1, 2, 0, 1)),   # just outside
        (2, 5, datetime(2024, 1, 1, 1, 0, 0)),   # other key
    ])
    got = sorted(r.pid for r in interval_join(ivdf, ptdf).collect())
    assert got == [1, 2, 3]


def test_interval_join_keyless_and_plan_is_equijoin(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import interval_join

    t0 = datetime(2024, 1, 1)
    ivdf = _iv(spark, [(9, 1, t0, t0 + timedelta(minutes=30))])
    ptdf = _pt(spark, [(7, 1, t0 + timedelta(minutes=10)),
                       (8, 2, t0 + timedelta(hours=2))])
    out = interval_join(ivdf.drop("user_id"),
                        ptdf.withColumnRenamed("user_id", "puser"),
                        key=None)
    assert [r.pid for r in out.collect()] == [1]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# funnel + retention


def test_funnel_earliest_completion_semantics(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import funnel_stages

    t0 = datetime(2024, 1, 1)

    def ev(u, mins, et):
        return (u, t0 + timedelta(minutes=mins), et)

    rows = [
        # full funnel in order
        ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "purchase"),
        # click BEFORE first view: does not count -> stage 1 only
        ev(2, 0, "click"), ev(2, 1, "view"),
        # purchase without click: stage 1 (view) only
        ev(3, 0, "view"), ev(3, 1, "purchase"),
        # later click rescues: view@0, click@5, purchase@6 -> 3
        ev(4, 0, "view"), ev(4, 1, "purchase"), ev(4, 5, "click"),
        ev(4, 6, "purchase"),
        # no funnel-stage events at all -> absent from output
        (5, t0, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {r.user_id: r for r in funnel_stages(df).collect()}
    assert out[1].reached == 3
    assert out[2].reached == 1 and out[2].t2 is None
    assert out[3].reached == 1
    assert out[4].reached == 3
    # t2 is the FIRST click after t1, t3 the first purchase after t2
    assert out[4].t2 - out[4].t1 == 300 and out[4].t3 - out[4].t2 == 60
    assert 5 not in out


def test_funnel_repartition_invariant(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import funnel_stages

    t0 = datetime(2024, 1, 1)
    rows = [(i % 9, t0 + timedelta(minutes=i),
             ["view", "click", "purchase"][(i * 7) % 3])
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    x = sorted(map(tuple, funnel_stages(df).collect()))
    y = sorted(map(tuple, funnel_stages(df.repartition(7)).collect()))
    assert x == y


def test_retention_cohorts_hand_computed(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import retention_cohorts

    t0 = datetime(2024, 1, 4)  # within epoch week w0
    w = timedelta(days=7)
    rows = [
        (1, t0), (1, t0 + w), (1, t0 + 3 * w),   # cohort w, offsets 0,1,3
        (2, t0), (2, t0 + w),                    # offsets 0,1
        (3, t0 + w),                             # cohort w+1, offset 0
        (1, t0 + timedelta(minutes=5)),          # same week dup -> once
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in retention_cohorts(df).collect()}
    base = min(k[0] for k in out)
    assert out[(base, 0)] == 2
    assert out[(base, 1)] == 2
    assert out[(base, 3)] == 1
    assert out[(base + 1, 0)] == 1
    assert len(out) == 4


def test_funnel_rates_hand_computed(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import funnel_rates

    t0 = datetime(2024, 1, 1)
    rows = []
    # 4 users reach stage 1; 2 reach stage 2; 1 reaches stage 3
    for u in range(4):
        rows.append((u, t0, "view"))
    for u in range(2):
        rows.append((u, t0 + timedelta(minutes=1), "click"))
    rows.append((0, t0 + timedelta(minutes=2), "purchase"))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    r = funnel_rates(df).collect()[0]
    assert (r.n_users, r.n_s1, r.n_s2, r.n_s3) == (4, 4, 2, 1)
    assert r.conv2_bp == 5000 and r.conv3_bp == 5000


def test_scd2_intervals_runs_and_boundaries(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import scd2_intervals

    t0 = datetime(2024, 1, 1)
    rows = [(1, t0, "a"), (1, t0 + timedelta(days=1), "a"),
            (1, t0 + timedelta(days=2), "b"),
            (1, t0 + timedelta(days=3), "a"),
            (2, t0, "x")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = sorted(
        ((r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current)
         for r in scd2_intervals(df).collect()))
    e0 = 1704067200  # 2024-01-01T00:00:00Z (session timezone is UTC)
    day = 86400
    assert out == [
        (1, "a", e0, e0 + 2 * day, False),       # run collapses 2 events
        (1, "a", e0 + 3 * day, None, True),      # value returns -> new run
        (1, "b", e0 + 2 * day, e0 + 3 * day, False),
        (2, "x", e0, None, True),
    ]


def test_window_anomalies_flags_spike_only(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import window_anomalies

    t0 = datetime(2024, 1, 1)
    rows = []
    # 9 calm hours of 4 events, one hour with 40 (the spike)
    eid = 0
    for h in range(10):
        burst = 40 if h == 5 else 4
        for i in range(burst):
            rows.append((eid, t0 + timedelta(hours=h, seconds=i), 1, "a",
                         1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    out = window_anomalies(df).collect()
    flagged = [r for r in out if r.is_anomaly]
    assert len(flagged) == 1 and flagged[0].n_events == 40
    assert all(r.median_cnt == 4 and r.mad == 0 for r in out)


def test_hopping_counts_amplification_and_tumbling_special_case(spark):
    from datetime import datetime, timedelta

    from git_prov_spark.timeseries import hopping_counts, windowed_counts

    t0 = datetime(2024, 1, 1, 0, 37)  # mid-window
    df = spark.createDataFrame(
        [(1, t0, 1, "a", 5.0),
         (2, t0 + timedelta(minutes=1), 2, "a", 9.0)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")
    hop = hopping_counts(df).collect()
    # each event lands in exactly width/slide = 4 windows; both events
    # share all 4 (1 minute apart, same 15-min mark)
    assert len(hop) == 4
    assert all(r.n_events == 2 and r.max_value == 9.0 for r in hop)
    starts = sorted(r.window_start_epoch for r in hop)
    assert [s - starts[0] for s in starts] == [0, 900, 1800, 2700]
    # slide == width degenerates to the tumbling op's counts
    tumb = {(r.window_start_epoch, r.event_type): r.n_events
            for r in windowed_counts(df).collect()}
    hop60 = {(r.window_start_epoch, r.event_type): r.n_events
             for r in hopping_counts(df, slide_min=60).collect()}
    assert hop60 == tumb
