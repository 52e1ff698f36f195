"""Event-time operators over an activity stream: gap sessionization and
as-of joins.

A provenance/KG pipeline's upstream is an event log (pushes, CI runs,
crawl fetches); before events become activities you sessionize them
(burst detection, rate accounting) and align them against slowly-changing
context (which deploy / config / model version was live when the event
fired). Both are shuffle-shaped traps at 100 TB if written naively:

- sessionize: ONE shuffle — `Window.partitionBy(key).orderBy(ts)`; the
  gap flag is a `lag` diff, the session id a running SUM of flags over
  the same window (two window functions, one physical Exchange+Sort; no
  self-join, no global sort, hash-balanced across keys).
- asof_join: the classic scalable form — UNION the left and right
  streams tagged, ONE window over (key, ts, tag) with
  `last_value(ignorenulls)` carrying the most recent right-side row
  forward; cost = one shuffle of (key, ts, narrow payload). The naive
  range join (l.ts >= r.ts with a max-aggregate) explodes to O(|L|·|R|)
  pairs per key; this never materializes a pair. DuckDB validates the
  semantics with its NATIVE `ASOF JOIN` operator in the oracle twin.

Ties: a right row at exactly the left row's timestamp DOES match
(`ts_r <= ts_l`, DuckDB ASOF's `>=` convention); among equal-ts right
rows the LAST in (ts, tag, id) order wins deterministically because the
window orders on the full tiebreak key.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30  # Google-Analytics-style default inactivity gap


def _epoch(col: F.Column) -> F.Column:
    """Whole epoch seconds of a timestamp column. TIMESTAMP_NTZ won't cast
    straight to long (Spark 4); the hop through TIMESTAMP uses the
    session timezone, which this engine pins to UTC (session.py:52) — so
    a naive value means the same instant here and in the DuckDB twin's
    epoch()."""
    return col.cast("timestamp").cast("long")


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """(key, session_seq, n_events, started_at, ended_at, duration_sec).

    A session breaks when consecutive events of one key are more than
    `gap_min` minutes apart (strict >, so an event exactly at the gap
    continues the session). session_seq numbers a key's sessions from 1
    in time order — deterministic: the window orders on (ts, event_id)
    when an `event_id` column exists, so equal timestamps cannot flap."""
    extra_order = ["event_id"] if "event_id" in events.columns else []
    w = Window.partitionBy(key).orderBy(ts, *extra_order)
    gap_sec = gap_min * 60
    flagged = events.select(
        key, ts, *extra_order,
        F.when(
            _epoch(F.col(ts)) - F.lag(_epoch(F.col(ts))).over(w) > gap_sec,
            F.lit(1),
        ).otherwise(F.lit(0)).alias("is_break"),
    )
    # running sum of break flags over the SAME window spec: Catalyst plans
    # both window functions in one Exchange+Sort (no second shuffle)
    with_sess = flagged.select(
        key, ts,
        (F.sum("is_break").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) + 1).alias("session_seq"),
    )
    return with_sess.groupBy(key, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("started_at"),
        F.max(ts).alias("ended_at"),
        (F.max(_epoch(F.col(ts))) - F.min(_epoch(F.col(ts))))
        .alias("duration_sec"),
    )


def asof_join(left: DataFrame, right: DataFrame, key: str = "user_id",
              ts: str = "ts", right_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Left rows joined to the most recent right row with ts_r <= ts_l
    per key (null-padded when none precedes).

    Union-and-carry form: tag both inputs, one window over
    (key ORDER BY ts, tag, payload tiebreak) where right rows sort BEFORE
    left rows at equal ts (tag 0 < 1 — that is what makes the boundary
    inclusive), then `last(ignorenulls=True)` carries each right payload
    column forward; finally keep the left rows. One shuffle, zero pair
    explosion. Left payload columns RIDE THE UNION (null on right rows)
    rather than rejoining afterwards — a rejoin would need a
    deterministic row id, and `monotonically_increasing_id` is not
    stable across plan evaluations."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, ts)]
    left_extra = [c for c in left.columns if c not in (key, ts)]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    tagged_r = right.select(
        key,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_extra],
    )
    tagged_l = left.select(
        key, F.col(ts).alias("_ts"), F.lit(1).alias("_tag"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in right_cols],
        *left_extra,
    )
    unioned = tagged_r.unionByName(tagged_l)
    # deterministic total order: equal-(ts, tag) rows tiebreak on the
    # payload columns themselves, so the carried value cannot flap
    tiebreak = [F.col(f"_r_{c}") for c in right_cols]
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_tag"), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        key, "_ts", "_tag", *left_extra,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w)
            .alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_tag") == 1).select(
        key, F.col("_ts").alias(ts), *left_extra,
        *[f"{c}{suffix}" for c in right_cols],
    )


WINDOW_WIDTH_MIN = 60  # default tumbling-window width


def windowed_counts(events: DataFrame, key: str = "event_type",
                    ts: str = "ts", user: str = "user_id",
                    width_min: int = WINDOW_WIDTH_MIN) -> DataFrame:
    """(window_start_epoch, key, n_events, n_users, max_value) per
    tumbling event-time window — the rate/anomaly profile every event
    pipeline materializes. Built on F.window() (the SAME construct a
    readStream plan would use with a watermark, so this batch op is the
    streaming op's plan twin) → one hash-aggregate on (window, key);
    aggregates chosen order-independent (counts, distinct count, max) so
    the result is exactly reproducible at any partitioning — no double
    summation whose value depends on add order."""
    win = F.window(F.col(ts).cast("timestamp"), f"{width_min} minutes")
    return (
        events.groupBy(win.alias("win"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col(user)).alias("n_users"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("win.start").cast("long").alias("window_start_epoch"),
            key, "n_events", "n_users", "max_value",
        )
    )


def interval_join(intervals: DataFrame, points: DataFrame,
                  key: str | None = "user_id",
                  start: str = "start", end: str = "end",
                  ts: str = "ts",
                  bucket_sec: int = 600) -> DataFrame:
    """Match every point event to every interval containing it
    (start <= ts <= end, inclusive both ends), optionally within a key —
    the attribution/maintenance-window/incident-overlap join Spark has
    no native operator for.

    Scale shape: the naive formulation is a range join — Spark plans
    `l.start <= r.ts AND r.ts <= l.end` as a BroadcastNestedLoopJoin,
    O(|I|·|P|) per key. This operator bucketizes time instead: each
    interval explodes to the fixed-width buckets it covers (bounded by
    interval length / bucket_sec — callers size bucket_sec to the
    typical interval), each point maps to exactly ONE bucket, and the
    match becomes an EQUI-join on (key, bucket) + a residual range
    filter. A matching pair co-occurs in exactly the point's bucket, so
    no dedup step is needed. Cost: |I|·(avg buckets per interval) +
    |P| narrow rows through one hash join.

    Output: the interval's columns + the point's columns (caller
    pre-selects/aliases to avoid collisions; `key` appears once)."""
    b_start = f"cast(floor({_epoch_sql(start)} / {bucket_sec}) as long)"
    b_end = f"cast(floor({_epoch_sql(end)} / {bucket_sec}) as long)"
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.expr(f"sequence({b_start}, {b_end})")))
    pt = points.withColumn(
        "_bucket",
        F.expr(f"cast(floor({_epoch_sql(ts)} / {bucket_sec}) as long)"))
    on = ["_bucket"] if key is None else [key, "_bucket"]
    return (
        iv.join(pt, on)
        .where((F.col(start) <= F.col(ts)) & (F.col(ts) <= F.col(end)))
        .drop("_bucket")
    )


def _epoch_sql(col: str) -> str:
    """SQL-text twin of :func:`_epoch` for expression contexts."""
    return f"cast(cast({col} as timestamp) as long)"


FUNNEL_STAGES = ["view", "click", "purchase"]


def funnel_stages(events: DataFrame, stages: list[str] | None = None,
                  key: str = "user_id", ts: str = "ts",
                  etype: str = "event_type") -> DataFrame:
    """(user, reached, t1..tN) — ordered funnel analysis: how far each
    user progressed through the stage sequence, where stage k counts
    only if it happens strictly AFTER the chosen stage-(k-1) event
    (earliest-completion semantics: t1 = first stage-1 event, t2 =
    first stage-2 event after t1, ...). The product-analytics query
    warehouses answer daily.

    Scale shape: one filter to the stage types, one hash-aggregate per
    user collecting the (ts, stage) pairs SORTED (bounded by a user's
    stage-event count — the pagerank/BPE sorted-fold precedent), then
    the chain is a single fold expression: no self-join per stage (the
    naive form is N-1 range joins), no window. Epoch seconds keep the
    fold integer-exact."""
    stages = FUNNEL_STAGES if stages is None else stages
    n = len(stages)
    stage_case = "CASE " + " ".join(
        f"WHEN {etype} = '{s}' THEN {i + 1}" for i, s in enumerate(stages)
    ) + " END"
    init = ", ".join(
        f"cast(null as bigint) AS t{k}" for k in range(1, n + 1))
    # fold state: struct(t1..tN); an event advances stage k iff its
    # stage number is k, tk is unset, and t(k-1) is set and < ts
    upd = []
    for k in range(1, n + 1):
        prev_ok = ("true" if k == 1
                   else f"(acc.t{k - 1} IS NOT NULL AND acc.t{k - 1} < x.e)")
        upd.append(
            f"IF(x.s = {k} AND acc.t{k} IS NULL AND {prev_ok}, "
            f"x.e, acc.t{k}) AS t{k}")
    fold = (
        "aggregate(sort_array(collect_list(struct("
        f"{_epoch_sql(ts)} AS e, {stage_case} AS s))), "
        f"struct({init}), "
        f"(acc, x) -> struct({', '.join(upd)}))"
    )
    reached = "CASE " + " ".join(
        f"WHEN _f.t{k} IS NOT NULL THEN {k}"
        for k in range(n, 0, -1)
    ) + " ELSE 0 END"
    return (
        events.where(F.expr(f"{stage_case} IS NOT NULL"))
        .groupBy(F.col(key))
        .agg(F.expr(fold).alias("_f"))
        .select(
            key,
            F.expr(reached).cast("long").alias("reached"),
            *[F.col(f"_f.t{k}").cast("long").alias(f"t{k}")
              for k in range(1, n + 1)],
        )
    )


def retention_cohorts(events: DataFrame, key: str = "user_id",
                      ts: str = "ts", week_sec: int = 7 * 86400) -> DataFrame:
    """(cohort_week, week_offset, n_users) — classic retention: a user's
    cohort is their FIRST event week (epoch div week_sec); each later
    active week counts them once at its offset. Two hash-aggregates
    (first week per user; distinct (user, week)) and one narrow join —
    no window, no self-join; weeks are integer epoch buckets so both
    engines bucket identically (no timezone/week-start semantics)."""
    wk = f"cast({_epoch_sql(ts)} div {week_sec} as long)"
    first = (events.groupBy(F.col(key))
             .agg(F.min(F.expr(wk)).alias("cohort_week")))
    active = (events.select(F.col(key), F.expr(wk).alias("week"))
              .distinct())
    return (
        active.join(first, key)
        .groupBy("cohort_week",
                 (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct(F.col(key)).cast("long").alias("n_users"))
    )


def funnel_rates(events: DataFrame, stages: list[str] | None = None,
                 key: str = "user_id", ts: str = "ts",
                 etype: str = "event_type") -> DataFrame:
    """One row: (n_users, n_s1..n_sN, conv{k}_bp...) — the conversion
    report over funnel_stages: how many users reached each stage and
    the stage-to-stage conversion in integer basis points (exact long
    div). One extra sketch-sized aggregate over the per-user funnel."""
    stages = stages or FUNNEL_STAGES
    n = len(stages)
    f = funnel_stages(events, stages, key, ts, etype)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_users")]
    for k in range(1, n + 1):
        aggs.append(F.sum(F.when(F.col("reached") >= k, 1).otherwise(0))
                    .cast("long").alias(f"n_s{k}"))
    row = f.agg(*aggs)
    for k in range(2, n + 1):
        row = row.withColumn(
            f"conv{k}_bp",
            F.when(F.col(f"n_s{k - 1}") > 0,
                   F.expr(f"(n_s{k} * 10000) div n_s{k - 1}"))
            .cast("long"))
    return row


def scd2_intervals(events: DataFrame, key: str = "user_id",
                   ts: str = "ts", attr: str = "event_type") -> DataFrame:
    """(key, attr, valid_from, valid_to, is_current) — slowly-changing-
    dimension type-2 build from a change-event stream: consecutive
    equal values collapse, each run becomes one validity interval
    [valid_from, valid_to) half-open against the next change, the last
    run open-ended (NULL valid_to, is_current). ONE
    Window.partitionBy(key).orderBy(ts) carries the lag-change flag,
    the run id (running sum — same Exchange+Sort), and the lead
    boundary; then one hash-aggregate per run. Epoch-second integers."""
    w = Window.partitionBy(key).orderBy(ts)
    e = _epoch(F.col(ts))
    flagged = events.select(
        key, F.col(ts), F.col(attr).alias("_v"), e.alias("_e"),
        F.when(F.lag(F.col(attr)).over(w).isNull()
               | (F.lag(F.col(attr)).over(w) != F.col(attr)), 1)
        .otherwise(0).alias("_chg"),
    )
    # the running sum rides the SAME (key, ts) ordering as the lag flag
    # (ordering by the truncated epoch instead could disagree on
    # sub-second ties and corrupt run boundaries)
    runs = flagged.withColumn(
        "_run",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    # min(_v) == every _v in the run (runs are constant by construction);
    # min() keeps the aggregate order-insensitive
    per_run = (runs.groupBy(key, "_run")
               .agg(F.min("_e").alias("valid_from"),
                    F.min("_v").alias(attr)))
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return (per_run
            .select(key, attr, "valid_from",
                    F.lead("valid_from").over(w2).alias("valid_to"))
            .withColumn("is_current", F.col("valid_to").isNull()))


def window_anomalies(events: DataFrame, key: str = "event_type",
                     ts: str = "ts", width_min: int = 60,
                     k_bp: int = 20000) -> DataFrame:
    """(key, window_start_epoch, n_events, median_cnt, mad, is_anomaly)
    — robust rate-anomaly detection: a window is anomalous when its
    count deviates from the key's MEDIAN window count by more than
    (k_bp/10^4) × MAD (median absolute deviation). Median/MAD instead
    of mean/stddev: one traffic spike would drag a mean-based
    threshold toward itself; the breakdown point of the median is 50%.

    Exactness: counts are integers; the medians are rank-based lower
    medians over each key's window list (sorted fold over a
    dashboard-sized list — windows per key = time-range/width, bounded
    by the retention horizon, NOT by corpus size), so the verdict is
    integer-exact in both engines — no percentile approximation."""
    win = F.window(F.col(ts).cast("timestamp"), f"{width_min} minutes")
    counts = (
        events.groupBy(win.alias("win"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").cast("long")
                .alias("window_start_epoch"), key, "n_events")
    )
    med = ("element_at(array_sort(collect_list(n_events)), "
           "cast((size(collect_list(n_events)) + 1) / 2 as int))")
    stats = counts.groupBy(key).agg(F.expr(med).alias("median_cnt"))
    dev = (counts.join(stats, key)
           .withColumn("_ad", F.abs(F.col("n_events")
                                    - F.col("median_cnt"))))
    mad_e = ("element_at(array_sort(collect_list(_ad)), "
             "cast((size(collect_list(_ad)) + 1) / 2 as int))")
    mads = dev.groupBy(key).agg(F.expr(mad_e).alias("mad"))
    return (
        dev.join(mads, key)
        .select(
            key, "window_start_epoch", "n_events",
            F.col("median_cnt").cast("long").alias("median_cnt"),
            F.col("mad").cast("long").alias("mad"),
            (F.col("_ad") * 10000 > F.lit(k_bp) * F.col("mad"))
            .alias("is_anomaly"),
        )
    )


def hopping_counts(events: DataFrame, key: str = "event_type",
                   ts: str = "ts", width_min: int = 60,
                   slide_min: int = 15) -> DataFrame:
    """(window_start_epoch, key, n_events, max_value) per HOPPING
    (sliding) event-time window — width/slide overlapping windows, so
    each event contributes to width/slide of them (the smoothed rate
    curve dashboards draw; tumbling is the slide == width special
    case). F.window(slideDuration=...) plans the explode map-side —
    same one hash-aggregate as the tumbling op, input amplified by the
    overlap factor and nothing else."""
    win = F.window(F.col(ts).cast("timestamp"),
                   f"{width_min} minutes", f"{slide_min} minutes")
    return (
        events.groupBy(win.alias("win"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.max("value").alias("max_value"))
        .select(F.col("win.start").cast("long")
                .alias("window_start_epoch"),
                key, "n_events", "max_value")
    )
