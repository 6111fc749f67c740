"""Windowed dedup / conditional upsert / as-of suite queries
(SURVEY.md §2.5 W1-W2, §2.3 J6, §2.8 extension: tumbling windows).

Timestamps are emitted as formatted strings (micros precision) so the
cross-engine hash is representation-stable; the DuckDB oracle casts its
nanosecond timestamps to TIMESTAMP (microseconds, truncating) which
matches the catalog's ns→us truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.operators.dedup import latest_wins, merge_upsert
from seng550_a3_etl_spark.operators.joins import asof_join
from seng550_a3_etl_spark.suite.registry import query

# Canonical formats live in shared_sql (streaming twins share them);
# the underscore aliases predate that and are kept for local use.
from seng550_a3_etl_spark.suite.shared_sql import (  # noqa: E402
    CDC_APPLY_ORACLE,
    TS_FMT as _TS_FMT,
    TS_FMT_DUCK as _TS_FMT_DUCK,
)


@query(
    "latest_event_per_user",
    oracle=f"""
    SELECT user_id, event_id, event_type,
           strftime(CAST(ts AS TIMESTAMP), '{_TS_FMT_DUCK}') AS ts_str
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: DISTINCT ON latest-wins dedup (queries.py:133,150) — keep each
    user's most recent event, event_id as deterministic tiebreak."""
    t = load_tables(spark, sf_dir)
    return latest_wins(
        t.events, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", _TS_FMT).alias("ts_str"),
    )


@query(
    "merge_upsert_events",
    oracle=f"""
    WITH source AS (
      SELECT event_id,
             CASE WHEN event_id % 20 = 0
                  THEN CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR
                  ELSE CAST(ts AS TIMESTAMP) - INTERVAL 1 HOUR END AS ts,
             user_id, 'updated' AS event_type, value + 1000 AS value, props
      FROM events WHERE event_id % 10 = 0
    ),
    unioned AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
             value, props, 0 AS prec
      FROM events
      UNION ALL
      SELECT event_id, ts, user_id, event_type, value, props, 1 FROM source
    )
    SELECT event_id, event_type,
           strftime(ts, '{_TS_FMT_DUCK}') AS ts_str,
           ROUND(value, 4) AS value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_id ORDER BY ts DESC, prec ASC
      ) AS rn
      FROM unioned
    ) WHERE rn = 1
    """,
)
def merge_upsert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: conditional upsert with the strictly-newer guard
    (queries.py:151-160). The source is a deterministic mutation of every
    10th event: ids divisible by 20 are *fresher* (+1h, must replace the
    target), the rest are *staler* (-1h, must lose to the guard)."""
    t = load_tables(spark, sf_dir)
    source = t.events.filter(F.col("event_id") % 10 == 0).select(
        "event_id",
        F.when(
            F.col("event_id") % 20 == 0,
            F.col("ts") + F.expr("INTERVAL 1 HOUR"),
        )
        .otherwise(F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        .alias("ts"),
        "user_id",
        F.lit("updated").alias("event_type"),
        (F.col("value") + 1000).alias("value"),
        "props",
    )
    merged = merge_upsert(t.events, source, keys=["event_id"], version_col="ts")
    return merged.select(
        "event_id",
        "event_type",
        F.date_format("ts", _TS_FMT).alias("ts_str"),
        F.round("value", 4).alias("value"),
    )


@query(
    "asof_signup_for_purchase",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    s0 AS (
      SELECT event_id AS signup_id, user_id, CAST(ts AS TIMESTAMP) AS sts
      FROM events WHERE event_type = 'signup'
    ),
    s AS (
      SELECT signup_id, user_id, sts FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, sts ORDER BY signup_id DESC
        ) AS rn FROM s0
      ) WHERE rn = 1
    )
    SELECT p.purchase_id, p.user_id, s.signup_id,
           strftime(s.sts, '{_TS_FMT_DUCK}') AS signup_ts
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.pts >= s.sts
    """,
)
def asof_signup_for_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: the reference's unfinished lateral top-1 join (queries.py:164-191)
    finished as a scalable as-of join — for each purchase, the same user's
    most recent signup at-or-before the purchase time. Signups are deduped
    per (user, ts) first so both engines break ties identically."""
    t = load_tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    signups = latest_wins(
        t.events.filter(F.col("event_type") == "signup").select(
            F.col("event_id").alias("signup_id"),
            "user_id",
            F.col("ts").alias("sts"),
        ),
        ["user_id", "sts"],
        [F.desc("signup_id")],
    )
    joined = asof_join(
        purchases, signups, by=["user_id"], left_ts="pts", right_ts="sts"
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "signup_id",
        F.date_format("sts", _TS_FMT).alias("signup_ts"),
    )


@query(
    "hourly_event_windows",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)),
                    '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (SURVEY §2.8: the batch face of the
    Structured Streaming windowed count; F.window is the same operator the
    streaming path uses with a watermark)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_event_windows",
    oracle=f"""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    offs(k) AS (VALUES (0), (1))
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts) - k * INTERVAL 1 HOUR,
                    '{_TS_FMT_DUCK}') AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM e CROSS JOIN offs
    GROUP BY 1
    """,
)
def sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — 2-hour windows every hour, so each
    event lands in exactly two overlapping windows. The streaming-native
    smoothing operator (same F.window the tumbling query uses, plus a
    slide); the oracle replays the expansion as a 2-offset cross join.

    Scale: Spark expands each row into size/slide = 2 window rows before
    the hash agg — state and shuffle are 2× the tumbling case, bounded
    and predictable (vs an unbounded self-join formulation).
    """
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "session_window_stats",
    oracle=f"""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    lagged AS (
      SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM o
    ),
    flagged AS (
      SELECT *, CASE WHEN prev IS NULL
                       OR ts > prev + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ),
    sess AS (
      SELECT *, SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '{_TS_FMT_DUCK}')
             AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via the BUILT-IN F.session_window operator (the
    operator X11 hand-builds with lag+running-sum; this is the form that
    transfers directly to Structured Streaming state). Boundary
    semantics pinned empirically: an event exactly gap-after the
    previous one MERGES (new session only when the gap strictly
    exceeds 30 min), and session_end = last event + gap — the oracle
    encodes both.

    Scale: one shuffle on user_id; Spark merges candidate [ts, ts+gap)
    windows in a sort within each partition, state O(sessions), not
    O(events).
    """
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            F.date_format(F.col("w.end"), _TS_FMT).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "top_user_per_event_type",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id, COUNT(*) AS n_events
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type, n_events, user_id AS top_user
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY n_events DESC, user_id DESC
      ) AS rn FROM per_user
    ) WHERE rn = 1
    """,
)
def top_user_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max per group (O3's top-1 generalized): the most active user
    per event type via struct-max — max over (n_events, user_id) pairs
    orders lexicographically, making the tie-break explicit where
    max_by's is unspecified.

    Scale: struct-max is an ordinary partial+final aggregate — each
    group folds to ONE row map-side (vs the window formulation, which
    shuffles every per-user row and sorts). The oracle keeps the
    window form, proving the two formulations agree.
    """
    t = load_tables(spark, sf_dir)
    per_user = t.events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        per_user.groupBy("event_type")
        .agg(F.max(F.struct("n_events", "user_id")).alias("m"))
        .select(
            "event_type",
            F.col("m.n_events").alias("n_events"),
            F.col("m.user_id").alias("top_user"),
        )
    )


@query(
    "customer_segment_history",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type AS segment, CAST(ts AS TIMESTAMP) AS ts,
             event_id
      FROM events
    ),
    lagged AS (
      SELECT *, LAG(segment) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
      ) AS prev_seg
      FROM e
    ),
    changes AS (
      SELECT user_id, segment, ts FROM lagged
      WHERE prev_seg IS NULL OR segment != prev_seg
    )
    SELECT user_id, segment,
           strftime(ts, '{_TS_FMT_DUCK}') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, segment),
                    '{_TS_FMT_DUCK}') AS valid_to,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, segment)
                IS NULL THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
)
def customer_segment_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event log: collapse consecutive
    duplicate states per user (run-length compression via lag-compare),
    then derive [valid_from, valid_to) validity intervals with lead —
    the slowly-changing-dimension table a warehouse derives from CDC.

    Scale: both windows and the filter share ONE user-key shuffle (the
    change-point filter runs between two window functions over the same
    partitioning, so Catalyst plans a single Exchange); output size is
    |state changes|, typically ≪ |events|.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        t.events.select(
            "user_id",
            F.col("event_type").alias("segment"),
            "ts",
            "event_id",
        )
        .withColumn("prev_seg", F.lag("segment").over(w))
        .filter(
            F.col("prev_seg").isNull()
            | (F.col("segment") != F.col("prev_seg"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "segment")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "segment",
        F.date_format("ts", _TS_FMT).alias("valid_from"),
        F.date_format(nxt, _TS_FMT).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "user_sessions",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events
    ),
    lagged AS (
      SELECT *, LAG(ts) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
      ) AS prev
      FROM o
    ),
    flagged AS (
      SELECT *, CASE WHEN prev IS NULL
                       OR ts > prev + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ),
    sess AS (
      SELECT *, CAST(SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts), '{_TS_FMT_DUCK}') AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM sess GROUP BY user_id, session_seq
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): lag-flag +
    running-sum session numbering, then per-session aggregates — the
    batch twin of the applyInPandasWithState streaming operator
    (streaming/jobs.py:sessionize_stream)."""
    from seng550_a3_etl_spark.operators.sessionize import session_stats

    t = load_tables(spark, sf_dir)
    out = session_stats(
        t.events, "user_id", "ts", "value",
        gap="30 minutes", tiebreak=["event_id"],
    )
    return out.select(
        "user_id",
        "session_seq",
        F.date_format("session_start", _TS_FMT).alias("session_start"),
        F.date_format("session_end", _TS_FMT).alias("session_end"),
        "n_events",
        F.round("total_value", 4).alias("total_value"),
    )


@query(
    "event_gaps_quartiles",
    oracle=f"""
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP))
             - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
           LEAD(event_type) OVER w AS next_type,
           NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id)
             AS value_quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def event_gaps_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation + distribution windows (lead/lag/ntile): per-user
    inter-event gap in microseconds, the following event's type, and
    the event's value quartile within the user — the window surface a
    feature-engineering pipeline derives from an event stream.

    Scale: all three windows share the user_id partitioning, so Spark
    computes them in ONE shuffle + two sorts within each partition (ts
    order and value order). gap is integer microseconds — exact in both
    engines, no float time arithmetic.
    """
    t = load_tables(spark, sf_dir)
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    us = F.unix_micros("ts")
    return t.events.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w_ts)).alias("gap_us"),
        F.lead("event_type").over(w_ts).alias("next_type"),
        F.ntile(4).over(w_val).alias("value_quartile"),
    )


@query(
    "events_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT event_id, value FROM events
      WHERE (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT) % 7 != 0
    ),
    new AS (
      SELECT event_id,
             CASE WHEN (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT) % 5 = 0 THEN value * 2 ELSE value END AS value
      FROM events
      WHERE (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT) % 11 != 0
    )
    SELECT COALESCE(o.event_id, n.event_id) AS event_id,
           CASE WHEN o.event_id IS NULL THEN 'added'
                WHEN n.event_id IS NULL THEN 'removed'
                WHEN o.value = n.value THEN 'unchanged'
                ELSE 'changed' END AS status,
           ROUND(o.value, 4) AS old_value,
           ROUND(n.value, 4) AS new_value
    FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
    """,
)
def events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (added/removed/changed/unchanged) between two
    deterministic variants of the events table — the pipeline-regression
    check, and the suite's full-outer-join exercise (absent from the
    reference, exposed by the engine per SURVEY §2.3). One full-outer
    shuffle join on the key; change detection is a null-safe column
    compare, no hashing pass."""
    from seng550_a3_etl_spark.functions.hashing import hash64
    from seng550_a3_etl_spark.operators.dedup import snapshot_diff

    t = load_tables(spark, sf_dir)
    h = lambda: hash64(F.col("event_id").cast("string"))  # noqa: E731
    old = t.events.filter(h() % 7 != 0).select("event_id", "value")
    new = t.events.filter(h() % 11 != 0).select(
        "event_id",
        F.when(h() % 5 == 0, F.col("value") * 2)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    out = snapshot_diff(old, new, ["event_id"], ["value"])
    return out.select(
        "event_id",
        "status",
        F.round("old_value", 4).alias("old_value"),
        F.round("new_value", 4).alias("new_value"),
    )


@query(
    "user_funnel",
    oracle=f"""
    WITH v AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
               FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t1
          GROUP BY 1),
    p AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t2
          GROUP BY 1),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id,
           CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage,
           strftime(t1, '{_TS_FMT_DUCK}') AS view_ts,
           strftime(t2, '{_TS_FMT_DUCK}') AS click_ts,
           strftime(t3, '{_TS_FMT_DUCK}') AS purchase_ts
    FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)
    """,
)
def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (X67): per user, the first view, the first click
    STRICTLY after it, and the first purchase strictly after that —
    staged conversion over an event stream.

    Spark-first shape: ONE user-key shuffle — events collect into a
    sorted array per user and a single ``F.aggregate`` fold walks the
    sequence with a (stage, t1, t2, t3) struct accumulator. The oracle
    computes the same funnel as three chained stepwise MIN aggregates
    (the relational form, 3 shuffles) — the equivalence of the two
    formulations is exactly what the hash check proves. Strict-ts
    advancement makes tie order irrelevant, so both engines agree
    bit-for-bit.

    Scale: map-side partial collect keeps the shuffle at |user events|;
    the fold is O(events/user) with constant state. The stepwise form
    re-scans events per stage — at 100 TB the one-pass fold wins by
    stage count."""
    t = load_tables(spark, sf_dir)
    evs = F.array_sort(
        F.collect_list(
            F.struct(F.col("ts"), F.col("event_type").alias("et"))
        )
    )
    acc0 = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )

    def step(acc, e):
        adv1 = (acc["stage"] == 0) & (e["et"] == "view")
        adv2 = (
            (acc["stage"] == 1)
            & (e["et"] == "click")
            & (e["ts"] > acc["t1"])
        )
        adv3 = (
            (acc["stage"] == 2)
            & (e["et"] == "purchase")
            & (e["ts"] > acc["t2"])
        )
        return F.struct(
            F.when(adv1, F.lit(1))
            .when(adv2, F.lit(2))
            .when(adv3, F.lit(3))
            .otherwise(acc["stage"])
            .alias("stage"),
            F.when(adv1, e["ts"]).otherwise(acc["t1"]).alias("t1"),
            F.when(adv2, e["ts"]).otherwise(acc["t2"]).alias("t2"),
            F.when(adv3, e["ts"]).otherwise(acc["t3"]).alias("t3"),
        )

    folded = (
        t.events.groupBy("user_id")
        .agg(evs.alias("__evs"))
        .select("user_id", F.aggregate("__evs", acc0, step).alias("f"))
    )
    return folded.select(
        "user_id",
        F.col("f.stage").cast("long").alias("funnel_stage"),
        F.date_format("f.t1", _TS_FMT).alias("view_ts"),
        F.date_format("f.t2", _TS_FMT).alias("click_ts"),
        F.date_format("f.t3", _TS_FMT).alias("purchase_ts"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH signup AS (
      SELECT user_id,
             date_trunc('month', MIN(CAST(ts AS TIMESTAMP))) AS cohort
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             date_trunc('month', CAST(e.ts AS TIMESTAMP)) AS m
      FROM events e JOIN signup s USING (user_id)
      WHERE date_trunc('month', CAST(e.ts AS TIMESTAMP)) >= s.cohort
    )
    SELECT strftime(s.cohort, '%Y-%m') AS cohort_month,
           CAST(date_diff('month', s.cohort, a.m) AS BIGINT)
             AS months_since_signup,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN signup s USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (X68): users grouped by signup month; for each
    cohort and month-offset since signup, how many distinct users were
    active — the classic retention triangle, the funnel's companion.

    Scale: ONE user-key shuffle derives both the cohort (min signup ts)
    and the distinct active-month set in the same aggregate (collect_set
    of month truncations — bounded by calendar months, not events), then
    an explode + (cohort, offset) count. Month arithmetic is integer
    (12*year + month deltas), so both engines agree exactly."""
    t = load_tables(spark, sf_dir)
    per_user = (
        t.events.groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    F.col("event_type") == "signup",
                    F.date_trunc("month", F.col("ts")),
                )
            ).alias("cohort"),
            F.collect_set(F.date_trunc("month", F.col("ts"))).alias(
                "months"
            ),
        )
        .filter(F.col("cohort").isNotNull())
    )
    exploded = per_user.select(
        "user_id",
        "cohort",
        F.explode("months").alias("m"),
    ).filter(F.col("m") >= F.col("cohort"))
    offset = (
        (F.year("m") - F.year("cohort")) * 12
        + (F.month("m") - F.month("cohort"))
    ).cast("long")
    return (
        exploded.select(
            "user_id",
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            offset.alias("months_since_signup"),
        )
        .groupBy("cohort_month", "months_since_signup")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query("cdc_apply_latest", oracle=CDC_APPLY_ORACLE)
def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log apply WITH DELETES (X84): collapse an upsert/delete
    operation log to current table state — last op per key wins, and a
    terminal delete removes the key entirely (the half of CDC that
    merge_upsert/W2 does not model; 'error' events stand in for delete
    ops on the fixture). This is the change-data shape every
    lakehouse ingestion job applies from a Debezium/binlog feed.

    Scale: one shuffle on the key + a row_number window — identical
    cost to the W1 dedup it extends; the delete filter is free. With a
    transactional table format the same collapsed frame drives
    MERGE ... WHEN MATCHED AND s.op = 'D' THEN DELETE."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    oplog = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        oplog.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.date_format("ts", _TS_FMT).alias("last_ts"),
            F.round("value", 4).alias("value"),
        )
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (X85): counts of consecutive
    (prev → next) event-type pairs per user — the Markov-chain input
    behind funnel diagnosis, bot detection (improbable transition
    chains), and next-action models.

    Scale: ONE shuffle on the user key serves the lag window; the
    transition fold is a partial+final hash agg over ≤|types|² groups —
    output size is the square of a small vocabulary regardless of event
    volume. Deterministic (ts, event_id) ordering makes ties stable
    cross-engine."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "gapfill_daily_series",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
      FROM events
    ),
    spine AS (
      SELECT CAST(u AS DATE) AS day FROM (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS u
        FROM bounds
      )
    ),
    grid AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM events) t, spine s
    ),
    j AS (
      SELECT g.event_type, g.day, d.n, d.v
      FROM grid g LEFT JOIN daily d USING (event_type, day)
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           v AS day_value,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           n IS NULL AS is_gap
    FROM j
    """,
)
def gapfill_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-filling resample (X98): rebuild each event type's
    daily value series on a COMPLETE calendar spine (every day between
    the corpus min and max date, so silent outage days surface as rows,
    not absences) and forward-fill gaps with the last observed value —
    the resample → ffill step every monitoring/feature pipeline runs
    before rates, z-scores (X80), or model features are computed over a
    series. Leading gaps (before a type's first observation) stay NULL;
    ``is_gap`` keeps the imputation auditable.

    Scale: the daily rollup is the only corpus-sized aggregation (one
    map-side-combined shuffle); the spine is date ARITHMETIC (sequence
    between two scalar bounds — never a scan), the grid is
    |types|·|days| rollup-sized rows, and the forward-fill window
    sorts that rollup, not events (the X38 window-over-rollup
    justification). Values are rounded BEFORE the fill so the carried
    value is bit-identical to the day it came from."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    day = F.col("ts").cast("date")
    daily = t.events.groupBy(
        "event_type", day.alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v")
    )
    bounds = t.events.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    types = t.events.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    j = grid.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.col("v").alias("day_value"),
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n").isNull().alias("is_gap"),
    )


@query(
    "interpolate_daily_series",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
      FROM events
    ),
    spine AS (
      SELECT CAST(u AS DATE) AS day FROM (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS u
        FROM bounds
      )
    ),
    grid AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM events) t, spine s
    ),
    j AS (
      SELECT g.event_type, g.day,
             CAST(g.day - DATE '1970-01-01' AS BIGINT) AS dn, d.v
      FROM grid g LEFT JOIN daily d USING (event_type, day)
    ),
    ctx AS (
      SELECT *,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS)
               OVER wp AS pd,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS)
               OVER wf AS nd
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY dn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY dn
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           v AS day_value,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (CAST(dn - pd AS DOUBLE) / (nd - pd))
           END, 4) AS interp_value,
           v IS NULL AS is_gap
    FROM ctx
    """,
)
def interpolate_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X126 — linear interpolation over calendar gaps: X98's sibling
    with the other imputation contract — a gap day gets the value on
    the straight line between its nearest observed neighbors instead
    of a stale carry-forward (ffill biases trends flat; interpolation
    preserves slope, the right default for rates and counters).
    Leading/trailing gaps (no neighbor on one side) stay NULL,
    ``is_gap`` keeps the imputation auditable.

    Scale: identical shape to X98 — corpus folds to the |types|·|days|
    rollup once; BOTH direction windows (last-non-null-behind,
    first-non-null-ahead) share the event_type partitioning and run
    over the rollup, so Spark plans one shuffle and two in-partition
    sorts. The interpolation expression is the same operand-ordered
    double arithmetic in both engines (integer day ratio × rounded
    values), so the hash comparison needs no slack beyond the 4-dec
    round."""
    t = load_tables(spark, sf_dir)
    day = F.col("ts").cast("date")
    epoch = F.lit("1970-01-01").cast("date")
    daily = t.events.groupBy("event_type", day.alias("day")).agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    bounds = t.events.agg(F.min(day).alias("lo"), F.max(day).alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    types = t.events.select("event_type").distinct()
    j = (
        types.crossJoin(F.broadcast(spine))
        .join(daily, ["event_type", "day"], "left")
        .withColumn("dn", F.datediff(F.col("day"), epoch).cast("long"))
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("dn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("dn")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_dn = F.when(F.col("v").isNotNull(), F.col("dn"))
    ctx = j.select(
        "event_type",
        "day",
        "dn",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_dn, ignorenulls=True).over(wp).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_dn, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = F.when(F.col("v").isNotNull(), F.col("v")).when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (
            (F.col("dn") - F.col("pd")).cast("double")
            / (F.col("nd") - F.col("pd"))
        ),
    )
    return ctx.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("v").alias("day_value"),
        F.round(interp, 4).alias("interp_value"),
        F.col("v").isNull().alias("is_gap"),
    )


@query(
    "event_ohlc_bars",
    oracle=f"""
    WITH e AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)) AS bar
      FROM events
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, bar) AS cnt
      FROM e
    )
    SELECT event_type,
           strftime(bar, '{_TS_FMT_DUCK}') AS bar_start,
           CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT)
             AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn = cnt THEN cents END) AS BIGINT)
             AS close_cents,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS volume_cents
    FROM r
    GROUP BY 1, 2
    """,
)
def event_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X147 — OHLC candlestick resample: per (event_type, 6-hour bar)
    the open/high/low/close of ``value`` plus event count and volume —
    the canonical time-series downsampling every metrics/market system
    runs. Open/close are defined by (ts, event_id) order so ties at the
    same microsecond stay deterministic; values are exact integer
    cents.

    F.window is the same tumbling-window operator the streaming path
    uses (epoch-aligned, as is DuckDB's time_bucket for sub-day
    intervals — whole-day origin offsets are multiples of 6h).

    Scale: one shuffle on (event_type, bar) for the rank window, then
    the aggregation rides the SAME partitioning (no second exchange);
    first/last via rn avoids any engine-specific first_value frame
    semantics. Bars output is |types| x |6h buckets| — tiny."""
    t = load_tables(spark, sf_dir)
    e = t.events.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.window("ts", "6 hours").alias("w"),
    ).select(
        "event_type", "ts", "event_id", "cents",
        F.col("w.start").alias("bar"),
    )
    wo = Window.partitionBy("event_type", "bar").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type", "bar")
    r = e.select(
        "event_type", "bar", "cents",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    # Group on the RAW (event_type, bar) key — the windows' exact
    # partitioning — so the aggregate runs exchange-free on the sorted
    # partitions; the display format is projected afterwards (grouping
    # on date_format(bar) would hash-partition on a different
    # expression and re-shuffle).
    return (
        r.groupBy("event_type", "bar")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias(
                "open_cents"
            ),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max(F.when(F.col("rn") == F.col("cnt"), F.col("cents"))).alias(
                "close_cents"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("long").alias("volume_cents"),
        )
        .select(
            "event_type",
            F.date_format("bar", _TS_FMT).alias("bar_start"),
            "open_cents", "high_cents", "low_cents", "close_cents",
            "n_events", "volume_cents",
        )
    )


@query(
    "time_weighted_value",
    oracle="""
    WITH e AS (
      SELECT event_type, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(ts AS DATE) AS day
      FROM events
    ),
    d AS (
      SELECT event_type, day, cents,
             epoch_us(LEAD(ts) OVER (PARTITION BY event_type, day
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dur
      FROM e
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           CAST(SUM(dur) AS BIGINT) AS span_micros,
           ROUND(CAST(SUM(cents * dur) AS DOUBLE)
                 / (CAST(SUM(dur) AS DOUBLE) * 100.0), 6) AS twap
    FROM d
    GROUP BY 1, 2
    HAVING SUM(dur) > 0
    """,
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X148 — time-weighted average value (TWAP) per (event_type, day):
    each observation is weighted by the microseconds until the next
    observation of the same series that day (the last one carries zero
    weight), so irregular sampling doesn't bias the mean toward bursts
    — the standard financial/sensor resampling semantics a plain AVG
    gets wrong.

    Determinism: weights are integer micros from instant subtraction
    (timezone-free in both engines), the numerator is summed as
    decimal(38,0) on the Spark side (DuckDB promotes to HUGEINT — the
    winsorized_price_stats recipe; int64 would wrap around sf100 for
    day-long gaps), and the TWAP is ONE double division of two
    exactly-agreed integers. Groups with a single event (no intervals)
    are dropped on both sides — scale-dependent, pinned in the parity
    matrix.

    Scale: one shuffle on (event_type, day) for the lead window; the
    aggregation reuses the same partitioning. Output is |types| x
    |days|."""
    t = load_tables(spark, sf_dir)
    e = t.events.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.to_date("ts").alias("day"),
    )
    wo = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    d = e.select(
        "event_type",
        "day",
        "cents",
        (F.unix_micros(F.lead("ts").over(wo)) - F.unix_micros("ts")).alias(
            "dur"
        ),
    )
    # Raw-key groupBy for the same exchange-elision as event_ohlc_bars.
    out = (
        d.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("dur").cast("long").alias("span_micros"),
            F.sum(
                (F.col("cents") * F.col("dur")).cast("decimal(38,0)")
            ).alias("__num"),
        )
        .filter(F.col("span_micros") > 0)
    )
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "span_micros",
        F.round(
            F.col("__num").cast("double")
            / (F.col("span_micros").cast("double") * 100.0),
            6,
        ).alias("twap"),
    )


# --------------------------------------------------------------------------
# X248 — leakage-aware future-window label construction (r14).
# --------------------------------------------------------------------------


@query(
    "future_purchase_labels",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
      FROM orders
    ),
    nxt AS (
      SELECT o_orderkey, od,
             LEAD(od) OVER (
               PARTITION BY o_custkey ORDER BY od, o_orderkey
             ) AS nd
      FROM o
    )
    SELECT o_orderkey,
           strftime(od, '%Y-%m-%d') AS order_date,
           CAST(date_diff('day', od, nd) AS BIGINT) AS days_to_next,
           CAST(CASE WHEN nd IS NOT NULL
                      AND date_diff('day', od, nd) <= 90
                THEN 1 ELSE 0 END AS INTEGER) AS repurchase_90d
    FROM nxt
    """,
)
def future_purchase_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-label construction for a churn/repurchase model: per
    order, did the SAME customer place another order within the next 90
    days (``repurchase_90d``), plus the exact gap (``days_to_next``,
    NULL for each customer's last order). The label window looks only
    FORWARD from the example's own timestamp — the leakage rule a
    training pipeline must encode once, centrally, rather than in every
    notebook (the batch analog of X142's leakage-free split).

    Engine: one LEAD window per customer ordered (o_orderdate,
    o_orderkey) — the key tie-break makes same-day orders
    deterministic on both engines. Labels are integer day arithmetic
    on DATE-cast keys; no floats anywhere.

    Scale: one shuffle on o_custkey; window partitions are bounded by
    per-customer order counts (TPC-H ~10), so no skewed partition
    exists. Output is |orders| rows — a labeled training table, built
    in one pass."""
    t = load_tables(spark, sf_dir)
    o = t.orders.select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("od")
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    n = o.select("o_orderkey", "od", F.lead("od").over(w).alias("nd"))
    return n.select(
        "o_orderkey",
        F.date_format("od", "yyyy-MM-dd").alias("order_date"),
        F.datediff("nd", "od").cast("long").alias("days_to_next"),
        F.when(
            F.col("nd").isNotNull() & (F.datediff("nd", "od") <= 90),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("repurchase_90d"),
    )
