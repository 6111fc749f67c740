"""Robust statistics, exponential smoothing, and interval analytics
(extensions X113-X116): the monitoring/outlier layer a data pipeline
runs on top of its rollups.

The reference's dashboard surfaces only mean/min/max/median
(/root/reference/viz.py:200-255); production monitoring needs
outlier-resistant variants (median/MAD, winsorization) and smoothed
trend lines (EWMA) — all implemented here as distributed, oracle-checked
operators following the suite's float-determinism rules: money in
integer cents, rank-picked (percentile_disc) medians instead of
engine-specific interpolation, and EWMA decay 0.5 so every weight
``0.5^k`` and weighted term is a binary-exact double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.suite.registry import query


def _cents(col: str) -> Column:
    """Money column → exact integer cents (cross-engine deterministic)."""
    return F.round(F.col(col) * 100).cast("long")


_DUCK_CENTS = "CAST(ROUND({col} * 100) AS BIGINT)"

# EWMA decay: weights 0.5^k are exact binary fractions, so the weighted
# sums below are EXACT double arithmetic (every term is a multiple of
# 2^-6 and far below 2^53) — the oracle matches bit-for-bit, no rounding
# slack needed on the comparison itself.
_EWMA_DECAY = 0.5
_EWMA_WINDOW_DAYS = 7


@query(
    "ewma_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS pri,
             CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({_DUCK_CENTS.format(col="o_totalprice")}) AS BIGINT)
               AS day_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT t.pri AS o_orderpriority,
           strftime(t.day, '%Y-%m-%d') AS day,
           t.day_cents,
           ROUND(
             SUM(s.day_cents
                 * pow({_EWMA_DECAY}, date_diff('day', s.day, t.day)))
             / SUM(pow({_EWMA_DECAY}, date_diff('day', s.day, t.day))),
             4) AS ewma_cents
    FROM daily t
    JOIN daily s
      ON s.pri = t.pri
     AND s.day <= t.day
     AND s.day >= t.day - INTERVAL {_EWMA_WINDOW_DAYS - 1} DAY
    GROUP BY t.pri, t.day, t.day_cents
    """,
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X113 — exponentially weighted moving average over the per-day
    revenue rollup: per order priority, each day's revenue smoothed over
    the trailing 7 observed days with decay 0.5 (normalized by the sum
    of weights actually present, so gap days shrink the denominator
    instead of dragging the average toward zero).

    Implemented as a broadcast range self-join OF THE ROLLUP: the
    heavy reduction (orders → priority×day cents) is one map-side-
    combined shuffle; the join input is |priorities|·|days| rows —
    growing with calendar time, not data volume — so the small side is
    broadcast and the EWMA costs no second shuffle at any scale. The
    decay 0.5 makes every weight and weighted term binary-exact (see
    module docstring), so the oracle comparison is exact arithmetic.
    """
    t = load_tables(spark, sf_dir)
    daily = t.orders.groupBy(
        F.col("o_orderpriority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.sum(_cents("o_totalprice")).alias("day_cents"))
    # Pin the rollup's lineage before self-joining against a broadcast
    # copy — without it Spark replans the orders scan + aggregation
    # twice (once per side), the replay trap bm25_doc_scores /
    # token_pmi_pairs document.
    daily = daily.localCheckpoint(eager=False)
    s = F.broadcast(
        daily.select(
            F.col("o_orderpriority").alias("s_pri"),
            F.col("day").alias("s_day"),
            F.col("day_cents").alias("s_cents"),
        )
    )
    k = F.datediff(F.col("day"), F.col("s_day"))
    w = F.pow(F.lit(_EWMA_DECAY), k)
    return (
        daily.join(
            s,
            (F.col("s_pri") == F.col("o_orderpriority"))
            & (F.col("s_day") <= F.col("day"))
            & (
                F.col("s_day")
                >= F.date_sub(F.col("day"), _EWMA_WINDOW_DAYS - 1)
            ),
        )
        .groupBy("o_orderpriority", "day", "day_cents")
        .agg(
            F.round(
                F.sum(F.col("s_cents") * w) / F.sum(w), 4
            ).alias("ewma_cents")
        )
        .select(
            "o_orderpriority",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "day_cents",
            "ewma_cents",
        )
    )


# Session gap mirrors user_sessions (suite/windows.py): 30-minute
# inactivity, event_id tiebreak. The concurrency sweep then runs over
# the SESSION rollup, split at midnight so the running sum partitions
# by day.
_SESS = """
    o AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    lagged AS (
      SELECT *, LAG(ts) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
      ) AS prev FROM o
    ),
    flagged AS (
      SELECT *, CASE WHEN prev IS NULL
                       OR ts > prev + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
      FROM lagged
    ),
    numbered AS (
      SELECT *, SUM(new_s) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_seq FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_seq,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM numbered GROUP BY 1, 2
    )
"""


@query(
    "session_concurrency",
    oracle=f"""
    WITH {_SESS},
    segs AS (
      SELECT user_id, session_seq,
             CAST(u AS DATE) AS day,
             greatest(s_start, CAST(CAST(u AS DATE) AS TIMESTAMP))
               AS seg_start,
             least(s_end, CAST(CAST(u AS DATE) + INTERVAL 1 DAY
                               AS TIMESTAMP) - INTERVAL 1 MICROSECOND)
               AS seg_end
      FROM sessions,
           unnest(generate_series(CAST(s_start AS DATE),
                                  CAST(s_end AS DATE),
                                  INTERVAL 1 DAY)) AS t(u)
    ),
    points AS (
      SELECT day, seg_start AS ts, 1 AS delta FROM segs
      UNION ALL
      SELECT day, seg_end, -1 FROM segs
    ),
    swept AS (
      SELECT day, SUM(delta) OVER (
        PARTITION BY day ORDER BY ts, delta DESC
        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS live FROM points
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(MAX(live) AS BIGINT) AS peak_concurrency,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_session_segments
    FROM swept GROUP BY day
    """,
)
def session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X114 — peak concurrent sessions per day, the classic interval
    sweep: sessionize events (30-min gap, the user_sessions contract),
    split each session at midnight into per-day segments, emit +1/-1
    endpoint markers, and take the max of the running sum. Sessions
    touching at one instant count as overlapping (+1 sorts before -1),
    and the RANGE-frame running sum makes tied timestamps a single peer
    group in both engines, so the sweep is order-deterministic.

    Scale: the sweep input is 2 rows per session-day segment — a
    session-rollup, not events — and the running-sum window partitions
    by day, so no global sort ever forms. Midnight splitting is date
    arithmetic (``sequence`` over each session's day span, exploded),
    bounded by session length, not table size.
    """
    from seng550_a3_etl_spark.operators.sessionize import session_stats

    t = load_tables(spark, sf_dir)
    sess = session_stats(
        t.events, "user_id", "ts", "value",
        gap="30 minutes", tiebreak=["event_id"],
    ).select("session_start", "session_end")
    day = F.explode(
        F.sequence(
            F.col("session_start").cast("date"),
            F.col("session_end").cast("date"),
        )
    ).alias("day")
    segs = sess.select(day, "session_start", "session_end").select(
        "day",
        F.greatest(
            F.col("session_start"), F.col("day").cast("timestamp")
        ).alias("seg_start"),
        F.least(
            F.col("session_end"),
            F.date_add(F.col("day"), 1).cast("timestamp")
            - F.expr("INTERVAL 1 MICROSECOND"),
        ).alias("seg_end"),
    )
    points = segs.select(
        "day", F.col("seg_start").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        segs.select("day", F.col("seg_end"), F.lit(-1))
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        points.select("day", F.sum("delta").over(w).alias("live"))
        .groupBy("day")
        .agg(
            F.max("live").cast("long").alias("peak_concurrency"),
            (F.count(F.lit(1)) / 2).cast("long").alias(
                "n_session_segments"
            ),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "peak_concurrency",
            "n_session_segments",
        )
    )


# Median/MAD use rank selection (percentile_disc semantics: element at
# rank ceil(n/2) under a total order) over integer cents — exact and
# engine-agnostic, per the status_price_quartiles precedent.
_MAD_K = 4.4478  # 3 × 1.4826 (normal-consistency constant)


@query(
    "price_mad_outliers",
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority AS pri, o_orderkey,
             {_DUCK_CENTS.format(col="o_totalprice")} AS cents
      FROM orders
    ),
    med AS (
      SELECT pri, MAX(CASE WHEN rn = CEIL(n * 0.5) THEN cents END) AS med
      FROM (
        SELECT pri, cents,
               ROW_NUMBER() OVER (
                 PARTITION BY pri ORDER BY cents, o_orderkey
               ) AS rn,
               COUNT(*) OVER (PARTITION BY pri) AS n
        FROM c
      ) GROUP BY pri
    ),
    dev AS (
      SELECT c.pri, c.o_orderkey, c.cents, m.med,
             abs(c.cents - m.med) AS ad
      FROM c JOIN med m ON m.pri = c.pri
    ),
    mad AS (
      SELECT pri, MAX(med) AS med,
             MAX(CASE WHEN rn = CEIL(n * 0.5) THEN ad END) AS mad
      FROM (
        SELECT pri, med, ad,
               ROW_NUMBER() OVER (
                 PARTITION BY pri ORDER BY ad, o_orderkey
               ) AS rn,
               COUNT(*) OVER (PARTITION BY pri) AS n
        FROM dev
      ) GROUP BY pri
    )
    SELECT d.pri AS o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MAX(a.med) AS median_cents,
           MAX(a.mad) AS mad_cents,
           CAST(COUNT(CASE WHEN d.ad > {_MAD_K} * a.mad THEN 1 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a ON a.pri = d.pri
    GROUP BY d.pri
    """,
)
def price_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X115 — robust outlier detection per group: median and MAD
    (median absolute deviation) of order price, then the count of
    orders beyond 3·1.4826·MAD — the outlier-resistant alternative to
    the z-score monitor (X80), immune to the outliers it hunts.

    Both medians are rank-picked over integer cents (exact, no
    interpolation), so the only float op is the final threshold
    multiply — the same double in both engines. Scale: two
    sort-within-group passes sharing one partitioning on the group key
    (the same shuffle count as any exact-median plan; the approximate
    path is scalar_stats_approx's GK sketch), plus a broadcast join of
    the |groups|-row median table back onto the rows.
    """
    t = load_tables(spark, sf_dir)
    c = t.orders.select(
        F.col("o_orderpriority").alias("pri"),
        "o_orderkey",
        _cents("o_totalprice").alias("cents"),
    )

    def rank_pick(df: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("pri").orderBy(col, "o_orderkey")
        wc = Window.partitionBy("pri")
        ranked = df.select(
            "pri",
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        return ranked.groupBy("pri").agg(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * 0.5), F.col(col)
                )
            ).alias(f"{col}_med")
        )

    med = rank_pick(c, "cents").withColumnRenamed("cents_med", "med")
    dev = c.join(F.broadcast(med), "pri").select(
        "pri",
        "o_orderkey",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("ad"),
    )
    mad = rank_pick(dev, "ad").withColumnRenamed("ad_med", "mad")
    return (
        dev.join(F.broadcast(mad), "pri")
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("med").alias("median_cents"),
            F.max("mad").alias("mad_cents"),
            F.count(
                F.when(F.col("ad") > F.lit(_MAD_K) * F.col("mad"), 1)
            ).alias("n_outliers"),
        )
        .withColumnRenamed("pri", "o_orderpriority")
    )


@query(
    "winsorized_price_stats",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS flag,
             {_DUCK_CENTS.format(col="l_extendedprice")} AS cents,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY {_DUCK_CENTS.format(col="l_extendedprice")},
                        l_orderkey, l_linenumber
             ) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    bounds AS (
      SELECT flag,
             MAX(CASE WHEN rn = CEIL(n * 0.05) THEN cents END) AS lo,
             MAX(CASE WHEN rn = CEIL(n * 0.95) THEN cents END) AS hi
      FROM c GROUP BY flag
    ),
    clamped AS (
      SELECT c.flag, c.n,
             least(greatest(c.cents, b.lo), b.hi) AS w,
             CASE WHEN c.cents < b.lo THEN 1 ELSE 0 END AS at_lo,
             CASE WHEN c.cents > b.hi THEN 1 ELSE 0 END AS at_hi
      FROM c JOIN bounds b ON b.flag = c.flag
    )
    SELECT flag AS l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n_items,
           CAST(SUM(at_lo) AS BIGINT) AS n_clamped_lo,
           CAST(SUM(at_hi) AS BIGINT) AS n_clamped_hi,
           ROUND(CAST(SUM(w) AS DOUBLE) / MAX(n) / 100, 4)
             AS winsor_mean,
           ROUND(sqrt((CAST(SUM(CAST(w AS HUGEINT) * w) AS DOUBLE)
                       - CAST(SUM(w) AS DOUBLE)
                         * CAST(SUM(w) AS DOUBLE) / MAX(n))
                      / (MAX(n) - 1)) / 100, 4) AS winsor_std
    FROM clamped GROUP BY flag
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X116 — winsorized mean/stddev per return flag: clamp prices to
    the rank-picked [p05, p95] before the moments, so a handful of
    corrupt extreme rows can't move the monitoring baseline (the
    companion to X115's detection — this one REPORTS robustly).

    Determinism: clamped values are integer cents; Σw and Σw² are
    exact integer aggregates (decimal(38) on the Spark side, HUGEINT in
    DuckDB), and the closed-form variance converts to double ONCE from
    exact integers — both engines round the same integer to the same
    nearest double, so even the stddev hash-matches. Scale: one ranked
    window + one broadcast of the |groups|-row bounds table; the
    moments are a plain map-side-combined aggregation.
    """
    t = load_tables(spark, sf_dir)
    c = t.lineitem.select(
        F.col("l_returnflag").alias("flag"),
        "l_orderkey",
        "l_linenumber",
        _cents("l_extendedprice").alias("cents"),
    ).select(
        "flag",
        "cents",
        F.row_number()
        .over(
            Window.partitionBy("flag").orderBy(
                "cents", "l_orderkey", "l_linenumber"
            )
        )
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("flag")).alias("n"),
    )

    def pick(q: float, name: str) -> Column:
        return F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * q), F.col("cents"))
        ).alias(name)

    bounds = c.groupBy("flag").agg(pick(0.05, "lo"), pick(0.95, "hi"))
    clamped = c.join(F.broadcast(bounds), "flag").select(
        "flag",
        "n",
        F.least(
            F.greatest(F.col("cents"), F.col("lo")), F.col("hi")
        ).alias("wv"),
        (F.col("cents") < F.col("lo")).cast("long").alias("at_lo"),
        (F.col("cents") > F.col("hi")).cast("long").alias("at_hi"),
    )
    dec = F.col("wv").cast("decimal(38,0)")
    agg = clamped.groupBy("flag").agg(
        F.max("n").alias("n_items"),
        F.sum("at_lo").alias("n_clamped_lo"),
        F.sum("at_hi").alias("n_clamped_hi"),
        F.sum(dec).alias("sw"),
        F.sum(dec * dec).alias("sww"),
    )
    n = F.col("n_items").cast("double")
    sw = F.col("sw").cast("double")
    sww = F.col("sww").cast("double")
    return agg.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_clamped_lo").cast("long").alias("n_clamped_lo"),
        F.col("n_clamped_hi").cast("long").alias("n_clamped_hi"),
        F.round(sw / n / 100, 4).alias("winsor_mean"),
        F.round(
            F.sqrt((sww - sw * sw / n) / (n - 1)) / 100, 4
        ).alias("winsor_std"),
    )


@query(
    "weekday_chisq",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                  AS BIGINT) AS dn
      FROM orders
    ),
    obs AS (
      SELECT (dn + 4) % 7 AS dow, COUNT(*) AS n
      FROM d GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(CAST(total AS DOUBLE) / 7, 4) AS expected,
           ROUND(pow(n - CAST(total AS DOUBLE) / 7, 2)
                 / (CAST(total AS DOUBLE) / 7), 4) AS chisq_term
    FROM obs CROSS JOIN tot
    """,
)
def weekday_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X128 — day-of-week seasonality census with the chi-square
    goodness-of-fit decomposition against a uniform week: per weekday
    the observed order count, the uniform expectation n/7, and that
    cell's (obs−exp)²/exp term (the statistic is their sum, dof 6) —
    the ingestion-monitoring test for "did the weekly shape break"
    (a pipeline that silently drops weekend batches shows up as two
    inflated terms).

    Weekday is computed as (days_since_epoch + 4) % 7 (epoch day 0 =
    Thursday ⇒ 0 = Sunday) — pure integer arithmetic, identical in
    both engines, dodging the Spark-vs-DuckDB dayofweek() numbering
    mismatch entirely. Scale: one map-side-combined count shuffle to a
    7-row rollup; the expectation join is a 1-row broadcast."""
    t = load_tables(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    dn = F.datediff(F.col("o_orderdate").cast("date"), epoch)
    obs = t.orders.groupBy(((dn + 4) % 7).alias("dow")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = obs.agg(F.sum("n").alias("total"))
    exp = F.col("total").cast("double") / 7
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("dow").cast("long").alias("dow"),
        F.col("n").cast("long").alias("n_orders"),
        F.round(exp, 4).alias("expected"),
        F.round(F.pow(F.col("n") - exp, 2) / exp, 4).alias("chisq_term"),
    )


# Welch's two-sample t-test between two event types' value
# distributions. Values quantize to integer MICROS so Σx and Σx² are
# exact (decimal(38) / HUGEINT); every float op downstream is the same
# operand-ordered expression in both engines.
_TT_A, _TT_B = "click", "purchase"
_DUCK_MICROS = "CAST(ROUND(value * 1000000) AS BIGINT)"


@query(
    "ab_welch_ttest",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM({_DUCK_MICROS}) AS sx,
             SUM(CAST({_DUCK_MICROS} AS HUGEINT) * {_DUCK_MICROS}) AS sxx
      FROM events
      WHERE event_type IN ('{_TT_A}', '{_TT_B}') AND value IS NOT NULL
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(sx AS DOUBLE) / n AS mean,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
              * CAST(sx AS DOUBLE) / n) / (n - 1) AS var
      FROM s
    ),
    ab AS (
      SELECT a.n AS n_a, b.n AS n_b,
             a.mean AS mean_a, b.mean AS mean_b,
             a.var / a.n AS va, b.var / b.n AS vb
      FROM m a, m b
      WHERE a.event_type = '{_TT_A}' AND b.event_type = '{_TT_B}'
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND((mean_a - mean_b) / 1e6, 4) AS mean_diff,
           ROUND((mean_a - mean_b) / sqrt(va + vb), 4) AS t_stat,
           ROUND(pow(va + vb, 2)
                 / (pow(va, 2) / (n_a - 1) + pow(vb, 2) / (n_b - 1)),
                 2) AS welch_dof
    FROM ab
    """,
)
def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X132 — Welch's unequal-variance two-sample t-test between the
    'click' and 'purchase' value distributions: t statistic and
    Welch–Satterthwaite degrees of freedom — the A/B-comparison
    primitive an experimentation or canary pipeline runs per metric
    (Welch's form because real segment variances are never equal).

    Both samples' (n, Σx, Σx²) fold in ONE filtered scan with
    map-side partial aggregation; the test statistic is pure
    arithmetic on the two 1-row summaries (broadcast join of a 2-row
    frame with itself is avoided — the pivot happens via conditional
    firsts). Micros quantization keeps the moment sums exact, so both
    engines compute the statistic from identical integers."""
    micros = F.round(F.col("value") * 1_000_000).cast("long")
    dec = micros.cast("decimal(38,0)")
    t = load_tables(spark, sf_dir)
    s = (
        t.events.where(
            F.col("event_type").isin(_TT_A, _TT_B)
            & F.col("value").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).alias("sx"),
            F.sum(dec * dec).alias("sxx"),
        )
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    m = s.select(
        "event_type",
        n,
        (sx / n).alias("mean"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var"),
    )

    def pick(side: str, col: str):
        return F.first(
            F.when(F.col("event_type") == side, F.col(col)),
            ignorenulls=True,
        )

    ab = m.agg(
        pick(_TT_A, "n").alias("n_a"),
        pick(_TT_B, "n").alias("n_b"),
        pick(_TT_A, "mean").alias("mean_a"),
        pick(_TT_B, "mean").alias("mean_b"),
        pick(_TT_A, "var").alias("var_a"),
        pick(_TT_B, "var").alias("var_b"),
    )
    va = F.col("var_a") / F.col("n_a")
    vb = F.col("var_b") / F.col("n_b")
    diff = F.col("mean_a") - F.col("mean_b")
    return ab.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(diff / 1e6, 4).alias("mean_diff"),
        F.round(diff / F.sqrt(va + vb), 4).alias("t_stat"),
        F.round(
            F.pow(va + vb, 2)
            / (
                F.pow(va, 2) / (F.col("n_a") - 1)
                + F.pow(vb, 2) / (F.col("n_b") - 1)
            ),
            2,
        ).alias("welch_dof"),
    )


_KS_SRC_A, _KS_SRC_B = "src0", "src1"
_KS_CRIT = 1.358  # c(alpha) at alpha = 0.05


@query(
    "length_ks_drift",
    oracle=f"""
    WITH vals AS (
      SELECT n_chars,
             COUNT(CASE WHEN source = '{_KS_SRC_A}' THEN 1 END) AS ca,
             COUNT(CASE WHEN source = '{_KS_SRC_B}' THEN 1 END) AS cb
      FROM documents
      WHERE source IN ('{_KS_SRC_A}', '{_KS_SRC_B}')
      GROUP BY n_chars
    ),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY n_chars) AS fa,
             SUM(cb) OVER (ORDER BY n_chars) AS fb,
             SUM(ca) OVER () AS na,
             SUM(cb) OVER () AS nb
      FROM vals
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           ROUND(MAX(abs(CAST(fa AS DOUBLE) / na
                         - CAST(fb AS DOUBLE) / nb)), 6) AS ks_stat,
           MAX(abs(CAST(fa AS DOUBLE) / na - CAST(fb AS DOUBLE) / nb))
             > {_KS_CRIT} * sqrt((MAX(na) + MAX(nb))
                                 / (CAST(MAX(na) AS DOUBLE) * MAX(nb)))
             AS reject_h0
    FROM cum
    """,
)
def length_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X133 — two-sample Kolmogorov-Smirnov drift test between two
    sources' document-length distributions: D = sup|F_a − F_b| plus
    the alpha=0.05 decision against the asymptotic critical value
    1.358·sqrt((n_a+n_b)/(n_a·n_b)) — the NONPARAMETRIC companion to
    the binned PSI monitor (X93): PSI needs bin design and misses
    shape shifts inside a bin; KS is binless and distribution-free.
    X254 length_wasserstein_drift integrates the same CDF gap this
    test takes the sup of — the metric-aware member of the family.

    The empirical CDFs come from ONE rollup: group the union sample by
    value with per-source conditional counts, then two running sums
    over the same value-ordered window — |distinct lengths| rows, not
    documents. The window is unpartitioned but rollup-sized (the X38
    argument); the sup and the decision fold to one row. Counts stay
    integer until the two CDF divisions."""
    t = load_tables(spark, sf_dir)
    vals = (
        t.documents.where(
            F.col("source").isin(_KS_SRC_A, _KS_SRC_B)
        )
        .groupBy("n_chars")
        .agg(
            F.count(
                F.when(F.col("source") == _KS_SRC_A, 1)
            ).alias("ca"),
            F.count(
                F.when(F.col("source") == _KS_SRC_B, 1)
            ).alias("cb"),
        )
    )
    w = Window.orderBy("n_chars").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wa = Window.partitionBy()
    cum = vals.select(
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"),
        F.sum("ca").over(wa).alias("na"),
        F.sum("cb").over(wa).alias("nb"),
    )
    d = F.abs(
        F.col("fa").cast("double") / F.col("na")
        - F.col("fb").cast("double") / F.col("nb")
    )
    na, nb = F.max("na"), F.max("nb")
    return cum.agg(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(F.max(d), 6).alias("ks_stat"),
        (
            F.max(d)
            > _KS_CRIT
            * F.sqrt((na + nb) / (na.cast("double") * nb))
        ).alias("reject_h0"),
    )


@query(
    "length_wasserstein_drift",
    oracle="""
    WITH r AS (
      SELECT source, n_chars, COUNT(*) AS c
      FROM documents GROUP BY 1, 2
    ),
    vals AS (SELECT n_chars, SUM(c) AS ct FROM r GROUP BY n_chars),
    srcs AS (SELECT DISTINCT source FROM r),
    grid AS (
      SELECT s.source, v.n_chars, v.ct, COALESCE(rr.c, 0) AS c
      FROM srcs s CROSS JOIN vals v
      LEFT JOIN r rr
        ON rr.source = s.source AND rr.n_chars = v.n_chars
    ),
    cum AS (
      SELECT source,
             SUM(c) OVER w AS fa,
             SUM(ct - c) OVER w AS fb,
             SUM(c) OVER wp AS na,
             SUM(ct - c) OVER wp AS nb,
             COALESCE(LEAD(n_chars) OVER wo - n_chars, 0) AS gap
      FROM grid
      WINDOW w AS (PARTITION BY source ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wo AS (PARTITION BY source ORDER BY n_chars),
             wp AS (PARTITION BY source)
    ),
    terms AS (
      SELECT source, na, nb,
             ABS(CAST(fa AS DOUBLE) / na
                 - CAST(fb AS DOUBLE) / nb) AS d,
             gap
      FROM cum
    )
    SELECT source,
           CAST(MAX(na) AS BIGINT) AS n_docs,
           CAST(MAX(nb) AS BIGINT) AS n_rest,
           ROUND(SUM(CAST(ROUND(gap * d * 1000000000) AS BIGINT))
                 / 1e9, 6) AS w1_distance,
           ROUND(MAX(d), 6) AS ks_stat
    FROM terms GROUP BY source
    """,
)
def length_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X254 — per-source 1-D Wasserstein (earth-mover) drift: for each
    source, W1 between its document-length distribution and the rest
    of the corpus, computed EXACTLY via the closed form
    W1 = integral |F_a(x) - F_b(x)| dx (both CDFs are step functions,
    so the integral is a finite sum of gap-weighted CDF differences
    over the merged value grid). Completes the drift family's metric
    axes: PSI (X94) needs bin design, KS (X133) sees only the worst
    single point, JSD (X194) ignores the value METRIC entirely — W1 is
    binless, metric-aware, and in the data's own units (characters of
    length shift), which is why it is the production drift monitor
    that survives distributions sliding past each other. The same fold
    emits each source's KS sup for free (ks_stat <= w1/range check).

    Determinism: CDF ratios are exactly-rounded IEEE divisions of
    integer counts written in the same shape on both engines; each
    gap-weighted term is quantized to integer nanos BEFORE the
    per-source sum (the X69/X94 order-independence rule), so summation
    order cannot change the hash.

    Scale: ONE corpus scan folds to the (source, value) rollup
    (map-side combined); the value totals, source list, and grid are
    all re-aggregations of that rollup (localCheckpoint-pinned, X94
    four-consumer rule). The grid is |sources| x |distinct values| —
    layout-independent and tiny next to the corpus; the per-source
    windows run over grid partitions. For unbounded continuous
    columns at 100 TB, quantize first (the X94 bucket recipe): W1 on
    the quantized grid is the standard monitoring compromise and this
    plan is unchanged by it.
    """
    t = load_tables(spark, sf_dir)
    r = t.documents.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("c")
    )
    # Three rollup consumers (value totals, source list, grid join):
    # pin it so the corpus scans once (the X94 rule).
    r = r.localCheckpoint()
    vals = r.groupBy("n_chars").agg(F.sum("c").alias("ct"))
    srcs = r.select("source").distinct()
    grid = (
        vals.crossJoin(F.broadcast(srcs))
        .join(r, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            "ct",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("source").orderBy("n_chars")
    wp = Window.partitionBy("source")
    cum = grid.select(
        "source",
        F.sum("c").over(w).alias("fa"),
        F.sum(F.col("ct") - F.col("c")).over(w).alias("fb"),
        F.sum("c").over(wp).alias("na"),
        F.sum(F.col("ct") - F.col("c")).over(wp).alias("nb"),
        F.coalesce(
            F.lead("n_chars").over(wo) - F.col("n_chars"), F.lit(0)
        ).alias("gap"),
    )
    d = F.abs(
        F.col("fa").cast("double") / F.col("na")
        - F.col("fb").cast("double") / F.col("nb")
    )
    term_nano = F.round(F.col("gap") * d * 1e9).cast("long")
    return (
        cum.select(
            "source",
            "na",
            "nb",
            d.alias("d"),
            term_nano.alias("term_nano"),
        )
        .groupBy("source")
        .agg(
            F.max("na").cast("long").alias("n_docs"),
            F.max("nb").cast("long").alias("n_rest"),
            F.round(F.sum("term_nano") / 1e9, 6).alias("w1_distance"),
            F.round(F.max("d"), 6).alias("ks_stat"),
        )
    )


# Deterministic half-sample bootstrap: replica b keeps a row iff bit b
# of the row's 60-bit md5 hash is 0 — ONE hash per row serves all 32
# replicas, and DuckDB replays the bit test exactly.
_BOOT_B = 32


@query(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH h AS (
      SELECT {{hash}} AS hv,
             {_DUCK_CENTS.format(col="o_totalprice")} AS cents
      FROM orders
    ),
    reps AS (
      SELECT b, SUM(cents) AS s, COUNT(*) AS n
      FROM h, (SELECT unnest(range(0, {_BOOT_B})) AS b)
      WHERE ((hv >> b) & 1) = 0
      GROUP BY b
    ),
    means AS (
      SELECT list_sort(list(CAST(s AS DOUBLE) / n)) AS ms FROM reps
    ),
    full_ AS (
      SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS gm, COUNT(*) AS nr
      FROM h
    )
    SELECT CAST(nr AS BIGINT) AS n_rows,
           CAST({_BOOT_B} AS BIGINT) AS n_replicas,
           ROUND(gm / 100, 4) AS grand_mean,
           ROUND(ms[{{lo}}] / 100, 4) AS ci_lo,
           ROUND(ms[{{hi}}] / 100, 4) AS ci_hi
    FROM means CROSS JOIN full_
    """.format(
        hash="(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))"
        "::BIGINT)",
        lo=2,   # ceil(32 * 0.05)
        hi=31,  # ceil(32 * 0.95)
    ),
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X135 — deterministic half-sample bootstrap stability interval
    for the mean order value: 32 replicas, replica b = the rows whose
    60-bit key hash has bit b clear (an expected half-sample each);
    the [p05, p95] band of the replica means is the sampling-noise
    interval a monitoring dashboard draws around the metric. Unlike a
    seeded RNG bootstrap, membership is a pure function of the row key
    — reruns, retries, and both engines reproduce it bit-for-bit.

    Scale: ONE md5 per row fans out to all 32 replicas via bit tests
    (the replica explode multiplies the stream ×16 expected, but each
    surviving row is (b, cents) and partial-aggregates map-side to 32
    rows); replica means are exact-integer divisions; the rank picks
    happen on a sorted 32-element array. Everything after the scan is
    O(B)."""
    from seng550_a3_etl_spark.functions.hashing import hash64

    t = load_tables(spark, sf_dir)
    h = t.orders.select(
        hash64(F.col("o_orderkey").cast("string")).alias("hv"),
        _cents("o_totalprice").alias("cents"),
    )
    reps = (
        h.select(
            "cents",
            "hv",
            F.explode(
                F.sequence(F.lit(0), F.lit(_BOOT_B - 1))
            ).alias("b"),
        )
        .where(F.expr("(hv >> b) & 1") == 0)
        .groupBy("b")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    means = reps.agg(
        F.sort_array(
            F.collect_list(F.col("s").cast("double") / F.col("n"))
        ).alias("ms")
    )
    full_ = h.agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("gm"),
        F.count(F.lit(1)).alias("nr"),
    )
    return means.crossJoin(F.broadcast(full_)).select(
        F.col("nr").cast("long").alias("n_rows"),
        F.lit(_BOOT_B).cast("long").alias("n_replicas"),
        F.round(F.col("gm") / 100, 4).alias("grand_mean"),
        F.round(F.element_at("ms", 2) / 100, 4).alias("ci_lo"),
        F.round(F.element_at("ms", 31) / 100, 4).alias("ci_hi"),
    )


@query(
    "seasonal_decompose_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({_DUCK_CENTS.format(col="o_totalprice")}) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    d2 AS (
      SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS dn FROM daily
    ),
    tr AS (
      SELECT *,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN SUM(x) OVER w7 END AS s7
      FROM d2
      WINDOW w7 AS (ORDER BY dn RANGE BETWEEN 3 PRECEDING
                    AND 3 FOLLOWING)
    ),
    det AS (
      SELECT *, (dn + 4) % 7 AS dow,
             x - CAST(s7 AS DOUBLE) / 7 AS detr
      FROM tr
    ),
    seas AS (
      SELECT dow, AVG(detr) AS seasonal
      FROM det WHERE detr IS NOT NULL GROUP BY dow
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           x AS day_cents,
           ROUND(CAST(s7 AS DOUBLE) / 7, 4) AS trend,
           ROUND(s.seasonal, 4) AS seasonal,
           ROUND(d.detr - s.seasonal, 4) AS remainder
    FROM det d LEFT JOIN seas s USING (dow)
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X136 — classical additive seasonal decomposition of the daily
    revenue series (the moving-average STL-lite every forecasting
    pipeline runs first): trend = centered 7-day moving average
    (emitted only where the full week exists — a calendar-RANGE frame,
    so series edges and gap-adjacent days stay NULL rather than
    averaging a short window), seasonal = mean detrended value per
    weekday (LEFT-joined back: a weekday with no full-window day in
    the whole series keeps NULL seasonal/remainder instead of dropping
    its rows), remainder = what's left. A weekday seasonal that explains
    most variance ⇒ X128's chi-square fires; a structured remainder ⇒
    look for change-points (X137).

    Scale: everything after the one corpus→daily shuffle runs over the
    |days| rollup — the centered window, the 7-row weekday table
    (broadcast back), the final join. The trend numerator stays an
    exact integer sum; /7 is one deterministic division."""
    t = load_tables(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    daily = (
        t.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(_cents("o_totalprice")).alias("x"))
        .withColumn("dn", F.datediff(F.col("day"), epoch).cast("long"))
    )
    w7 = Window.orderBy("dn").rangeBetween(-3, 3)
    tr = daily.withColumn(
        "s7",
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("x").over(w7)),
    )
    det = tr.withColumn("dow", (F.col("dn") + 4) % 7).withColumn(
        "detr", F.col("x") - F.col("s7").cast("double") / 7
    )
    seas = (
        det.where(F.col("detr").isNotNull())
        .groupBy("dow")
        .agg(F.avg("detr").alias("seasonal"))
    )
    return det.join(F.broadcast(seas), "dow", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("day_cents"),
        F.round(F.col("s7").cast("double") / 7, 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round(F.col("detr") - F.col("seasonal"), 4).alias("remainder"),
    )


@query(
    "revenue_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({_DUCK_CENTS.format(col="o_totalprice")}) AS BIGINT)
               AS x
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT SUM(x) AS sx, COUNT(*) AS n FROM daily),
    cs AS (
      SELECT day, x,
             SUM(x) OVER (ORDER BY day) AS run,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             tot.sx, tot.n
      FROM daily CROSS JOIN tot
    ),
    scored AS (
      SELECT *, run * n - t * sx AS cusum_scaled FROM cs
    ),
    peak AS (
      SELECT * FROM scored
      ORDER BY abs(cusum_scaled) DESC, day LIMIT 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS changepoint_day,
           CAST(t AS BIGINT) AS days_before,
           CAST(n - t AS BIGINT) AS days_after,
           ROUND(CAST(cusum_scaled AS DOUBLE) / n / 100, 4)
             AS cusum_peak_dollars,
           ROUND(CAST(run AS DOUBLE) / t / 100, 4) AS mean_before,
           ROUND(CAST(sx - run AS DOUBLE) / (n - t) / 100, 4)
             AS mean_after
    FROM peak
    """,
)
def revenue_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X137 — CUSUM change-point detection on the daily revenue series:
    the day t maximizing |Σ_{i≤t} x_i − t·μ| (the classic cumulative-
    sum statistic; its peak is the most likely single level-shift
    point), with the mean before/after the split — the monitoring
    question behind "when did the metric actually move", asked after
    X80's z-score says *that* it moved.

    Determinism is exact: the statistic is scaled by n
    (run·n − t·Σx — decimal(38,0), mirroring the oracle's HUGEINT
    promotion, so no int64 wrap at any sf) so the argmax compares
    exact integers, and
    the day tiebreak makes the selection total; divisions happen only
    in the final 1-row projection. Scale: one corpus→daily shuffle;
    the running sum and ranking share one |days|-rollup window; the
    peak is TakeOrdered(1)."""
    t = load_tables(spark, sf_dir)
    daily = t.orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(_cents("o_totalprice")).alias("x"))
    tot = daily.agg(
        F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    cs = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "x",
        "sx",
        "n",
        F.sum("x")
        .over(w.rangeBetween(Window.unboundedPreceding, 0))
        .alias("run"),
        F.row_number().over(w).alias("t"),
    )
    # decimal(38,0) before the multiply: run and sx are total cents, so
    # run*n overflows int64 around sf1000 (sx~1e16 × n~2.5e3) and Spark's
    # non-ANSI mode would wrap silently while the DuckDB oracle's HUGEINT
    # stays exact. decimal(38,0) matches the oracle's int128 headroom.
    dec = "decimal(38,0)"
    scored = cs.withColumn(
        "cusum_scaled",
        F.col("run").cast(dec) * F.col("n").cast(dec)
        - F.col("t").cast(dec) * F.col("sx").cast(dec),
    )
    peak = scored.orderBy(
        F.abs(F.col("cusum_scaled")).desc(), "day"
    ).limit(1)
    return peak.select(
        F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
        F.col("t").cast("long").alias("days_before"),
        (F.col("n") - F.col("t")).cast("long").alias("days_after"),
        F.round(
            F.col("cusum_scaled").cast("double") / F.col("n") / 100, 4
        ).alias("cusum_peak_dollars"),
        F.round(
            F.col("run").cast("double") / F.col("t") / 100, 4
        ).alias("mean_before"),
        F.round(
            (F.col("sx") - F.col("run")).cast("double")
            / (F.col("n") - F.col("t"))
            / 100,
            4,
        ).alias("mean_after"),
    )


__all__ = [
    "ewma_daily_revenue",
    "session_concurrency",
    "price_mad_outliers",
    "winsorized_price_stats",
    "weekday_chisq",
    "ab_welch_ttest",
    "length_ks_drift",
    "bootstrap_mean_ci",
    "seasonal_decompose_daily",
    "revenue_cusum_changepoint",
]
