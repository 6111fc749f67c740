"""Windowed / statistical analytics extensions (SURVEY.md §2.10 X38-X46).

The reference's dashboard does all of this client-side in pandas over a
full-table extract (/root/reference/viz.py:200-255); here each shape is a
distributed, oracle-checked operator. Cross-engine float determinism
follows the suite's standing rules: money is summed as integer *cents*
(``ROUND(x*100)::BIGINT`` — exact in both engines), ratios are formed by
one fixed-order division, and DuckDB ``SUM(BIGINT)`` results are cast
back to BIGINT (DuckDB widens to HUGEINT, Spark stays long).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.functions.hashing import duck_hash64, hash64
from seng550_a3_etl_spark.suite.registry import query


def _cents(col: str) -> Column:
    """Money column → exact integer cents (cross-engine deterministic)."""
    return F.round(F.col(col) * 100).cast("long")


# The co-purchase structure (distinct basket membership and the a<b
# co-occurrence pair counts) feeds SIX queries: X100 pagerank, X166
# label propagation, X103 triangles, X152 jaccard recs, X159 lift
# rules, X206 k-core. Before r15 each rebuilt it privately (four via a
# C(basket,2) op self-join, two via bucket_pairs) — six distinct-
# shuffles plus six pair fan-outs per suite run for byte-identical
# tables. Computed ONCE per (Spark application, sf_dir) and shared,
# exactly the _shingle_sets_df/_labels_df precedent: at 100 TB the
# co-purchase gold table is a materialized artifact written by one job
# and consumed by the whole graph family; localCheckpoint is the
# session-scoped analog, and bench.py evicts + times the build as its
# own [1x, 10x, ratio] row so no spotted consumer absorbs it.
#
# The build itself uses bucket_pairs (collect each basket's sorted
# parts, emit C(basket, 2) pairs with array HOFs — one pass, one
# shuffle, blow-up bounded by basket size) rather than the op
# self-join the pagerank/LPA/triangle/k-core queries used: identical
# output (the pair (a, b) with a < b appears once per shared order in
# both forms — proven by the unchanged DuckDB oracles, which still
# spell the self-join), one fewer exchange, and no join (guide §2.3:
# aggregate before you shuffle / §2.4: remove shuffles outright).
_COPURCHASE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _copurchase_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (o, p) basket membership over lineitem — cached."""
    from seng550_a3_etl_spark.suite.text import _evict_stopped_sessions

    _evict_stopped_sessions(_COPURCHASE_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir, "op")
    cached = _COPURCHASE_CACHE.get(key)
    if cached is not None:
        return cached
    t = load_tables(spark, sf_dir)
    out = (
        t.lineitem.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    _COPURCHASE_CACHE[key] = out
    return out


def _copurchase_co(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, co) with a < b: count of orders whose baskets contain both
    parts — the co-purchase gold table (see block comment above)."""
    from seng550_a3_etl_spark.operators.text_dedup import bucket_pairs
    from seng550_a3_etl_spark.suite.text import _evict_stopped_sessions

    _evict_stopped_sessions(_COPURCHASE_CACHE)
    key = (spark.sparkContext.applicationId, sf_dir, "co")
    cached = _COPURCHASE_CACHE.get(key)
    if cached is not None:
        return cached
    op = _copurchase_op(spark, sf_dir)
    out = (
        bucket_pairs(op, ["o"], F.col("p"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("co"))
        .localCheckpoint(eager=True)
    )
    _COPURCHASE_CACHE[key] = out
    return out


_DUCK_CENTS = "CAST(ROUND({col} * 100) AS BIGINT)"


# --------------------------------------------------------------------------
# X38 — rolling window frames (ROWS + RANGE) over a per-day rollup.
# --------------------------------------------------------------------------


@query(
    "daily_revenue_rolling",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             CAST(SUM({_DUCK_CENTS.format(col="o_totalprice")}) AS BIGINT)
               AS day_cents
      FROM orders GROUP BY 1
    ),
    d2 AS (
      SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           n_orders,
           day_cents,
           CAST(SUM(day_cents) OVER w7 AS BIGINT) AS cents_7d,
           CAST(SUM(day_cents) OVER w3 AS BIGINT) AS cents_3rows,
           COUNT(*) OVER w7 AS days_in_7d
    FROM d2
    WINDOW w7 AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
           w3 AS (ORDER BY day_num ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def daily_revenue_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregates with both frame kinds: a calendar-aware 7-day
    RANGE frame (gaps in the date axis shrink the window) and a 3-row
    ROWS frame, over per-day revenue.

    Scale: the window runs over the per-DAY rollup, not raw orders — the
    unpartitioned window's input cardinality is |distinct days| (grows
    with time, not data volume), so the single-partition global sort is
    a few thousand rows even at 100 TB of orders. The heavy reduction
    (orders → days) is a partial+final hash agg on integer cents.
    """
    t = load_tables(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    daily = (
        t.orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents("o_totalprice")).alias("day_cents"),
        )
        .withColumn("day_num", F.datediff(F.col("day"), epoch))
    )
    w7 = Window.orderBy("day_num").rangeBetween(-6, Window.currentRow)
    w3 = Window.orderBy("day_num").rowsBetween(-2, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_orders",
        "day_cents",
        F.sum("day_cents").over(w7).alias("cents_7d"),
        F.sum("day_cents").over(w3).alias("cents_3rows"),
        F.count(F.lit(1)).over(w7).alias("days_in_7d"),
    )


# --------------------------------------------------------------------------
# X39 — gaps-and-islands: consecutive-order-day streaks per customer.
# --------------------------------------------------------------------------


@query(
    "customer_order_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS day FROM orders
    ),
    numbered AS (
      SELECT o_custkey,
             CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY day) AS rn
      FROM days
    ),
    streaks AS (
      SELECT o_custkey, day_num - rn AS grp, COUNT(*) AS len
      FROM numbered GROUP BY o_custkey, day_num - rn
    )
    SELECT o_custkey,
           MAX(len) AS longest_streak,
           COUNT(*) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY o_custkey
    """,
)
def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands via the row_number-difference trick: runs of
    consecutive order days share a constant ``day_num - row_number``
    group label; no self-join, no iteration.

    Scale: one shuffle on the customer key serves the distinct, the
    window, and both aggregates (Catalyst reuses the hash partitioning);
    all arithmetic is integer day counts.
    """
    t = load_tables(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    days = (
        t.orders.select(
            "o_custkey", F.col("o_orderdate").cast("date").alias("day")
        )
        .distinct()
        .withColumn("day_num", F.datediff(F.col("day"), epoch).cast("long"))
    )
    w = Window.partitionBy("o_custkey").orderBy("day_num")
    streaks = (
        days.select(
            "o_custkey",
            "day_num",
            (F.col("day_num") - F.row_number().over(w)).alias("grp"),
        )
        .groupBy("o_custkey", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return streaks.groupBy("o_custkey").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("active_days"),
    )


# --------------------------------------------------------------------------
# X40 — fixed-width histogram (width_bucket shape).
# --------------------------------------------------------------------------

_HIST_WIDTH = 25_000
_HIST_BUCKETS = 24


@query(
    "order_price_histogram",
    oracle=f"""
    SELECT LEAST(CAST(FLOOR(o_totalprice / {_HIST_WIDTH}) AS BIGINT),
                 {_HIST_BUCKETS - 1}) AS bucket,
           LEAST(CAST(FLOOR(o_totalprice / {_HIST_WIDTH}) AS BIGINT),
                 {_HIST_BUCKETS - 1}) * {_HIST_WIDTH} AS bucket_lo,
           COUNT(*) AS n_orders,
           CAST(SUM({_DUCK_CENTS.format(col="o_totalprice")}) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY 1, 2
    """,
)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram (the ``width_bucket`` shape, built
    from floor-division so both engines share the exact IEEE ops; the
    top bucket is open-ended via LEAST).

    Scale: pure scan → per-row bucket arithmetic → partial+final hash
    agg on ≤24 groups; the shuffle carries ≤24 rows per task.
    """
    t = load_tables(spark, sf_dir)
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _HIST_WIDTH),
        F.lit(_HIST_BUCKETS - 1),
    ).cast("long")
    return (
        t.orders.select(
            bucket.alias("bucket"), _cents("o_totalprice").alias("cents")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            "bucket",
            (F.col("bucket") * _HIST_WIDTH).alias("bucket_lo"),
            "n_orders",
            "total_cents",
        )
    )


# --------------------------------------------------------------------------
# X41 — discrete quantiles (percentile_disc) per group, exact cross-engine.
# --------------------------------------------------------------------------


@query(
    "status_price_quartiles",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           MAX(n) AS n_orders,
           ROUND(MAX(CASE WHEN rn = CEIL(n * 0.25) THEN o_totalprice END), 2)
             AS p25,
           ROUND(MAX(CASE WHEN rn = CEIL(n * 0.50) THEN o_totalprice END), 2)
             AS p50,
           ROUND(MAX(CASE WHEN rn = CEIL(n * 0.75) THEN o_totalprice END), 2)
             AS p75
    FROM ranked GROUP BY o_orderstatus
    """,
)
def status_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete per-group quartiles (percentile_disc semantics: the
    element at rank ceil(q·n), ties broken by key) — engines disagree on
    *interpolated* percentile implementations, but rank selection is
    exact, so the oracle checks values bit-for-bit. The A8 median analog
    (viz.py:228-229) as a grouped, distributed operator.

    Scale: one shuffle on the group key; the rank window and the count
    window share its sort; the final agg folds each group to one row.
    The multiplier 0.25/0.5/0.75 are binary-exact doubles, so CEIL(n*q)
    is deterministic in both engines.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wc = Window.partitionBy("o_orderstatus")
    ranked = t.orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def pick(q: float, name: str) -> Column:
        at = F.ceil(F.col("n") * q)
        return F.round(
            F.max(F.when(F.col("rn") == at, F.col("o_totalprice"))), 2
        ).alias(name)

    return ranked.groupBy("o_orderstatus").agg(
        F.max("n").alias("n_orders"),
        pick(0.25, "p25"),
        pick(0.50, "p50"),
        pick(0.75, "p75"),
    )


# --------------------------------------------------------------------------
# X42 — conditional / filtered aggregation (FILTER clause shape).
# --------------------------------------------------------------------------


@query(
    "monthly_order_mix",
    oracle=f"""
    SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderpriority LIKE '1-%') AS n_urgent,
           CAST(COALESCE(SUM({_DUCK_CENTS.format(col="o_totalprice")})
                  FILTER (WHERE o_orderpriority LIKE '1-%'), 0) AS BIGINT)
             AS urgent_cents,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_fulfilled
    FROM orders GROUP BY 1
    """,
)
def monthly_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (SQL FILTER clause ≡ sum-of-CASE): several
    differently-predicated aggregates out of ONE scan — the idiom that
    replaces N separate filtered queries with one pass at 100 TB.

    Scale: single scan, per-row predicates, partial+final hash agg on
    the month key; no join, no window.
    """
    t = load_tables(spark, sf_dir)
    urgent = F.col("o_orderpriority").startswith("1-")
    return (
        t.orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(urgent, 1).otherwise(0)).alias("n_urgent"),
            F.sum(
                F.when(urgent, _cents("o_totalprice")).otherwise(F.lit(0))
            ).alias("urgent_cents"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("n_fulfilled"),
        )
    )


# --------------------------------------------------------------------------
# X43 — order-preserving array aggregation (basket building).
# --------------------------------------------------------------------------


@query(
    "order_part_baskets",
    oracle=f"""
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey)
             AS parts
    FROM lineitem
    WHERE {duck_hash64("CAST(l_orderkey AS VARCHAR)", seed=3)} % 50 = 0
    GROUP BY l_orderkey
    """,
)
def order_part_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order sorted part basket: collect_list → sort_array →
    array_join makes the inherently unordered distributed collect
    deterministic (DuckDB replays it as an ordered string_agg). The
    basket string is the input shape for co-occurrence / market-basket
    feature pipelines.

    Scale: the 2% hash filter evaluates inside the scan (no shuffle for
    sampling); collected baskets are bounded by lines-per-order (≤7 in
    TPC-H-shaped data), so collect_list state stays tiny; one shuffle
    on the order key.
    """
    t = load_tables(spark, sf_dir)
    keep = hash64(F.col("l_orderkey").cast("string"), seed=3) % 50 == 0
    return (
        t.lineitem.filter(keep)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(
                "array_join(transform(sort_array(collect_list(l_partkey)),"
                " x -> cast(x as string)), ',')"
            ).alias("parts"),
        )
    )


# --------------------------------------------------------------------------
# X44 — correlated-subquery decorrelation (above-group-average filter).
# --------------------------------------------------------------------------


@query(
    "parts_above_type_avg",
    oracle=f"""
    SELECT p_partkey, p_type, ROUND(p_retailprice, 2) AS p_retailprice
    FROM part p
    WHERE {_DUCK_CENTS.format(col="p_retailprice")} > 1.05 * (
      SELECT CAST(SUM({_DUCK_CENTS.format(col="p2.p_retailprice")}) AS DOUBLE)
             / COUNT(*)
      FROM part p2 WHERE p2.p_type = p.p_type
    )
    """,
)
def parts_above_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced >5% above their type's average — the correlated
    scalar subquery, hand-decorrelated into aggregate + broadcast join
    (exactly what Catalyst's RewriteCorrelatedScalarSubquery produces).
    The average is formed as exact integer cents divided once, so the
    threshold comparison is bit-identical in both engines.

    Scale: the per-type aggregate is |types| rows → broadcast; the part
    table streams through map-side with no shuffle at all.
    """
    t = load_tables(spark, sf_dir)
    parts = t.part.select(
        "p_partkey", "p_type", "p_retailprice",
        _cents("p_retailprice").alias("cents"),
    )
    stats = parts.groupBy("p_type").agg(
        F.sum("cents").alias("sum_cents"), F.count(F.lit(1)).alias("n")
    )
    return (
        parts.join(F.broadcast(stats), "p_type")
        .filter(
            F.col("cents")
            > 1.05 * (F.col("sum_cents").cast("double") / F.col("n"))
        )
        .select(
            "p_partkey",
            "p_type",
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
    )


# --------------------------------------------------------------------------
# X45 — weighted deterministic sampling (quality/length-proportional).
# --------------------------------------------------------------------------

_W_DENOM = 10_000


@query(
    "weighted_doc_sample",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {duck_hash64("CAST(doc_id AS VARCHAR)", seed=13)} % {_W_DENOM}
          < LEAST(n_chars, 5000) * 2
    """,
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample: each document's keep
    probability is proportional to min(n_chars, 5000) — the curation
    move that biases a training mix toward substantive documents without
    an ML scorer. Same stable-hash construction as X26, so membership
    is rerun- and layout-invariant and the oracle replays it exactly.

    Scale: per-row integer arithmetic inside the scan stage; zero
    shuffle, zero sampling state.
    """
    t = load_tables(spark, sf_dir)
    rate = F.least(F.col("n_chars"), F.lit(5000)) * 2
    keep = hash64(F.col("doc_id").cast("string"), seed=13) % _W_DENOM < rate
    return t.documents.filter(keep).select(
        "doc_id", "lang", "source", "n_chars"
    )


# --------------------------------------------------------------------------
# X46 — distribution windows: percent_rank / cume_dist.
# --------------------------------------------------------------------------


@query(
    "order_price_ranks",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume
    FROM orders
    WHERE {duck_hash64("CAST(o_orderkey AS VARCHAR)", seed=5)} % 20 = 0
    WINDOW w AS (
      PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
    )
    """,
)
def order_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (percent_rank = (rank-1)/(n-1), cume_dist =
    peers-at-or-below/n): both are single integer divisions, so the
    doubles agree bit-for-bit cross-engine; the key tiebreak in the
    window order makes ranks deterministic.

    Scale: the 5% hash filter runs in the scan; one shuffle on the
    status key; both distribution functions share one window sort.
    """
    t = load_tables(spark, sf_dir)
    keep = hash64(F.col("o_orderkey").cast("string"), seed=5) % 20 == 0
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return t.orders.filter(keep).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@query(
    "event_time_rollup",
    oracle="""
    SELECT strftime(date_trunc('month', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS month,
           strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS day,
           strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY ROLLUP(month, day, hour)
    """,
)
def event_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate (X58): hour, day, month,
    and grand-total grains of the event stream from ONE aggregate pass —
    ROLLUP over the hierarchical truncations expands grains inside the
    Expand operator before a single shuffle, with map-side partial
    aggregation per grain; N grains never cost N scans or N jobs.
    Money-typed values sum as integer cents (cross-engine exact)."""
    from seng550_a3_etl_spark.operators.rollup import time_rollup

    t = load_tables(spark, sf_dir)
    return time_rollup(
        t.events,
        "ts",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("total_cents"),
        ],
    )


@query(
    "promo_range_join",
    oracle=f"""
    WITH promos AS (
      SELECT o_orderkey AS promo_id,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS start_day,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' + 6 AS end_day
      FROM orders
      WHERE {duck_hash64("CAST(o_orderkey AS VARCHAR)", seed=9)} % 97 = 0
    )
    SELECT promo_id,
           COUNT(l_orderkey) AS n_shipments,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS shipped_cents
    FROM promos
    LEFT JOIN lineitem
      ON (CAST(l_shipdate AS DATE) - DATE '1970-01-01')
         BETWEEN start_day AND end_day
    GROUP BY 1
    """,
)
def promo_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (X59): shipments falling inside week-long promo
    windows (a ~1% hash sample of orders defines the windows), rolled up
    per window with zero-preserving LEFT semantics.

    Scale: operators/joins.range_join buckets the day line into
    7-day cells — ranges explode to the cells they span, each point
    computes one cell, and the equi-join on the cell id replaces the
    cross product a naive theta join would execute; the exact BETWEEN
    prunes false candidates after the join. Zero-preservation comes from
    a LEFT join of the promo table onto the aggregated matches (the same
    pattern as the reference's zero-count districts)."""
    from seng550_a3_etl_spark.operators.joins import range_join

    t = load_tables(spark, sf_dir)
    promos = t.orders.filter(
        hash64(F.col("o_orderkey").cast("string"), seed=9) % 97 == 0
    ).select(
        F.col("o_orderkey").alias("promo_id"),
        F.unix_date(F.to_date("o_orderdate")).alias("start_day"),
        (F.unix_date(F.to_date("o_orderdate")) + 6).alias("end_day"),
    )
    points = t.lineitem.select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_cents"),
        F.unix_date(F.to_date("l_shipdate")).alias("ship_day"),
    )
    matched = range_join(
        points, promos, "ship_day", "start_day", "end_day", bucket_size=7
    )
    counts = matched.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        F.sum("price_cents").cast("long").alias("shipped_cents"),
    )
    return (
        promos.select("promo_id")
        .join(counts, "promo_id", "left")
        .select(
            "promo_id",
            F.coalesce("n_shipments", F.lit(0)).alias("n_shipments"),
            F.col("shipped_cents"),
        )
    )


@query(
    "price_quantity_corr",
    oracle="""
    WITH s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sx,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                  AS BIGINT) AS sy,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND(l_quantity * 100) AS BIGINT))
                  AS HUGEINT) AS sxy,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS HUGEINT) AS sxx,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)
                      * CAST(ROUND(l_quantity * 100) AS BIGINT))
                  AS HUGEINT) AS syy
      FROM lineitem
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
           9) AS corr
    FROM s
    """,
)
def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent Pearson correlation (X69): F.corr's streaming
    float accumulation is summation-order-dependent (nondeterministic
    under repartitioning and unverifiable cross-engine), so the
    correlation is assembled from five EXACT integer aggregates
    (Σx, Σy, Σxy, Σx², Σy² over cents) followed by one fixed
    double-precision formula — the pattern for any order-independent
    distributed statistic. One pass, one shuffled row, no precision
    drift at any cluster size."""
    t = load_tables(spark, sf_dir)
    x = F.round(F.col("l_extendedprice") * 100).cast("long")
    y = F.round(F.col("l_quantity") * 100).cast("long")
    s = t.lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,0)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,0)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            9,
        ).alias("corr"),
    )


@query(
    "event_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT *,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_days,
             CAST(SUM(n_events) OVER w AS BIGINT) AS s1,
             CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS s2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY event_date
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_date, n_events,
           CASE WHEN n_days > 1
                     AND (n_days * s2 - s1 * s1) > 0
                THEN ROUND(
                  (n_events - s1 / (1.0 * n_days))
                  / sqrt((n_days * s2 - s1 * s1)
                         / (1.0 * n_days * (n_days - 1))), 4)
           END AS zscore
    FROM stats
    """,
)
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection (X80): per event type, each
    day's count scored against its trailing 7-day window — the volume
    monitor every ingestion pipeline runs to catch crawler outages and
    traffic spikes before they poison a training snapshot. NULL zscore
    for warm-up rows (n<2) and zero-variance windows.

    Scale: the window runs over the per-(type, day) rollup — input
    cardinality is |types|·|days|, independent of event volume; the
    heavy reduction is a partial+final integer count. The z-score uses
    the X69 pattern (exact integer sums s1/s2, ONE closing double
    formula) so results are order-independent and bit-identical
    cross-engine."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type",
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
            "event_date"
        ),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_date")
        .rowsBetween(-6, 0)
    )
    stats = daily.select(
        "event_type",
        "event_date",
        "n_events",
        F.count(F.lit(1)).over(w).alias("n_days"),
        F.sum("n_events").over(w).alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("s2"),
    )
    n, s1, s2 = F.col("n_days"), F.col("s1"), F.col("s2")
    var_num = n * s2 - s1 * s1
    z = F.round(
        (F.col("n_events") - s1 / (1.0 * n))
        / F.sqrt(var_num / (1.0 * n * (n - 1))),
        4,
    )
    return stats.select(
        "event_type",
        "event_date",
        "n_events",
        F.when((n > 1) & (var_num > 0), z).alias("zscore"),
    )


@query(
    "key_skew_report",
    oracle="""
    WITH k AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM k)
    SELECT key, cnt, total, n_keys, cnt / (1.0 * total) AS share
    FROM k CROSS JOIN tot
    ORDER BY cnt DESC, key LIMIT 20
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics (X82): the top-20 heaviest values of a
    join key with their row share — the report that decides whether a
    join needs the X23 salting treatment or AQE skew handling, and the
    first thing to pull when one reducer runs 50× longer than the rest.

    Scale: per-key counts are ONE partial+final hash agg; the top-20 is
    a TakeOrdered over |keys| (never a global sort); the total/key-count
    scalar broadcasts onto the 20 survivors. The counts lineage is
    evaluated twice (top-k branch + total branch) — two map-side-
    combined aggregates over the key column only, the deliberate trade
    against materializing |keys| rows."""
    t = load_tables(spark, sf_dir)
    counts = (
        t.orders.select(F.col("o_custkey").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(20)
    return top.crossJoin(F.broadcast(totals)).select(
        "key",
        "cnt",
        "total",
        "n_keys",
        (F.col("cnt") / (1.0 * F.col("total"))).alias("share"),
    )


# --------------------------------------------------------------------------
# X90 — equi-depth histogram (bounds from a frequency rollup, no global
# sort of the fact table).
# --------------------------------------------------------------------------

_ED_BUCKETS = 8


@query(
    "price_equidepth_hist",
    oracle=f"""
    WITH c AS (
      SELECT {_DUCK_CENTS.format(col="o_totalprice")} AS cents FROM orders
    ),
    n AS (SELECT COUNT(*) AS n FROM c),
    freq AS (SELECT cents, COUNT(*) AS cnt FROM c GROUP BY 1),
    cum AS (
      SELECT cents, cnt, SUM(cnt) OVER (ORDER BY cents) AS cum FROM freq
    ),
    bounds AS (
      SELECT list_sort(list_distinct(list(cents))) AS bs
      FROM cum, n, LATERAL unnest(range(1, {_ED_BUCKETS})) AS r(j)
      WHERE (j * n.n + {_ED_BUCKETS - 1}) // {_ED_BUCKETS} <= cum
        AND (j * n.n + {_ED_BUCKETS - 1}) // {_ED_BUCKETS} > cum - cnt
    )
    SELECT CAST(len(list_filter(bs, b -> cents > b)) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(cents) AS lo_cents,
           MAX(cents) AS hi_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM c, bounds GROUP BY 1
    """,
)
def price_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) price histogram (X90): 8 buckets
    whose boundaries are the exact octiles of ``o_totalprice`` — the
    histogram shape optimizers and data-profiling tools actually keep
    (X40's fixed-width buckets starve on skewed money columns: most
    rows land in two buckets). Boundary value b_j is the element at
    rank ceil(j·n/8) (percentile_disc semantics, exact cross-engine);
    a row belongs to bucket |{j : value > b_j}|, so ties never split
    across buckets and the output is deterministic.

    Scale: the naive plan (ntile window) global-sorts the fact table.
    Here bounds come from a frequency ROLLUP: one hash agg to
    |distinct prices| rows (domain-bounded — cents values, not rows),
    a cumulative-count window over that rollup (the X38
    window-over-rollup justification), and each octile rank is claimed
    by exactly the rollup row whose [cum-cnt, cum) interval contains
    it — one pass, no per-quantile jobs. The ≤7 boundary values
    broadcast back as ONE array; bucket assignment is scan-stage
    arithmetic and the final agg folds to ≤8 groups map-side. For a
    column with unbounded distinct values, swap the exact rollup for
    approx_percentile bounds (the scalar_stats_approx trade)."""
    t = load_tables(spark, sf_dir)
    vals = t.orders.select(_cents("o_totalprice").alias("cents"))
    freq = vals.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = freq.select("cents", "cnt", F.sum("cnt").over(w).alias("cum"))
    tot = vals.agg(F.count(F.lit(1)).alias("n"))

    def target(j: Column) -> Column:
        # ceil(j*n/K) as exact integer math: floor((j*n + K-1) / K).
        return (
            (j.cast("long") * F.col("n") + (_ED_BUCKETS - 1)) / _ED_BUCKETS
        ).cast("long")

    claimed = F.filter(
        F.sequence(F.lit(1), F.lit(_ED_BUCKETS - 1)),
        lambda j: (target(j) <= F.col("cum"))
        & (target(j) > F.col("cum") - F.col("cnt")),
    )
    bounds = (
        cum.crossJoin(F.broadcast(tot))
        .select(F.explode(claimed).alias("__j"), "cents")
        .agg(
            F.sort_array(F.array_distinct(F.collect_list("cents"))).alias(
                "bs"
            )
        )
    )
    bucket = F.size(
        F.filter(F.col("bs"), lambda b: F.col("cents") > b)
    ).cast("long")
    return (
        vals.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "cents")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.sum("cents").alias("total_cents"),
        )
    )


# --------------------------------------------------------------------------
# X100 — weighted PageRank power-iteration step over the co-purchase graph.
# --------------------------------------------------------------------------


@query(
    "pagerank_step_parts",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT a.p AS src, b.p AS dst, COUNT(*) AS w
      FROM op a JOIN op b ON a.o = b.o AND a.p != b.p
      GROUP BY 1, 2
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    ow AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1),
    contrib AS (
      SELECT e.dst AS node,
             SUM(CAST(ROUND(0.85 * e.w / ow.ow / n.n * 1000000000000)
                 AS BIGINT)) AS i
      FROM e JOIN ow USING (src), n GROUP BY 1
    )
    SELECT node, ROUND((1.0 - 0.85) / n.n + COALESCE(i, 0) / 1e12, 9) AS pr
    FROM nodes LEFT JOIN contrib USING (node), n
    """,
)
def pagerank_step_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-PageRank power iteration (X100) over the part
    co-purchase graph (edges = parts sharing an order, weight =
    co-occurrence count): the importance ranking a recommender or
    link-spam filter seeds from; the operator is one step of the
    driver-iterated fixpoint, exactly the kmeans_step/connected-
    components pattern for iterative algorithms on Spark. Teleport
    constant is computed as (1.0 - 0.85), NOT a 0.15 literal — the two
    differ in the last ulp and would flip the 9th rounded decimal.

    Scale: the co-purchase self-join fans out C(basket, 2) pairs per
    order — bounded by the basket size, never |parts|²; out-weights
    are one partial+final agg; each edge contribution quantizes to
    integer picos BEFORE the per-node sum so the distributed reduction
    is order-independent (X69). Two node-key shuffles per step."""
    from seng550_a3_etl_spark.operators.graph import pagerank_step

    # Directed weighted edges from the shared co-purchase gold table
    # (r15): w(src->dst) = orders containing both = co(a, b) in either
    # direction, so the a != b self-join collapses to two projections
    # of the cached (a, b, co) rows — identical edge multiset, zero
    # rebuild (the oracle still spells the self-join and still matches).
    co = _copurchase_co(spark, sf_dir)
    edges = co.select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        F.col("co").alias("w"),
    ).unionByName(
        co.select(
            F.col("b").alias("src"), F.col("a").alias("dst"),
            F.col("co").alias("w"),
        )
    )
    return pagerank_step(edges).select("node", "pr")


@query(
    "label_propagation_parts",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (
      SELECT a.p AS src, b.p AS dst, COUNT(*) AS w
      FROM op a JOIN op b ON a.o = b.o AND a.p != b.p
      GROUP BY 1, 2
    ),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    l0 AS (SELECT node, node AS label FROM nodes),
    s1 AS (
      SELECT node, label FROM (
        SELECT e.dst AS node, l.label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.dst ORDER BY SUM(e.w) DESC, l.label
               ) AS rn
        FROM e JOIN l0 l ON l.node = e.src GROUP BY e.dst, l.label
      ) WHERE rn = 1
    ),
    l1 AS (SELECT n.node, COALESCE(s.label, n.node) AS label
           FROM nodes n LEFT JOIN s1 s USING (node)),
    s2 AS (
      SELECT node, label FROM (
        SELECT e.dst AS node, l.label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.dst ORDER BY SUM(e.w) DESC, l.label
               ) AS rn
        FROM e JOIN l1 l ON l.node = e.src GROUP BY e.dst, l.label
      ) WHERE rn = 1
    ),
    l2 AS (SELECT n.node, COALESCE(s.label, n.node) AS label
           FROM nodes n LEFT JOIN s2 s USING (node))
    SELECT l1.node, l1.label AS label_1, l2.label AS label_2
    FROM l1 JOIN l2 USING (node)
    """,
)
def label_propagation_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted label propagation, two synchronous steps (X166, Raghavan
    2007) over the part co-purchase graph — the communities a
    recommender or template-spam monitor reads off the same graph X100
    ranks and X103 censuses. Labels start as node ids; each step every
    node adopts the label with the largest incoming edge-weight mass
    (tie -> smallest label, so the fixpoint is deterministic and
    oracle-checkable). Emits both vintages — label_1 is the heaviest
    neighbor, label_2 shows real propagation (labels travel two hops).

    Scale per step (operators/graph.py label_prop_step): one node-key
    hash join of the label table onto edge sources, one (node, label)
    groupBy with map-side partial sums, one per-node argmax window —
    nothing collects, k steps are k bounded passes. The C(basket,2)
    edge build computes once (localCheckpoint) and the step-1 labels
    are pinned before step 2 re-reads them twice (keep-old-label
    left join + mass join), the r6 union-replay lesson."""
    from seng550_a3_etl_spark.operators.graph import label_prop_step

    # Directed weighted edges from the shared co-purchase gold table
    # (r15) — see pagerank_step_parts; the checkpoint stays because two
    # propagation steps re-read the edge list twice each.
    co = _copurchase_co(spark, sf_dir)
    edges = (
        co.select(
            F.col("a").alias("src"), F.col("b").alias("dst"),
            F.col("co").alias("w"),
        )
        .unionByName(
            co.select(
                F.col("b").alias("src"), F.col("a").alias("dst"),
                F.col("co").alias("w"),
            )
        )
        .localCheckpoint(eager=True)
    )
    l0 = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    # The node count is step-invariant: compute it once and hand it to
    # both steps' broadcast gates instead of paying a count() job per
    # step (ADVICE r15).
    n_nodes = l0.count()
    l1 = label_prop_step(edges, l0, label_rows=n_nodes).localCheckpoint(
        eager=True
    )
    l2 = label_prop_step(edges, l1, label_rows=n_nodes)
    return (
        l1.withColumnRenamed("label", "label_1")
        .join(l2.withColumnRenamed("label", "label_2"), "node")
        .select("node", "label_1", "label_2")
    )


@query(
    "bloom_pruned_revenue",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-reduced selective join (X102): revenue of lineitems whose
    order is 1-URGENT (~20% of orders). The urgent keys build a
    distributed Bloom bitset (one tiny bit_or aggregate); the lineitem
    scan probes it through broadcast word-table joins BEFORE any
    shuffle, so ~80% of the fact table dies map-side; the residual
    left_semi against the exact key set removes Bloom false positives,
    making the result identical to the plain join the oracle runs.

    Scale: this is sideways information passing / Spark's AQE runtime
    bloom filter made explicit — at 100 TB the exchange after the probe
    carries only matching rows plus an (1-e^{-kn/m})^k false-positive
    trickle, and the filter itself is O(num_bits/64) rows, never
    driver-materialized (operators/bloomjoin.py)."""
    from seng550_a3_etl_spark.operators.bloomjoin import bloom_semi_join

    t = load_tables(spark, sf_dir)
    urgent = t.orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    li = t.lineitem.select("l_orderkey", "l_returnflag", "l_extendedprice")
    matched = bloom_semi_join(li, "l_orderkey", urgent, "o_orderkey")
    return matched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


@query(
    "copurchase_triangles",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e AS (
      SELECT DISTINCT x.p AS a, y.p AS b
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
    ),
    deg AS (
      SELECT node, COUNT(*) AS deg
      FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
      GROUP BY node
    )
    SELECT (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT CAST(SUM(deg * (deg - 1)) AS BIGINT) // 2 FROM deg)
             AS n_wedges,
           (SELECT COUNT(*)
            FROM e e1
            JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles
    """,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle census (X103) of the part co-purchase
    graph — n_edges / n_wedges / n_triangles, the inputs to the global
    clustering coefficient 3T/W that community-structure and template-
    spam monitors track on co-occurrence and near-dup graphs.

    Scale: the wedge self-join is the quadratic hazard — C(deg, 2) per
    node explodes on hub nodes. operators/graph.triangle_count orients
    every edge from its (degree, id)-smaller endpoint first, capping
    out-degree at O(sqrt(m)) and total wedge candidates at O(m^1.5)
    INDEPENDENT of skew (Suri-Vassilvitskii); the close is a left_semi
    equi-join back to the canonical edge set. The oracle counts the
    same triangles via the a<b<c triple join DuckDB can afford at
    sf0.01.

    Measured cost class (r12, scripts/profile_10x.py
    profile_triangles): for 10x data the only stage that moves is the
    co-purchase edge self-join+distinct (2.2x — the bench replica
    salts orderkeys but keeps baskets, so the DISTINCT edge set is
    identical by design and every post-edge stage is ~1x; max oriented
    out-degree 97 at both scales, the O(sqrt m) cap working).
    Isolated cold-vs-cold query wall is 1.7x for 10x rows; the r11
    spot's 10.4x row was end-of-suite session noise (codegen-cache
    churn after 245 queries), not plan behavior — the query is now
    registered in PROFILES so any future >=8x spot self-explains."""
    from seng550_a3_etl_spark.operators.graph import triangle_count

    # Edge list from the shared co-purchase gold table (r15): the
    # distinct a<b pair keys ARE the self-join's output set (the
    # operator canonicalizes + distincts internally either way, so the
    # duplicate pair rows the old self-join emitted per extra shared
    # order were always collapsed).
    edges = _copurchase_co(spark, sf_dir).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    return triangle_count(edges)


@query(
    "part_name_edit_pairs",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name, p_brand, p_size FROM part
    )
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM p a
    JOIN p b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
     AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def part_name_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance record linkage (X104): near-identical part
    names (Levenshtein <= 3) within (brand, size) blocks — the classic
    entity-resolution shape: a cheap equi-join blocking key bounds the
    candidate set, an exact string metric verifies inside each block;
    C(block, 2) comparisons, never |parts|^2.

    Scale: blocking keys shuffle once (sort-merge self-join on the
    block columns); Spark's three-argument levenshtein(a, b, 3) runs
    the BANDED O(len * threshold) DP and bails to -1 past the bound
    instead of filling the full O(len^2) matrix — at 100 TB the metric
    cost is linear in the text, and the threshold makes the candidate
    filter cheap enough to evaluate inside the join stage. Both engines
    implement standard unit-cost Levenshtein, so the distances are
    oracle-exact."""
    t = load_tables(spark, sf_dir)
    p = t.part.select("p_partkey", "p_name", "p_brand", "p_size")
    a, b = p.alias("a"), p.alias("b")
    d = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 3)
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            d.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


@query(
    "sorted_neighbor_pairs",
    oracle="""
    WITH r AS (
      SELECT p_partkey, p_name,
             row_number() OVER (ORDER BY p_name, p_partkey) AS rk
      FROM part
    )
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(b.rk - a.rk AS INT) AS gap,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM r a JOIN r b ON b.rk BETWEEN a.rk + 1 AND a.rk + 3
    """,
)
def sorted_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted Neighborhood Method candidate pairs (X105, Hernandez &
    Stolfo SIGMOD'95): records sorted on a blocking key pair with their
    3 nearest rank-neighbors — the ER alternative to hard blocking
    (X104) that still pairs near-dups straddling a block boundary; the
    neighbor edit distance is the verify metric.

    Scale: the naive plan is row_number() OVER (ORDER BY ...) — a
    single-partition window that funnels the whole table through one
    task. operators/ranking.global_row_number instead range-partitions
    on the sort key, ranks each partition in parallel, and shifts by
    broadcast per-partition offsets (the zipWithIndex pattern; the only
    driver materialization is numPartitions count rows). Neighbor
    matching is rank arithmetic through the bucketed interval join —
    exactly `window` candidates per row, no self cross-join."""
    from seng550_a3_etl_spark.operators.ranking import (
        sorted_neighborhood_pairs,
    )

    t = load_tables(spark, sf_dir)
    pairs = sorted_neighborhood_pairs(
        t.part.select("p_partkey", "p_name"),
        ["p_name", "p_partkey"],
        "p_partkey",
        window=3,
        carry=["p_name"],
    )
    return pairs.select(
        F.col("p_partkey_a").alias("part_a"),
        F.col("p_partkey_b").alias("part_b"),
        "gap",
        F.levenshtein(F.col("p_name_a"), F.col("p_name_b"))
        .cast("int")
        .alias("edit_dist"),
    )


@query(
    "brand_price_regression",
    oracle="""
    WITH j AS (
      SELECT p_brand,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    s AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM j GROUP BY p_brand
    )
    SELECT p_brand, n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
             AS slope,
           ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
             AS intercept
    FROM s
    """,
)
def brand_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (X106): price-vs-quantity slope and
    intercept per brand — the grouped supervised fit (feature drift /
    pricing-curve monitors) done WITHOUT any per-group model loop or
    Python UDF: the normal equations need only (n, Σx, Σy, Σxy, Σx²),
    which fold map-side in ONE aggregate pass after a broadcast dim
    join; the division happens once per group on rollup-sized data.

    Cross-engine exactness: moments accumulate as integer cents
    (order-independent bigint sums; Σxy ≲ 5e10/row keeps sf1 well
    inside int64 — at larger scale promote to decimal(38,0) like the
    dispersion query), and the final ratios follow the SAME double
    expression tree on both engines before a 9-decimal round."""
    t = load_tables(spark, sf_dir)
    j = t.lineitem.join(
        F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "p_brand",
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    s = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return s.select(
        "p_brand",
        "n",
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / denom,
            9,
        ).alias("slope"),
        F.round(
            (
                F.col("sy").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sxy").cast("double")
            )
            / denom,
            9,
        ).alias("intercept"),
    )


@query(
    "multi_touch_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS pid, CAST(ts AS TIMESTAMP) AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, event_id AS cid, CAST(ts AS TIMESTAMP) AS cts
      FROM events WHERE event_type = 'click'
    ),
    touches AS (
      SELECT p.pid, c.cid, c.cts,
             ROW_NUMBER() OVER (PARTITION BY p.pid
                                ORDER BY c.cts, c.cid) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY p.pid
                                ORDER BY c.cts DESC, c.cid DESC) AS rn_last,
             COUNT(*) OVER (PARTITION BY p.pid) AS n_touch
      FROM p JOIN c ON c.user_id = p.user_id
                   AND c.cts < p.pts
                   AND c.cts >= p.pts - INTERVAL 1 HOUR
    ),
    melted AS (
      SELECT 'first_touch' AS model, cts,
             CASE WHEN rn_first = 1 THEN 1.0 ELSE 0.0 END AS credit
      FROM touches
      UNION ALL
      SELECT 'last_touch', cts,
             CASE WHEN rn_last = 1 THEN 1.0 ELSE 0.0 END
      FROM touches
      UNION ALL
      SELECT 'linear', cts, 1.0 / n_touch FROM touches
    )
    SELECT model,
           strftime(CAST(cts AS DATE), '%Y-%m-%d') AS click_day,
           ROUND(SUM(credit), 4) AS credited_conversions,
           CAST(COUNT(CASE WHEN credit > 0 THEN 1 END) AS BIGINT)
             AS n_credited_touches
    FROM melted GROUP BY 1, 2
    """,
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X134 — multi-touch conversion attribution, three models at once
    (first-touch / last-touch / linear): each purchase's credit is
    assigned to the same user's clicks in the preceding hour (the
    lookback the X23/X108 streaming attribution uses), then rolled up
    to credited conversions per click-day per model — the marketing /
    growth analytics counterpart of the streaming join, answering
    "which day's clicks actually drove purchases, under which credit
    rule".

    Scale: the touch join is the bounded equi+range shape (user
    equi-key, 1-hour event-time band — the same state-bounding
    argument as the streaming twin); all three ranking windows share
    the per-purchase partitioning (clicks-per-purchase-window rows
    each, one shuffle); the melt is a 3× union of the touch rollup and
    folds to |days|·3 rows. Linear credits are 1/n doubles — the
    per-group sum is rounded at 4, inside the suite's float rule."""
    t = load_tables(spark, sf_dir)
    ev = t.events
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    touches = p.join(
        c,
        (p.user_id == c.user_id)
        & (F.col("cts") < F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
    ).select("pid", "cid", "cts")
    wf = Window.partitionBy("pid").orderBy("cts", "cid")
    wl = Window.partitionBy("pid").orderBy(
        F.col("cts").desc(), F.col("cid").desc()
    )
    wn = Window.partitionBy("pid")
    ranked = touches.select(
        "cts",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        F.count(F.lit(1)).over(wn).alias("n_touch"),
    )
    melted = ranked.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.when(F.col("rn_first") == 1, 1.0)
                    .otherwise(0.0)
                    .alias("credit"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.when(F.col("rn_last") == 1, 1.0)
                    .otherwise(0.0)
                    .alias("credit"),
                ),
                F.struct(
                    F.lit("linear").alias("model"),
                    (1.0 / F.col("n_touch")).alias("credit"),
                ),
            )
        ).alias("m"),
        "cts",
    )
    return (
        melted.select(
            F.col("m.model").alias("model"),
            F.date_format(F.col("cts").cast("date"), "yyyy-MM-dd").alias(
                "click_day"
            ),
            F.col("m.credit").alias("credit"),
        )
        .groupBy("model", "click_day")
        .agg(
            F.round(F.sum("credit"), 4).alias("credited_conversions"),
            F.count(F.when(F.col("credit") > 0, 1)).alias(
                "n_credited_touches"
            ),
        )
    )


def _pr3_oracle(steps: int = 3) -> str:
    parts = []
    for k in range(1, steps + 1):
        parts.append(f"""
    s{k} AS (
      SELECT e.dst AS node,
             SUM(CAST(ROUND(0.85 * e.w * r{k - 1}.p / ow.ow) AS BIGINT))
               AS c
      FROM e JOIN ow USING (src) JOIN r{k - 1} ON r{k - 1}.node = e.src
      GROUP BY 1
    ),
    r{k} AS (
      SELECT nodes.node, t.t + COALESCE(s{k}.c, 0) AS p
      FROM nodes LEFT JOIN s{k} USING (node) CROSS JOIN tele t
    )""")
    return f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, p_brand AS b
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    e AS (
      SELECT a.b AS src, b2.b AS dst, COUNT(*) AS w
      FROM op a JOIN op b2 ON a.o = b2.o AND a.b != b2.b
      GROUP BY 1, 2
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    ow AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1),
    tele AS (
      SELECT CAST(ROUND((1.0 - 0.85) / n.n * 1000000000000.0) AS BIGINT)
               AS t
      FROM n
    ),
    r0 AS (
      SELECT node, CAST(ROUND(1000000000000.0 / n.n) AS BIGINT) AS p
      FROM nodes CROSS JOIN n
    ),{",".join(parts)}
    SELECT node AS brand, CAST(p AS BIGINT) AS pr_pico,
           ROUND(p / 1e12, 9) AS pr
    FROM r{steps}
    """


@query("pagerank_brands_3step", oracle=_pr3_oracle())
def pagerank_brands_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X144 — three full PageRank power iterations over the brand
    co-purchase graph: the driver-looped fixpoint pagerank_step_parts
    (X100) shows one round of, run end-to-end — the rank vector is
    carried BETWEEN rounds as integer picos, so every intermediate
    state is engine-identical and the oracle replays all three rounds
    as unrolled CTEs (checking the iteration machinery, not just one
    step's arithmetic).

    Scale: the expensive co-purchase edge build is pinned once; each
    round is one src-key join + one dst-key sum (two node-key shuffles)
    with the rank frame checkpointed per round for lineage truncation —
    convergence costs steps × bounded work, nothing corpus-sized on
    the driver (operators/graph.py:pagerank_iterate)."""
    from seng550_a3_etl_spark.operators.graph import pagerank_iterate

    t = load_tables(spark, sf_dir)
    op = (
        t.lineitem.join(
            t.part, t.lineitem["l_partkey"] == t.part["p_partkey"]
        )
        .select(
            F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b")
        )
        .distinct()
    )
    a, b2 = op.alias("a"), op.alias("b2")
    edges = (
        a.join(
            b2,
            (F.col("a.o") == F.col("b2.o"))
            & (F.col("a.b") != F.col("b2.b")),
        )
        .groupBy(F.col("a.b").alias("src"), F.col("b2.b").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    out = pagerank_iterate(edges, steps=3)
    return out.select(
        F.col("node").alias("brand"), "pr_pico", "pr"
    )


# --------------------------------------------------------------------------
# X149 — exact largest-remainder allocation (money proration).
# --------------------------------------------------------------------------


@query(
    "revenue_proration",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             {_DUCK_CENTS.format(col="l_extendedprice")} AS w
      FROM lineitem
      WHERE {duck_hash64("CAST(l_orderkey AS VARCHAR)", seed=9)} % 20 = 0
    ),
    j AS (
      SELECT li.*, {_DUCK_CENTS.format(col="o_totalprice")} AS t,
             SUM(w) OVER (PARTITION BY l_orderkey) AS tw
      FROM li JOIN orders ON o_orderkey = l_orderkey
    ),
    b AS (
      SELECT *, (t * w) // tw AS base, (t * w) % tw AS fracrem FROM j
    ),
    r AS (
      SELECT *,
             t - SUM(base) OVER (PARTITION BY l_orderkey) AS rem,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY fracrem DESC, l_linenumber) AS rk
      FROM b
    )
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_cents
    FROM r
    """,
)
def revenue_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X149 — largest-remainder (Hamilton) allocation: each order's
    total price, in integer cents, is spread across its lineitems
    proportional to extended price so that the per-order allocations
    sum EXACTLY to the order total — floor shares first, then the
    leftover cents go to the largest fractional remainders (tiebreak:
    line number). The standard warehouse proration for spreading
    shipping/discount/budget over components without losing a cent;
    a float-multiply-and-round version fails the sum invariant.

    All arithmetic is int64 (t*w peaks ~5e14 for TPC-H-bounded prices
    — magnitudes are per-order, so the bound is scale-free), so both
    engines agree bit-for-bit; the sum invariant is property-tested on
    random inputs against the same operator this query runs
    (operators/stats.largest_remainder).

    Scale: the 5% hash filter evaluates in the scan; one shuffle on the
    order key drives the join and all three windows (same key, one
    exchange); per-order window state is bounded by lines-per-order."""
    from seng550_a3_etl_spark.operators.stats import largest_remainder

    t = load_tables(spark, sf_dir)
    keep = hash64(F.col("l_orderkey").cast("string"), seed=9) % 20 == 0
    li = t.lineitem.filter(keep).select(
        "l_orderkey", "l_linenumber", _cents("l_extendedprice").alias("w")
    )
    o = t.orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        _cents("o_totalprice").alias("t"),
    )
    j = li.join(o, "l_orderkey")
    out = largest_remainder(
        j,
        key_cols=["l_orderkey"],
        weight_col="w",
        total_col="t",
        order_cols=["l_linenumber"],
        out_col="alloc_cents",
    )
    return out.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "alloc_cents",
    )


# --------------------------------------------------------------------------
# X151 — weighted median via cumulative-weight rank.
# --------------------------------------------------------------------------


@query(
    "weighted_median_price",
    oracle=f"""
    WITH li AS (
      SELECT p_brand,
             {_DUCK_CENTS.format(col="l_extendedprice")} AS price,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    c AS (
      SELECT *,
             SUM(w) OVER (PARTITION BY p_brand
                          ORDER BY price, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER (PARTITION BY p_brand) AS tot
      FROM li
    )
    SELECT p_brand,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN price END) AS BIGINT)
             AS wmedian_cents,
           CAST(MAX(tot) AS BIGINT) AS total_qty,
           COUNT(*) AS n_items
    FROM c
    GROUP BY 1
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X151 — quantity-weighted median extended price per brand: the
    smallest price whose cumulative quantity reaches half the brand's
    total — what "median unit price" actually means when each line
    carries many units, and a shape percentile_approx cannot weight.

    Determinism: weights and prices are integers; the cumulative sum
    runs over the total order (price, orderkey, linenumber) with an
    explicit ROWS frame (unique key, so RANGE vs ROWS can't diverge);
    the 2*cum >= tot rank test is pure int64. The half-weight boundary
    is tie-prone at tiny n — pinned in the parity matrix.

    Scale: one shuffle on p_brand for the windows (the lineitem-part
    join shuffles on partkey first; at 100 TB AQE picks the join side).
    Per-brand running state is O(1); output is |brands| rows. The rank
    machinery is operators/stats.weighted_median, property-tested on
    random inputs against a brute-force weighted median."""
    from seng550_a3_etl_spark.operators.stats import weighted_median

    t = load_tables(spark, sf_dir)
    li = t.lineitem.join(
        t.part, t.lineitem.l_partkey == t.part.p_partkey
    ).select(
        "p_brand",
        _cents("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    out = weighted_median(
        li,
        part_cols=["p_brand"],
        value_col="price",
        weight_col="w",
        order_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "p_brand",
        F.col("wmedian").alias("wmedian_cents"),
        F.col("total_weight").alias("total_qty"),
        F.col("n_rows").alias("n_items"),
    )


# --------------------------------------------------------------------------
# X152 — co-purchase Jaccard recommendations (basket-bounded pair gen).
# --------------------------------------------------------------------------


@query(
    "copurchase_jaccard_recs",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    deg AS (SELECT p, COUNT(*) AS n FROM op GROUP BY p),
    co AS (
      SELECT x.p AS a, y.p AS b, COUNT(*) AS co
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
      GROUP BY 1, 2
    ),
    sim AS (
      SELECT a, b, co,
             (co * 1000000000) // (da.n + db.n - co) AS jaccard_ppb
      FROM co JOIN deg da ON da.p = a JOIN deg db ON db.p = b
    ),
    dirs AS (
      SELECT a AS src_part, b AS rec_part, co, jaccard_ppb FROM sim
      UNION ALL
      SELECT b AS src_part, a AS rec_part, co, jaccard_ppb FROM sim
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY src_part
                                   ORDER BY jaccard_ppb DESC, co DESC,
                                            rec_part) AS rk
      FROM dirs
    )
    SELECT src_part, rec_part, CAST(co AS BIGINT) AS co,
           CAST(jaccard_ppb AS BIGINT) AS jaccard_ppb,
           CAST(rk AS BIGINT) AS rank
    FROM rk WHERE rk <= 3
    """,
)
def copurchase_jaccard_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X152 — "customers also bought": top-3 co-purchase neighbors per
    part by basket Jaccard co(a,b) / (n(a)+n(b)-co) — the item-item
    collaborative-filtering kernel.

    Determinism: similarity is ranked AND emitted as an exact integer
    (parts-per-billion via int64 integer division), never a float — the
    [[token-pmi]] rational-ordering recipe — with (co, part id)
    tiebreaks, so top-3 membership is engine-exact even under dense
    ties (pinned in the parity matrix).

    Scale: candidate pairs are generated per ORDER via
    operators/text_dedup.bucket_pairs (collect each basket's sorted
    parts, emit C(basket, 2) with array HOFs) — ONE pass and one
    shuffle instead of a basket self-join, and the blow-up is bounded
    by lines per order (<=7), independent of how popular a part is;
    the hub-node hazard of a part-keyed self-join never arises. One
    groupBy on the pair, degree joins are |parts|-sized, and top-3 is
    a rank window per part (state O(1) per key after the pair rollup).
    jaccard_ppb peaks at 1e9 — co * 1e9 stays far inside int64."""
    # op and the (a, b, co) rollup come from the shared co-purchase
    # gold table (r15 — both were already built in exactly this shape
    # here); sim still pins because both direction projections of the
    # union re-read it.
    op = _copurchase_op(spark, sf_dir)
    deg = op.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    co = _copurchase_co(spark, sf_dir)
    da = deg.select(F.col("p").alias("a"), F.col("n").alias("na"))
    db = deg.select(F.col("p").alias("b"), F.col("n").alias("nb"))
    sim = (
        co.join(da, "a")
        .join(db, "b")
        .select(
            "a", "b", "co",
            F.expr("co * 1000000000 DIV (na + nb - co)").alias("jaccard_ppb"),
        )
        .localCheckpoint(eager=True)
    )
    both = sim.select(
        F.col("a").alias("src_part"), F.col("b").alias("rec_part"),
        "co", "jaccard_ppb",
    ).unionByName(
        sim.select(
            F.col("b").alias("src_part"), F.col("a").alias("rec_part"),
            "co", "jaccard_ppb",
        )
    )
    wr = Window.partitionBy("src_part").orderBy(
        F.desc("jaccard_ppb"), F.desc("co"), "rec_part"
    )
    return (
        both.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 3)
    )


# --------------------------------------------------------------------------
# X153 — 2-D skyline (Pareto frontier) per category.
# --------------------------------------------------------------------------


@query(
    "pareto_price_quantity",
    oracle=f"""
    WITH pa AS (
      SELECT p_type,
             p_partkey,
             MIN({_DUCK_CENTS.format(col="l_extendedprice")}) AS min_price,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1, 2
    ),
    w AS (
      SELECT *,
             MAX(total_qty) OVER (
               PARTITION BY p_type ORDER BY min_price
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_cheaper,
             MAX(total_qty) OVER (
               PARTITION BY p_type, min_price
             ) AS best_same
      FROM pa
    )
    SELECT p_type, p_partkey, CAST(min_price AS BIGINT) AS min_price,
           total_qty
    FROM w
    WHERE (best_cheaper IS NULL OR total_qty > best_cheaper)
      AND total_qty = best_same
    """,
)
def pareto_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X153 — 2-D skyline query: per part type, the parts on the
    (cheapest observed sale price, highest total quantity sold) Pareto
    frontier — no other part of the type is at-least-as-cheap AND
    at-least-as-popular with one strict. The classic skyline operator
    (Borzsony et al., ICDE'01), the shape behind "best tradeoff"
    product screens.

    The O(n^2) NOT-EXISTS domination test collapses to two window
    maxima over the price order: a part survives iff it beats the best
    quantity at any STRICTLY cheaper price (RANGE excludes price ties)
    and matches the best quantity at its OWN price (exact duplicates
    are mutually non-dominating and all survive). Pure int64
    comparisons; tie density is scale-dependent — pinned in the parity
    matrix.

    Scale: the rollup is one (type, part) shuffle; the skyline windows
    partition by p_type, so no global sort — each type's frontier scan
    is a linear pass with O(1) running state."""
    t = load_tables(spark, sf_dir)
    pa = (
        t.lineitem.join(t.part, t.lineitem.l_partkey == t.part.p_partkey)
        .groupBy("p_type", "p_partkey")
        .agg(
            F.min(_cents("l_extendedprice")).alias("min_price"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("total_qty"),
        )
    )
    wc = (
        Window.partitionBy("p_type")
        .orderBy("min_price")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    ws = Window.partitionBy("p_type", "min_price")
    w = pa.select(
        "p_type", "p_partkey", "min_price", "total_qty",
        F.max("total_qty").over(wc).alias("best_cheaper"),
        F.max("total_qty").over(ws).alias("best_same"),
    )
    return w.filter(
        (F.col("best_cheaper").isNull()
         | (F.col("total_qty") > F.col("best_cheaper")))
        & (F.col("total_qty") == F.col("best_same"))
    ).select("p_type", "p_partkey", "min_price", "total_qty")


# --------------------------------------------------------------------------
# X154 — semi-additive measure (last-value-per-period balance rollup).
# --------------------------------------------------------------------------


@query(
    "weekly_last_balance",
    oracle="""
    WITH obs AS (
      SELECT user_id, ts, event_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, wk
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM obs
    ),
    m AS (
      SELECT wk,
             CAST(SUM(cents) AS BIGINT) AS total_balance_cents,
             COUNT(*) AS n_users
      FROM r WHERE rn = 1
      GROUP BY 1
    )
    SELECT strftime(DATE '1970-01-01' + INTERVAL (wk * 7) DAY, '%Y-%m-%d')
             AS week_start,
           total_balance_cents, n_users,
           CAST(total_balance_cents
                - COALESCE(LAG(total_balance_cents) OVER (ORDER BY wk), 0)
             AS BIGINT) AS wow_delta_cents
    FROM m
    """,
)
def weekly_last_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X154 — semi-additive measure: treating each event's value as a
    balance observation, the week-end balance per user is the LAST
    observation in the week (by ts, event_id), and the weekly total is
    the sum of those last values — the account-balance/inventory
    semantics where summing over time double-counts and only the
    period-end snapshot is additive across entities. Plus the
    week-over-week delta via lag.

    Determinism: weeks are epoch-day DIV 7 (timezone-free integer
    bucketing, dodging both engines' week-of-year conventions),
    last-per-(user, week) is a unique-keyed rank, sums are integer
    cents, the delta is int64 with a COALESCE(0) first week.

    Scale: one (user, week) shuffle for the rank; the weekly rollup
    folds to |weeks| rows, so the unpartitioned lag window over it is
    driver-trivial (the gapfill_daily_series precedent — a global
    window is fine on a period-sized frame, never on row-scale data)."""
    t = load_tables(spark, sf_dir)
    epoch = F.lit("1970-01-01").cast("date")
    obs = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "datediff(to_date(ts), date'1970-01-01') DIV 7"
        ).alias("wk"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    wr = Window.partitionBy("user_id", "wk").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    last = obs.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") == 1
    )
    m = last.groupBy("wk").agg(
        F.sum("cents").cast("long").alias("total_balance_cents"),
        F.count(F.lit(1)).alias("n_users"),
    )
    wl = Window.orderBy("wk")
    return m.select(
        F.date_format(
            F.date_add(epoch, (F.col("wk") * 7).cast("int")), "yyyy-MM-dd"
        ).alias("week_start"),
        "total_balance_cents",
        "n_users",
        (
            F.col("total_balance_cents")
            - F.coalesce(
                F.lag("total_balance_cents").over(wl), F.lit(0)
            )
        ).cast("long").alias("wow_delta_cents"),
    )


# --------------------------------------------------------------------------
# X159 — association-rule census over order baskets.
# --------------------------------------------------------------------------

# Minimum co-occurrence count for a rule to be emitted (the classic
# min-support cut that bounds rule-set size).
_RULE_MIN_CO = 2


@query(
    "basket_lift_rules",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
    deg AS (SELECT p, COUNT(*) AS np FROM op GROUP BY p),
    co AS (
      SELECT x.p AS a, y.p AS b, COUNT(*) AS co
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
      GROUP BY 1, 2
    ),
    pairs AS (SELECT a, b, co FROM co WHERE co >= {_RULE_MIN_CO}),
    dirs AS (
      SELECT a AS ant, b AS cons, co FROM pairs
      UNION ALL
      SELECT b AS ant, a AS cons, co FROM pairs
    )
    SELECT ant, cons, CAST(co AS BIGINT) AS co,
           CAST(CAST(co AS HUGEINT) * 1000000000 // n_orders AS BIGINT)
             AS support_ppb,
           CAST(CAST(co AS HUGEINT) * 1000000000 // da.np AS BIGINT)
             AS confidence_ppb,
           CAST(CAST(co AS HUGEINT) * n_orders * 1000000
                // (CAST(da.np AS HUGEINT) * db.np) AS BIGINT) AS lift_ppm
    FROM dirs
    JOIN deg da ON da.p = ant
    JOIN deg db ON db.p = cons
    CROSS JOIN n
    """,
)
def basket_lift_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule census (X159): for every ordered co-purchased
    part pair (antecedent → consequent) above the min-support cut,
    emit support, confidence, and lift — the market-basket trio that
    X152's Jaccard recs don't express (lift is the independence-
    normalized signal merchandising actually thresholds on). All three
    are exact integers via decimal(38,0) numerators ÷ HUGEINT on the
    oracle side — no float enters the comparison, and no int64 product
    (the X137 overflow lesson: co·1e9 and co·N·1e6 both overflow int64
    around sf1000, where DuckDB errors and Spark wraps silently;
    decimal does not).

    Scale: identical pair-generation shape to X152 — per-basket
    ``bucket_pairs`` (C(basket,2) bounded by lines-per-order, hub-part
    safe), one pair groupBy, |parts|-sized degree joins, scalar
    order-count broadcast. The min-support filter bounds the rule set
    before the direction union doubles it."""
    # Shared co-purchase gold table (r15): op and the (a, b, co) rollup
    # were already bucket_pairs-shaped here — now cached once per
    # session and shared with the pagerank/LPA/triangle/k-core family.
    op = _copurchase_op(spark, sf_dir)
    n = op.agg(F.count_distinct("o").alias("n_orders"))
    deg = op.groupBy("p").agg(F.count(F.lit(1)).alias("np"))
    pairs = _copurchase_co(spark, sf_dir).filter(
        F.col("co") >= _RULE_MIN_CO
    )
    dirs = pairs.select(
        F.col("a").alias("ant"), F.col("b").alias("cons"), "co"
    ).unionByName(
        pairs.select(F.col("b").alias("ant"), F.col("a").alias("cons"), "co")
    )
    da = deg.select(F.col("p").alias("ant"), F.col("np").alias("na"))
    db = deg.select(F.col("p").alias("cons"), F.col("np").alias("nb"))
    return (
        dirs.join(da, "ant")
        .join(db, "cons")
        .crossJoin(F.broadcast(n))
        .select(
            "ant",
            "cons",
            F.col("co").cast("long").alias("co"),
            F.expr(
                "CAST(co AS DECIMAL(38,0)) * 1000000000 DIV n_orders"
            ).alias("support_ppb"),
            F.expr(
                "CAST(co AS DECIMAL(38,0)) * 1000000000 DIV na"
            ).alias("confidence_ppb"),
            F.expr(
                "CAST(co AS DECIMAL(38,0)) * n_orders * 1000000 "
                "DIV (CAST(na AS DECIMAL(38,0)) * nb)"
            ).alias("lift_ppm"),
        )
    )


# k-core knobs (X206): the repeat-co-purchase backbone (pairs sharing
# >= _KCORE_MINW distinct orders — the single-order graph is too dense
# to have core structure at fixture scale: min degree 42), peel
# threshold, and bounded peel passes.
_KCORE_MINW = 2
_KCORE_K = 3
_KCORE_T = 3


def _kcore_oracle(t: int = _KCORE_T) -> str:
    """Replay ``t`` peel passes in SQL CTEs (the kmeans-iter oracle
    pattern): degree census, keep >= K, filter both endpoints."""
    blocks = [
        "op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        "FROM lineitem)",
        "e0 AS (SELECT a, b FROM ("
        "SELECT x.p AS a, y.p AS b, COUNT(*) AS w "
        "FROM op x JOIN op y ON x.o = y.o AND x.p < y.p "
        f"GROUP BY 1, 2) WHERE w >= {_KCORE_MINW})",
    ]
    for i in range(1, t + 1):
        blocks.append(
            f"d{i} AS (SELECT node, COUNT(*) AS deg FROM "
            f"(SELECT a AS node FROM e{i - 1} "
            f"UNION ALL SELECT b FROM e{i - 1}) GROUP BY node)"
        )
        blocks.append(
            f"k{i} AS (SELECT node FROM d{i} WHERE deg >= {_KCORE_K})"
        )
        blocks.append(
            f"e{i} AS (SELECT a, b FROM e{i - 1} "
            f"WHERE a IN (SELECT node FROM k{i}) "
            f"AND b IN (SELECT node FROM k{i}))"
        )
    return (
        "WITH " + ",\n".join(blocks)
        + f"""
    SELECT node, CAST(deg AS BIGINT) AS degree,
           deg >= {_KCORE_K} AS stable
    FROM (SELECT node, COUNT(*) AS deg FROM
          (SELECT a AS node FROM e{t} UNION ALL SELECT b FROM e{t})
          GROUP BY node)"""
    )


@query("kcore_decomposition", oracle=_kcore_oracle())
def kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peel (X206) of the repeat-co-purchase backbone:
    iteratively remove nodes of degree < k (k=3, 3 passes) — the
    standard community-backbone / spam-farm extraction the cc/LPA/
    PageRank family lacks: cores survive degree pruning CASCADES,
    which no single degree filter computes (a node above threshold
    dies when its neighbors die). Output per surviving node: its
    degree in the peeled subgraph and whether the NEXT peel would keep
    it (at fixpoint all true; sf0.01 reaches 1535/1538 stable by pass
    3 — the bounded-T demo of a loop production runs to fixpoint).

    Determinism: pure integer set/count logic — no floats anywhere.

    Scale: per pass = ONE map-side-combined degree aggregate over the
    current edge list plus two semi-joins keyed on the endpoints; the
    edge set only shrinks, so pass cost is monotone non-increasing.
    Edges pin per pass (localCheckpoint — the kmeans/LPA iterated-
    frame recipe: the next pass and the final census must not replay
    the whole peel lineage). The backbone build is the X102 distinct
    pair explode, bounded by basket size."""
    # Backbone from the shared co-purchase gold table (r15): the
    # weighted a<b pair counts are exactly the old self-join rollup;
    # the checkpoint stays because the peel loop's first pass reads the
    # edge list three times.
    edges = (
        _copurchase_co(spark, sf_dir)
        .filter(F.col("co") >= _KCORE_MINW)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(
                F.explode(F.array(F.col("a"), F.col("b"))).alias("node")
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    for _ in range(_KCORE_T):
        keep = degrees(edges).filter(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(
                keep.withColumnRenamed("node", "a"), "a", "left_semi"
            )
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return degrees(edges).select(
        "node",
        F.col("deg").cast("long").alias("degree"),
        (F.col("deg") >= _KCORE_K).alias("stable"),
    )


# --------------------------------------------------------------------------
# X246 — histogram-based decision-tree split search (the distributed
# GBDT pattern: one boosting round's exact split finding from binned
# feature histograms).
# --------------------------------------------------------------------------


def _gini_gain_sql(nl: str, pl: str, nt: str, pt: str) -> str:
    """Gini impurity decrease for a binary split, as ONE SQL expression
    both engines parse identically (single-sourced so the Spark
    ``F.expr`` and the DuckDB oracle compute bit-equal doubles: same
    integer inputs, same operation order — the standing float rule).
    Args are SQL sub-expressions for DOUBLE-cast counts: left rows/
    positives, total rows/positives."""

    def gini(n: str, p: str) -> str:
        return (
            f"(1.0 - ({p} / {n}) * ({p} / {n}) - "
            f"(({n} - {p}) / {n}) * (({n} - {p}) / {n}))"
        )

    nr, pr = f"({nt} - {nl})", f"({pt} - {pl})"
    return (
        f"({gini(nt, pt)} - ({nl} / {nt}) * {gini(nl, pl)} - "
        f"({nr} / {nt}) * {gini(nr, pr)})"
    )


_SPLIT_GAIN = _gini_gain_sql(
    "CAST(nl AS DOUBLE)", "CAST(pl AS DOUBLE)",
    "CAST(nt AS DOUBLE)", "CAST(pt AS DOUBLE)",
)

# Deterministic fixed-width binning (FLOOR on both engines — a bare
# double->int CAST truncates in Spark but ROUNDS in DuckDB).
_SPLIT_BINS = [
    ("quantity", "CAST(FLOOR(l_quantity) AS BIGINT)"),
    ("price", "LEAST(31, CAST(FLOOR(l_extendedprice / 2000) AS BIGINT))"),
    ("discount", "CAST(ROUND(l_discount * 100) AS BIGINT)"),
]


@query(
    "tree_split_gain",
    oracle=f"""
    WITH fb AS (
      {" UNION ALL ".join(
          f'''SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                 '{name}' AS feature, {bin_sql} AS bin FROM lineitem'''
          for name, bin_sql in _SPLIT_BINS
      )}
    ),
    h AS (
      SELECT feature, bin, COUNT(*) AS n, SUM(y) AS p
      FROM fb GROUP BY 1, 2
    ),
    c AS (
      SELECT feature, bin,
             CAST(SUM(n) OVER w AS BIGINT) AS nl,
             CAST(SUM(p) OVER w AS BIGINT) AS pl,
             CAST(SUM(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
             CAST(SUM(p) OVER (PARTITION BY feature) AS BIGINT) AS pt
      FROM h WINDOW w AS (PARTITION BY feature ORDER BY bin)
    )
    SELECT feature, bin AS split_bin, nl, pl,
           (nt - nl) AS nr, (pt - pl) AS pr,
           ROUND({_SPLIT_GAIN}, 6) AS gain
    FROM c WHERE nl < nt
    """,
)
def tree_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One boosting round's exact split search, the way distributed
    GBDT implementations (XGBoost approx/hist, LightGBM) actually run
    it: bin each feature to a fixed-width histogram, aggregate (rows,
    positives) per (feature, bin) — the ONLY stage that touches the
    fact table — then score every candidate threshold "bin <= b" by
    Gini impurity decrease from cumulative sums over the tiny
    histogram. Target: l_returnflag = 'R'; features: quantity (unit
    bins), extendedprice (2000-wide, capped at 31), discount (percent
    points).

    Engine: ONE scan of lineitem with a 3-struct explode (each row
    emits its 3 (feature, bin) cells), map-side-combined groupBy to
    <= ~100 histogram cells, then two windows (cumulative + per-
    feature total) and the shared gain expression over the rollup.
    The gain formula is single-sourced (_gini_gain_sql) into both the
    Spark plan and the oracle — same integer counts, same operation
    order, bit-equal doubles (rounded at 6 for the record).

    Scale: this is THE pattern that makes tree training feasible at
    100 TB — the shuffle carries |features| x |bins| cells (here ~90
    rows), never examples, and deeper trees just add a node-id column
    to the groupBy key. Candidate splits with an empty right child
    are excluded (nl < nt)."""
    t = load_tables(spark, sf_dir)
    cells = t.lineitem.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("feature"),
                    F.expr(bin_sql).alias("bin"),
                )
                for name, bin_sql in _SPLIT_BINS
            ])
        ).alias("fb"),
    ).select("y", "fb.feature", "fb.bin")
    h = cells.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")
    )
    w_cum = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("feature")
    c = h.select(
        "feature",
        "bin",
        F.sum("n").over(w_cum).cast("long").alias("nl"),
        F.sum("p").over(w_cum).cast("long").alias("pl"),
        F.sum("n").over(w_all).cast("long").alias("nt"),
        F.sum("p").over(w_all).cast("long").alias("pt"),
    )
    return c.filter(F.col("nl") < F.col("nt")).select(
        "feature",
        F.col("bin").alias("split_bin"),
        "nl",
        "pl",
        (F.col("nt") - F.col("nl")).alias("nr"),
        (F.col("pt") - F.col("pl")).alias("pr"),
        F.round(F.expr(_SPLIT_GAIN), 6).alias("gain"),
    )
