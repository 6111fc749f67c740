"""Sketch suite queries: oracle-checked approximate distinct counting.

The KMV estimate is deterministic arithmetic over the cross-engine
md5-60bit hash, so — unusually for an *approximate* aggregate — DuckDB
replays it bit-for-bit (SURVEY §2.10 X22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.functions.hashing import duck_hash64
from seng550_a3_etl_spark.operators.sketch import (
    duck_hll_estimate,
    duck_kmv_estimate,
    kmv_distinct,
    kmv_setops,
)
from seng550_a3_etl_spark.suite.registry import query

_K = 64


@query(
    "kmv_distinct_users",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             {duck_hash64("CAST(user_id AS VARCHAR)")} AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    minima AS (
      SELECT event_type,
             list_sort(list(h))[1:{_K}] AS hs
      FROM hashed GROUP BY event_type
    )
    SELECT event_type,
           {duck_kmv_estimate("hs", _K)} AS est_users
    FROM minima
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the KMV sketch: bounded O(k)
    state per key end-to-end (partition-local min-k combine, then one
    merge shuffle of ≤ k·partitions hashes per key) — the scale path
    where exact COUNT(DISTINCT) would shuffle every distinct user. The
    estimate itself is deterministic, hence fully oracle-checked."""
    t = load_tables(spark, sf_dir)
    return kmv_distinct(
        t.events,
        ["event_type"],
        F.col("user_id").cast("string"),
        k=_K,
        est_col="est_users",
    )


_JK = 64  # sketch size for the join-cardinality estimate


@query(
    "kmv_join_cardinality",
    oracle=f"""
    WITH ha AS (
      SELECT DISTINCT {duck_hash64("CAST(o_custkey AS VARCHAR)")} AS h
      FROM orders WHERE o_orderstatus = 'F'
    ),
    hb AS (
      SELECT DISTINCT {duck_hash64("CAST(c_custkey AS VARCHAR)")} AS h
      FROM customer WHERE c_acctbal > 1000
    ),
    sa AS (SELECT list_sort(list(h))[1:{_JK}] AS la FROM ha),
    sb AS (SELECT list_sort(list(h))[1:{_JK}] AS lb FROM hb),
    m AS (
      SELECT la, lb,
             list_sort(list_distinct(la || lb))[1:{_JK}] AS hm
      FROM sa, sb
    ),
    est AS (
      SELECT {duck_kmv_estimate("hm", _JK)} AS est_union,
             len(list_filter(hm, x ->
               list_contains(la, x) AND list_contains(lb, x))) AS k_int,
             LEAST({_JK}, len(hm)) AS k_eff
      FROM m
    ),
    exact AS (
      SELECT (SELECT COUNT(DISTINCT o_custkey) FROM orders
              WHERE o_orderstatus = 'F') AS n_a,
             (SELECT COUNT(DISTINCT c_custkey) FROM customer
              WHERE c_acctbal > 1000) AS n_b,
             (SELECT COUNT(*) FROM
               (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderstatus = 'F' AND o_custkey IN
                  (SELECT c_custkey FROM customer WHERE c_acctbal > 1000))
             ) AS exact_inter
    )
    SELECT CAST({_JK} AS BIGINT) AS k,
           ROUND(est_union, 4) AS est_union,
           ROUND(k_int / CAST(k_eff AS DOUBLE) * est_union, 4) AS est_inter,
           CAST(n_a + n_b - exact_inter AS BIGINT) AS exact_union,
           CAST(exact_inter AS BIGINT) AS exact_inter
    FROM est, exact
    """,
)
def kmv_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates (X97): estimate the distinct-key
    UNION and INTERSECTION cardinalities between two tables' join keys
    from two k-minimum-values sketches — the synopsis a planner (or the
    X82 skew report's big sibling) consults to predict join output size
    WITHOUT scanning either table twice. Sketch algebra per Beyer et
    al.: merge both min-k sets, re-take the k smallest for the union
    estimate; the intersection estimate scales the union estimate by
    the fraction of merged minima present in BOTH sketches. When the
    true union has fewer than k keys the sketch degenerates to the
    exact answer (k_eff = |merged|). Deterministic md5-60bit hashing
    makes even the *approximate* numbers oracle-checkable; the exact
    counts ride along so the output doubles as an accuracy report.

    Scale: each side folds to its k smallest distinct hashes via
    TakeOrdered (per-partition heaps + driver merge — never a global
    sort); everything after is arithmetic on two k-element arrays. The
    exact counts are one distinct-agg per side plus a broadcast semi
    join — they exist for the report; a planner would keep sketches
    only."""
    t = load_tables(spark, sf_dir)
    # two genuinely partial-overlapping key sets (finished orders'
    # customers vs high-balance customers) so the intersection estimate
    # exercises the Jaccard scaling, not the degenerate A==B case
    side_a = t.orders.filter(F.col("o_orderstatus") == "F")
    side_b = t.customer.filter(F.col("c_acctbal") > 1000)
    est = kmv_setops(side_a, side_b, "o_custkey", "c_custkey", _JK).select(
        "k",
        F.round("est_union", 4).alias("est_union"),
        F.round("est_inter", 4).alias("est_inter"),
    )
    na = side_a.agg(F.countDistinct("o_custkey").alias("n_a"))
    nb = side_b.agg(F.countDistinct("c_custkey").alias("n_b"))
    inter = (
        side_a.select(F.col("o_custkey"))
        .join(
            side_b.select(F.col("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .agg(F.countDistinct("o_custkey").alias("exact_inter"))
    )
    exact = (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(inter))
        .select(
            (F.col("n_a") + F.col("n_b") - F.col("exact_inter")).alias(
                "exact_union"
            ),
            "exact_inter",
        )
    )
    return est.crossJoin(F.broadcast(exact))


@query(
    "hll_distinct_users",
    oracle=f"""
    WITH hll AS ({duck_hll_estimate("events", "event_type",
                                    "CAST(user_id AS VARCHAR)")}),
    exact AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
               AS exact_users
      FROM events WHERE user_id IS NOT NULL GROUP BY 1
    )
    SELECT hll.event_type, hll.n_zero_regs, hll.reg_sum,
           hll.est AS est_users, exact.exact_users
    FROM hll JOIN exact USING (event_type)
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X139 — HyperLogLog distinct users per event type, the register
    sketch counterpart of kmv_distinct_users (X22): 64 max-rho
    registers per key, raw FFGM estimator, integer register sum —
    deterministic, so the oracle replays it bit-for-bit, and the exact
    COUNT(DISTINCT) rides along as the accuracy reference (the pairing
    every sketch rollout ships with).

    Scale: this is THE estimator for planet-scale distinct counts —
    per key the state is 64 longs, partials merge by MAX (map-side
    combine exact), and unlike KMV the register table never exceeds
    m rows per key on any executor. The exact branch is the only
    full-width shuffle and exists as the small-sf accuracy check."""
    from seng550_a3_etl_spark.operators.sketch import hll_distinct

    t = load_tables(spark, sf_dir)
    est = hll_distinct(
        t.events, ["event_type"], F.col("user_id").cast("string"),
        est_col="est_users",
    )
    exact = (
        t.events.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_zero_regs", "reg_sum", "est_users", "exact_users"
    )


# Count-min sketch geometry: 4 independent md5-seeded rows x 64
# buckets. Small enough to collide visibly at sf0.01 (150 users), so
# the calibration columns actually exercise the overestimate bound.
_CMS_DEPTH = 4
_CMS_WIDTH = 64


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH deps(dep) AS (
      SELECT * FROM range(0, {_CMS_DEPTH})
    ),
    cells AS (
      SELECT dep,
             {duck_hash64(
                 "CAST(dep AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)"
             )} % {_CMS_WIDTH} AS bucket,
             COUNT(*) AS c
      FROM events CROSS JOIN deps
      GROUP BY 1, 2
    ),
    truec AS (
      SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY 1
    ),
    est AS (
      SELECT u.user_id, MIN(c.c) AS est_n
      FROM truec u
      CROSS JOIN deps d
      JOIN cells c
        ON c.dep = d.dep
       AND c.bucket = {duck_hash64(
               "CAST(d.dep AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR)"
           )} % {_CMS_WIDTH}
      GROUP BY 1
    )
    SELECT t.user_id, t.true_n, CAST(e.est_n AS BIGINT) AS est_n,
           CAST(e.est_n - t.true_n AS BIGINT) AS overcount
    FROM truec t JOIN est e ON e.user_id = t.user_id
    ORDER BY t.true_n DESC, t.user_id
    LIMIT 10
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X150 — count-min sketch calibration: a 4x64 CMS over event
    user_ids, then for the top-10 users by TRUE count the sketch
    estimate beside the truth with the overcount — completing the
    sketch family (KMV X22, HLL X139, Bloom X102, GK A5-A9) with the
    frequency sketch, and — like minhash_estimate_quality — shipping
    the accuracy gate one runs before trusting the sketch alone. The
    CMS guarantee est >= true is asserted in tests; the md5-affine
    bucket hash is replayed bit-for-bit by the oracle.

    Determinism: counters and estimates are exact integers; the top-10
    cutoff orders by (true_n DESC, user_id) — no float anywhere.

    Scale: THE point of a CMS — the sketch is a fixed d x w = 256-cell
    rollup (map-side combined, broadcast back for the probe), never
    proportional to the keyspace. The true-count side is one user_id
    shuffle, present here only because this is the calibration query;
    production reads the 256-cell table alone. TakeOrdered handles the
    top-10 (no global sort)."""
    t = load_tables(spark, sf_dir)
    from seng550_a3_etl_spark.functions.hashing import hash64

    deps = F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))
    ev = t.events.select(
        "user_id", F.explode(deps).alias("dep")
    ).select(
        "dep",
        (
            hash64(
                F.concat_ws(
                    ":",
                    F.col("dep").cast("string"),
                    F.col("user_id").cast("string"),
                )
            )
            % _CMS_WIDTH
        ).alias("bucket"),
    )
    cells = ev.groupBy("dep", "bucket").agg(F.count(F.lit(1)).alias("c"))
    truec = t.events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("true_n")
    )
    probe = truec.select(
        "user_id", "true_n", F.explode(deps).alias("dep")
    ).withColumn(
        "bucket",
        hash64(
            F.concat_ws(
                ":",
                F.col("dep").cast("string"),
                F.col("user_id").cast("string"),
            )
        )
        % _CMS_WIDTH,
    )
    est = (
        probe.join(F.broadcast(cells), ["dep", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").cast("long").alias("est_n"))
    )
    return (
        est.select(
            "user_id", "true_n", "est_n",
            (F.col("est_n") - F.col("true_n")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("true_n"), "user_id")
        .limit(10)
    )
