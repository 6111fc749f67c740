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
from seng550_a3_etl_spark.operators.sketch import duck_kmv_estimate, kmv_distinct
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
