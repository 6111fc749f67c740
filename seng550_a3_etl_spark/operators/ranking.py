"""Distributed global ranking and sorted-neighborhood pair generation.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the classic
Spark scale trap: Catalyst plans a single-partition window, funneling
the whole table through one task. The scale-correct plan (the RDD
``zipWithIndex`` idea, lifted to DataFrames) is:

1. range-repartition on the sort key — one exchange, Spark's own
   ``orderBy`` machinery (sampled range boundaries, ascending partition
   ids hold ascending key ranges);
2. rank WITHIN each partition — a window PARTITIONed BY
   ``spark_partition_id()``, so every partition ranks in parallel;
3. shift each partition's ranks by the total count of all partitions
   before it. The per-partition counts are one tiny aggregate —
   ``numPartitions`` rows, the ONLY driver-side materialization, the
   same bounded collect as the range boundaries themselves — and the
   offsets broadcast-join back.

The caller must supply a TOTAL order (append a unique tiebreaker);
otherwise ranks of tied rows depend on physical placement.

``sorted_neighborhood_pairs`` builds the Sorted Neighborhood Method of
entity resolution on top: after sorting on a blocking key, every record
pairs with its ``window`` nearest neighbors in rank order — the
standard alternative to hard blocking when near-duplicates straddle
block boundaries (Hernandez & Stolfo, SIGMOD'95). The neighbor match
is rank arithmetic: each left row spans the rank interval
``[rank+1, rank+window]`` and the existing interval-join operator
(operators/joins.range_join) turns that into a bucketed equi-join —
no self cross-join, candidates exactly ``window`` per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_cols: list[str], out: str = "rank"
) -> DataFrame:
    """Append a 1-based dense global row number under ``order_cols``.

    ``order_cols`` must define a total order (make the last column a
    unique key). The plan is one range exchange + parallel
    per-partition windows; the only driver materialization is one row
    per shuffle partition (the offset table).
    """
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint pins ONE materialization of the range exchange:
    # the offset-count job and the caller's job must see identical
    # partition assignments, and RangePartitioner re-SAMPLES its
    # boundaries per execution (upstream round-robin repartitions are
    # nondeterministic too) — without the pin, ranks silently collide
    # across the two runs. This is the same lineage-truncation pattern
    # as the iterative operators (operators/graph.py).
    part = (
        df.repartitionByRange(n, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Bounded collect: numPartitions rows of (pid, count) — the same
    # scale class as the range boundaries Spark itself samples.
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c")).collect()
    offset = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], offset))
        offset += r["__c"]
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        part.join(F.broadcast(off_df), "__pid")
        .withColumn(out, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    window: int,
    carry: list[str] | None = None,
) -> DataFrame:
    """All (a, b) pairs whose ranks under ``order_cols`` differ by at
    most ``window`` (a before b). Output: ``<id_col>_a``, ``<id_col>_b``,
    ``gap`` (rank_b - rank_a, in 1..window), plus ``carry`` columns
    suffixed _a/_b for downstream metric verification.
    """
    from seng550_a3_etl_spark.operators.joins import range_join

    carry = carry or []
    ranked = global_row_number(df, order_cols, out="__rank").select(
        id_col, "__rank", *carry
    )
    left = ranked.select(
        F.col(id_col).alias(f"{id_col}_a"),
        F.col("__rank").alias("__ra"),
        (F.col("__rank") + 1).alias("__lo"),
        (F.col("__rank") + F.lit(window)).alias("__hi"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
    )
    right = ranked.select(
        F.col(id_col).alias(f"{id_col}_b"),
        F.col("__rank").alias("__rb"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    return range_join(
        right, left, "__rb", "__lo", "__hi", bucket_size=max(window, 1)
    ).select(
        f"{id_col}_a",
        f"{id_col}_b",
        (F.col("__rb") - F.col("__ra")).cast("int").alias("gap"),
        *[f"{c}_a" for c in carry],
        *[f"{c}_b" for c in carry],
    )
