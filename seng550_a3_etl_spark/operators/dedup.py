"""Keyed dedup + conditional upsert (SURVEY.md §2.5 W1/W2).

Re-expresses the reference's PostgreSQL idioms:

- ``SELECT DISTINCT ON (keys) ... ORDER BY keys, modified_dt DESC``
  (/root/reference/queries.py:133,150) → ``latest_wins``.
- ``INSERT ... ON CONFLICT (pk) DO UPDATE ... WHERE target.modified_dt <
  EXCLUDED.modified_dt`` (/root/reference/queries.py:151-160) →
  ``merge_upsert`` — union + window dedup with target precedence on ties,
  which is exactly the strictly-newer guard. A Delta ``MERGE INTO`` is the
  transactional variant; this parquet-only path is idempotent and
  rerun-safe the same way the reference's guard makes its upsert
  (/root/reference/etl.py:317-327) idempotent.

Scale: both operators are one hash shuffle on the natural key; no
collect, no skew beyond the key distribution itself (salt upstream if a
single natural key is hot — not possible here since keys are unique in
the target).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PREC = "__prec"
_RN = "__rn"


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per ``keys``, the first under ``order_by``.

    ``order_by`` should end with a unique tiebreaker for determinism
    (the reference's DISTINCT ON has the same requirement, implicitly).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    version_col: str,
) -> DataFrame:
    """Upsert ``source`` into ``target`` keyed by ``keys``; a source row
    replaces the target row only when strictly newer on ``version_col``.

    On a version tie the target wins — the ``<`` (not ``<=``) guard of the
    reference (/root/reference/queries.py:160). Source rows with no target
    match are inserted.
    """
    u = target.withColumn(_PREC, F.lit(0)).unionByName(
        source.withColumn(_PREC, F.lit(1))
    )
    deduped = latest_wins(
        u, keys, [F.desc(version_col), F.asc(_PREC)]
    )
    return deduped.drop(_PREC)


def merge_upsert_partitioned(
    spark,
    target_path: str,
    source: DataFrame,
    keys: Sequence[str],
    version_col: str,
    partition_col: str,
) -> None:
    """Incremental MERGE into a partitioned parquet fact table: only the
    partitions containing source rows are read, merged, and rewritten —
    untouched partition files are left byte-identical on disk.

    This is the parquet-native approximation of a transactional
    ``MERGE INTO`` (Delta/Iceberg — not installable in this sandbox, see
    README): dynamic partition overwrite plays the role of MERGE's
    file-level skipping, so a refresh touching one day of a year-
    partitioned table rewrites 1/365th of it instead of the whole table
    (the reference's row-level ``ON CONFLICT`` upsert is incremental the
    same way, /root/reference/queries.py:151-160). Without a transaction
    log the swap is per-partition-directory atomic rather than global —
    acceptable for idempotent strictly-newer merges, which converge on
    rerun after any partial failure.

    Requires ``partition_col`` to be functionally determined by the
    merge key (an event's date never changes) — the invariant that makes
    "partitions containing source keys" = "partitions needing rewrite".

    Scale: the target read prunes to the touched partitions at the scan
    (PartitionFilters), the merge shuffles only those rows + the source,
    and the collect() gathers one value per touched partition, not rows.
    """
    # Materialize the source once: it is executed both for the partition
    # collect and inside the merge write — for an expensive incremental
    # feed the dominant cost would otherwise double (Spark replans each
    # DataFrame reference).
    source = source.localCheckpoint(eager=True)
    parts = [
        r[0] for r in source.select(partition_col).distinct().collect()
    ]
    if None in parts:
        # A NULL partition value cannot be matched by the pruning filter
        # (NULL never equals anything), but dynamic overwrite would still
        # replace the default-partition directory — silently dropping its
        # existing rows. Refuse instead of corrupting.
        raise ValueError(
            f"source has NULL values in partition column "
            f"'{partition_col}' — fill or filter them before merging"
        )
    if not parts:
        return
    # Explicit schema: partition-directory type INFERENCE would re-type
    # e.g. a string partition value '01' as int 1, landing the merged
    # rows in a differently-named directory (d=1) while the stale d=01
    # directory survives — duplicate keys after merge. The source schema
    # is the contract for both data and partition column types.
    target = spark.read.schema(source.schema).parquet(target_path).filter(
        F.col(partition_col).isin(parts)
    )
    merged = merge_upsert(target, source, keys, version_col)
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(target_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a table: every key is
    classified added / removed / changed / unchanged — the regression
    check a pipeline runs between yesterday's and today's output (or
    between an old and a rewritten pipeline) before promoting it.

    One full-outer shuffle join on the keys; change detection compares
    the columns directly (null-safe), so no hashing pass over either
    side. Output: keys, status, plus old_/new_ prefixed compare columns.

    Scale: both sides shuffle once on the key — the same cost as any
    key-partitioned write of the snapshots; with bucketed snapshots the
    exchange disappears entirely (see tests/test_physical.py's bucketed
    join checks).
    """
    keys = list(keys)
    # Explicit presence markers: deriving presence from compare-column
    # nullness would misclassify rows whose compare columns are all NULL
    # (present-but-NULL old vs new would read as "added"/"removed").
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"), *[
        c for pair in (
            (f"old_{c}", f"new_{c}") for c in compare_cols
        ) for c in pair
    ])
