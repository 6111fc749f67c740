"""File-format connectors beyond Parquet (SURVEY §2.1 closing note).

The reference's only persistent format is PostgreSQL tables; our engine
standardizes on Parquet but exposes the other Spark-native formats for
ingest/export interchange. Each reader applies an explicit schema when
given — schema inference reads the data twice (CSV/JSON) and is a
100 TB anti-pattern — and each writer partitions by the given keys so
downstream scans prune.

ORC round-trips types like Parquet; CSV is lossy (no nested types,
strings for everything without a schema); JSON lines keeps nesting but
~5× the scan cost. All three run through the same DataFrameReader/
Writer machinery, so predicate pushdown/column pruning behave per
format capability (Parquet/ORC: full; CSV/JSON: column pruning only).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Format-dispatched read. CSV defaults: header on. JSON is
    JSON-lines (one object per line — the only splittable JSON shape)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        # without a schema, at least type the columns in one extra pass
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    **options: str,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    sort_by: Sequence[str] = (),
    fmt: str = "parquet",
) -> None:
    """Export a curated corpus as ``n_shards`` deterministic shards —
    the final step of a training-data pipeline, where downstream loaders
    expect a fixed shard count with stable membership (resumable reads,
    per-shard checksums, reproducible data order).

    Shard membership is ``hash64(key) mod n_shards`` — a function of the
    row alone, so it is stable across reruns, cluster sizes, and input
    partitioning (unlike ``repartition(n)`` round-robin, whose
    assignment depends on the input split). One ``repartition`` on the
    shard id co-locates each shard, ``sortWithinPartitions`` fixes the
    in-shard order, and ``partitionBy`` writes one directory per shard.
    """
    from pyspark.sql import functions as F

    from seng550_a3_etl_spark.functions.hashing import hash64

    sharded = df.withColumn(
        "shard", hash64(F.col(key_col).cast("string")) % n_shards
    )
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", *sort_by)
        .write.format(fmt)
        .mode("overwrite")
        .partitionBy("shard")
        .save(path)
    )
