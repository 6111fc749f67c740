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
