"""JDBC source/sink (SURVEY.md §2.1 S4/S5).

The reference round-trips everything through PostgreSQL —
``DataFrame.to_sql`` full-replace writes with a count verification
readback (/root/reference/etl.py:162-221) and ``pd.read_sql`` reads
(/root/reference/viz.py:50,78,97,116). Spark-native equivalents; the
engine's primary storage is Parquet (catalog.py), JDBC is the edge
connector.

Integration-tested against embedded Apache Derby (the JDBC database
already on Spark's default classpath for the Hive metastore) in
tests/test_sources.py — full write → count-verify → partitioned-read
round trip. No server database exists in this container; Derby-embedded
exercises the same Spark JDBC source/sink code paths (dialect, driver
option, partitioned range reads) that a PostgreSQL URL would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S5. Pass ``partition_column`` + bounds for parallel range reads —
    the difference between one connection streaming 100 TB and
    ``num_partitions`` concurrent range scans."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_verified(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    **options: str,
) -> int:
    """S4: full-replace write + row-count verification readback
    (/root/reference/etl.py:177,214-218). Returns the verified count."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
    back = read_jdbc(df.sparkSession, url, table, **options)
    return back.count()
