"""Table maintenance: small-file compaction (the OPTIMIZE story).

At 100 TB the dominant silent killer is file-count explosion: streaming
micro-batches, per-executor writes, and fine partitioning all produce
KB-scale parquet files, and a scan's task count (and NameNode/listing
load) is driven by file count, not byte count. Compaction rewrites a
directory to ~target-sized files; the reference has no analog (PostgreSQL
heap storage makes the problem invisible — it's VACUUM-shaped here).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of the parquet data files directly under ``path``."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.globStatus(jvm.org.apache.hadoop.fs.Path(path, "*.parquet")):
        if st.isFile():
            out.append((st.getPath().toString(), st.getLen()))
    return out


def compact(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_mb: float = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet directory ``src`` into ``dest`` with
    ~``target_file_mb``-sized files. With ``sort_by``, the rewrite is a
    range-partitioned sort so per-file min/max column stats become tight
    and later scans can skip whole files (poor man's clustering; use
    plans/layout.write_zordered for two-dimensional clustering).

    Output file count is computed from the INPUT byte size, so the
    operation is deterministic given the source layout. Writes to a new
    directory (never in place): at scale, compaction must be atomic via
    a directory swap / metastore pointer flip, not a self-overwrite that
    destroys the table on job failure.

    Returns stats: files/bytes in, target and actual file counts.
    """
    files = _parquet_files(spark, src)
    if not files:
        raise ValueError(f"no parquet files under {src}")
    total = sum(b for _, b in files)
    n_out = max(1, math.ceil(total / int(target_file_mb * (1 << 20))))
    df: DataFrame = spark.read.parquet(src)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        df = df.repartition(n_out)
    df.write.mode("error").parquet(dest)
    return {
        "n_files_in": len(files),
        "bytes_in": total,
        "n_files_target": n_out,
        "n_files_out": len(_parquet_files(spark, dest)),
    }
