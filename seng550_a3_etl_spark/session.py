"""SparkSession factory with scale-oriented defaults.

The reference hand-tunes PostgreSQL physical design (GIST/B-tree indexes,
materialized view, fact table — /root/reference/etl.py:224-327). Here the
equivalent knobs are session-level: AQE (runtime re-planning, skew-join
splitting, partition coalescing), broadcast threshold, shuffle partition
count, and Arrow for any pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# On a real cluster these come from spark-submit; local defaults mirror the
# driver harness (local[$SPARK_GRAFT_CPUS], 32 threads).
_DEFAULTS = {
    # Runtime re-planning: coalesce post-shuffle partitions, split skewed
    # join partitions, demote/promote join strategies from runtime stats.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/weather/districts) stay far under
    # this; at 100 TB the fact side never broadcasts, the dims always do.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics vs the DuckDB oracle (naive UTC).
    "spark.sql.session.timeZone": "UTC",
    # Parquet timestamps without a timezone flag (the testdata fixtures)
    # load as plain TIMESTAMP, not TIMESTAMP_NTZ: watermarks/unix_micros
    # require TIMESTAMP, and with the UTC session zone the wall-clock
    # values are identical to what the naive-UTC DuckDB oracle reads.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
    # In local mode the driver JVM IS every executor, and Spark's default
    # heap is 1g regardless of machine size — the sf1 spot-run OOM'd the
    # whole session inside a 1 GiB heap on a 128 GiB box. But BIGGER IS
    # NOT BETTER: a 64g heap let garbage accumulate into multi-second
    # full-GC pauses that landed on whichever query was running (measured
    # +37% suite total, with innocent-bystander queries "regressing" up
    # to 10x: bench_full 64g=152.3s vs 16g=111.2s, same code). 16g
    # clears the 10x spot-run while keeping GC pauses short. On a real
    # cluster per-executor heaps come from spark-submit and sit in this
    # same 8-32g sweet spot for the same reason. Only honored when the
    # config is present BEFORE the JVM launches (getOrCreate on a live
    # session ignores it).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    # Whole-stage-codegen class cache. The default is 100 entries for
    # the whole JVM; a 254-query suite of HOF-heavy plans churns it,
    # and the evicted classes recompile (janino, tens to hundreds of
    # ms each) inside whichever LATER query re-needs them — measured
    # as a diffuse +0.3-1.5 s smear across untouched queries whenever
    # a round adds new ones (r11 +5.9%, r12 +7.8% before this). Each
    # cached class costs ~tens of KB of metaspace — 2000 entries is
    # noise inside a 16g JVM, and on a real cluster executors compile
    # per-JVM too, so the same conf ships with spark-submit.
    "spark.sql.codegen.cache.maxEntries": os.environ.get(
        "SPARK_GRAFT_CODEGEN_CACHE", "2000"
    ),
}

# A malformed SPARK_GRAFT_CODEGEN_CACHE would otherwise surface only as
# an opaque Spark conf failure at session build (ADVICE r12). The value
# is NORMALIZED through int() — Python accepts forms Java's
# Integer.parseInt rejects ('2_000', ' 2000', unicode digits), so the
# parsed integer is written back as a canonical decimal string rather
# than handing Spark the raw literal; non-integers and negatives fall
# back to the 2000 default with a warning.
try:
    _codegen_entries = int(_DEFAULTS["spark.sql.codegen.cache.maxEntries"])
    # The conf lands in a Java int — values past Integer.MAX_VALUE
    # clear Python's int() but still fail opaquely at session build,
    # the exact failure mode this guard exists to prevent (ADVICE r13).
    if not 0 <= _codegen_entries <= 2**31 - 1:
        raise ValueError("outside Java int range")
except ValueError:
    import warnings

    warnings.warn(
        "SPARK_GRAFT_CODEGEN_CACHE="
        f"{_DEFAULTS['spark.sql.codegen.cache.maxEntries']!r} is not an "
        "integer in 0..2**31-1; falling back to 2000",
        stacklevel=2,
    )
    _codegen_entries = 2000
_DEFAULTS["spark.sql.codegen.cache.maxEntries"] = str(_codegen_entries)


def get_spark(
    app_name: str = "seng550-a3-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to 2x local cores; on a cluster pass
    ~2-3x total executor cores (or rely on AQE coalescing from a higher
    initial value).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or 2 * cpus)
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
