"""Exact integer-arithmetic statistics operators shared by the suite:
largest-remainder allocation and weighted median.

Both are built from window functions over an explicit total order so
two engines (and two runs) can never disagree: every comparison is
int64, every tiebreak is a named column. Reference parity: the
reference has no allocation/weighted-percentile surface; these belong
to the warehouse-extension tier (SURVEY §2.10 X149/X151).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder(
    df: DataFrame,
    key_cols: Sequence[str],
    weight_col: str,
    total_col: str,
    order_cols: Sequence[str],
    out_col: str = "alloc",
) -> DataFrame:
    """Hamilton / largest-remainder allocation: per group, split the
    group's integer ``total_col`` across its rows proportional to the
    integer ``weight_col`` so the shares sum EXACTLY to the total.

    Floor shares ``total*w DIV sum(w)`` first; the leftover units go
    one each to the rows with the largest integer remainders
    ``(total*w) % sum(w)``, ties broken by ``order_cols``. All int64:
    total*w must stay inside 2^63 (for money-in-cents magnitudes this
    is per-group bounded, hence scale-free).

    Scale: one exchange on ``key_cols`` drives the weight-sum window,
    the base-sum window, and the remainder rank — per-group running
    state only, no driver participation.
    """
    wp = Window.partitionBy(*key_cols)
    w, t = F.col(weight_col), F.col(total_col)
    df = (
        df.withColumn("__num", t * w)
        .withColumn("__tw", F.sum(weight_col).over(wp))
        # DIV, not / : int64 floor division end to end (double would
        # lose exactness past 2^53).
        .withColumn("__base", F.expr("__num DIV __tw"))
        .withColumn("__fracrem", F.col("__num") % F.col("__tw"))
        .drop("__num", "__tw")
    )
    rk = F.row_number().over(
        wp.orderBy(F.desc("__fracrem"), *order_cols)
    )
    rem = t - F.sum("__base").over(wp)
    return (
        df.withColumn("__rk", rk)
        .withColumn("__rem", rem)
        .withColumn(
            out_col,
            F.col("__base")
            + F.when(F.col("__rk") <= F.col("__rem"), 1).otherwise(0),
        )
        .drop("__base", "__fracrem", "__rk", "__rem")
    )


def weighted_median(
    df: DataFrame,
    part_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """Per-group weighted median: the smallest ``value_col`` whose
    cumulative ``weight_col`` (over the total order value, then
    ``order_cols``) reaches half the group's total weight — the
    lower weighted median, exact for integer values and weights.

    Returns one row per group: ``part_cols`` + ``wmedian`` +
    ``total_weight`` + ``n_rows``.

    Scale: one exchange on ``part_cols``; the cumulative sum uses an
    explicit ROWS frame over a caller-guaranteed-unique order (so ROWS
    vs RANGE cannot diverge), O(1) running state per group.
    """
    wo = (
        Window.partitionBy(*part_cols)
        .orderBy(value_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy(*part_cols)
    c = df.select(
        *part_cols,
        F.col(value_col).alias("__v"),
        F.sum(weight_col).over(wo).alias("__cum"),
        F.sum(weight_col).over(wp).alias("__tot"),
    )
    return c.groupBy(*part_cols).agg(
        F.min(
            F.when(2 * F.col("__cum") >= F.col("__tot"), F.col("__v"))
        ).alias("wmedian"),
        F.max("__tot").cast("long").alias("total_weight"),
        F.count(F.lit(1)).alias("n_rows"),
    )
