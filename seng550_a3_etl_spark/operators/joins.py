"""As-of (nearest-temporal) join — the reference's unfinished lateral join
(SURVEY.md §2.3 J6; /root/reference/queries.py:164-191 is a commented-out
``JOIN LATERAL ... ORDER BY recorded_at DESC LIMIT 1``).

Spark-first design: instead of a range join + per-left-row top-1 (which
explodes candidate pairs before pruning), we use the union-marker pattern:

1. Tag left and right rows, union them into one stream.
2. One window per partition key, ordered by (ts, is_left) — right rows
   sort *before* left rows at equal timestamps, giving inclusive (<=)
   as-of semantics.
3. ``last(payload_struct, ignorenulls=True)`` carries the most recent
   right payload forward onto each left row.

Cost: ONE shuffle on the partition key + a per-partition sort — the same
as a sort-merge join, with zero row multiplication regardless of how many
right rows precede a left row. This is the plan that survives 100 TB;
a lateral/range formulation does not.

The right payload is bundled into a single struct before the window so
all its fields travel atomically (per-column ``last(ignorenulls)`` could
mix fields from different right rows when payload columns contain nulls).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TS = "__asof_ts"
_IS_LEFT = "__is_left"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each left row, attach the payload of the
    right row with the greatest ``right_ts`` <= ``left_ts`` (backward) or
    smallest ``right_ts`` >= ``left_ts`` (forward), matching on ``by``.

    Unmatched left rows keep null right payload (LEFT semantics). Right
    payload columns must not collide with left column names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    by = list(by)
    left_payload = [c for c in left.columns if c not in by]
    right_payload = [c for c in right.columns if c not in by and c != right_ts]
    collisions = set(left.columns) & set(right_payload)
    if collisions:
        raise ValueError(f"colliding payload columns: {sorted(collisions)}")

    l_tagged = left.select(
        *by,
        *left_payload,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_IS_LEFT),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in [right_ts, *right_payload]
            )
            + ">"
        )
        .alias(_PAYLOAD),
    )
    r_tagged = right.select(
        *by,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_IS_LEFT),
        F.struct(F.col(right_ts), *[F.col(c) for c in right_payload]).alias(
            _PAYLOAD
        ),
    )

    ts_order = F.asc(_TS) if direction == "backward" else F.desc(_TS)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.asc(_IS_LEFT))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    return filled.filter(F.col(_IS_LEFT) == 1).select(
        *by,
        *left_payload,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in [right_ts, *right_payload]],
    )


_BUCKET = "__range_bucket"


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_size: int,
) -> DataFrame:
    """Interval join: every (point, range) pair with
    ``start_col <= point_col <= end_col`` (inclusive both ends).

    ``point_col``/``start_col``/``end_col`` must be integer-valued (cast
    timestamps to epoch seconds/days upstream). Spark has no interval
    index; the scale-correct plan is the same bucketing idea as the
    spatial grid join (operators/spatial.py): each range explodes to the
    ``bucket_size``-wide buckets it spans, each point computes its single
    bucket, an ordinary shuffle equi-join on the bucket id pairs each
    point only with ranges overlapping its bucket, and the exact
    between-filter prunes false candidates. A point has exactly one
    bucket, so no post-join dedup is needed — unlike the naive
    theta-join, which Spark executes as a cross product and which does
    not survive either side being large.

    Pick ``bucket_size`` near the typical range length: ranges explode
    to ``len/bucket_size + 1`` rows, points never replicate. Rows with
    ``end < start`` define empty intervals and are dropped. Rows with a
    NULL point or NULL bound never match (inner-join semantics — their
    bucket expression is NULL, which explode/join drop). Both input
    column sets must be disjoint.
    """
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be > 0, got {bucket_size}")
    overlap = set(points.columns) & set(ranges.columns)
    if overlap:
        raise ValueError(f"colliding columns: {sorted(overlap)}")
    p = points.withColumn(
        _BUCKET, F.floor(F.col(point_col) / bucket_size)
    )
    r = ranges.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_size),
                F.floor(F.col(end_col) / bucket_size),
            )
        ),
    )
    return (
        p.join(r, _BUCKET)
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop(_BUCKET)
    )
