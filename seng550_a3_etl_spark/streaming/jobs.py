"""Streaming jobs (SURVEY.md §2.8).

- ``windowed_event_counts`` — tumbling-window counts with a watermark:
  the streaming face of the reference's per-day aggregate
  (/root/reference/queries.py:81-91). Late rows beyond the watermark are
  dropped; state is bounded by (watermark horizon / window) per key.
- ``stream_dedup`` — watermark + dropDuplicates on the natural key: W1
  as a stream.
- ``streaming_fact_upsert`` — the incremental fact refresh
  (/root/reference/etl.py:317-327) as foreachBatch: each micro-batch
  merges into the parquet gold table under the strictly-newer guard.
  foreachBatch is the right tool because the sink (parquet rewrite /
  Delta MERGE) is a batch operation; exactly-once comes from the guard's
  idempotence (re-processing a batch cannot regress a newer row).

Scale: state store usage is bounded by the watermark; the merge itself
is the batch merge_upsert — one shuffle per batch on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from seng550_a3_etl_spark.operators.dedup import merge_upsert


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts (works on batch frames too —
    same operator, no watermark pruning)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), window).alias("w"), *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def stream_dedup(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-seen dedup per key within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(list(keys))


def streaming_fact_upsert(
    spark: SparkSession,
    source_path: str,
    source_schema: str,
    target_path: str,
    keys: Sequence[str],
    version_col: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream new fact files from ``source_path`` and merge each
    micro-batch into the parquet gold table at ``target_path``.

    ``available_now=True`` processes everything currently available then
    stops — the scheduled-incremental-refresh pattern; False runs
    continuously. The target must exist (bootstrap with plans.gold.
    save_gold); merge semantics are the strictly-newer guard, so replays
    and overlapping batches are harmless.
    """
    stream = (
        spark.readStream.schema(source_schema).parquet(source_path)
    )

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        current = spark.read.parquet(target_path)
        merged = merge_upsert(current, batch, keys, version_col)
        staging = target_path.rstrip("/") + "__staging"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(target_path)

    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
