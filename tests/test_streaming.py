"""Structured Streaming tests (SURVEY.md §2.8): windowed counts match
the batch operator; the streaming fact upsert applies the strictly-newer
guard per micro-batch and is replay-safe via its checkpoint."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from seng550_a3_etl_spark.streaming.jobs import (
    streaming_fact_upsert,
    windowed_event_counts,
)

_SCHEMA = "k int, ts timestamp, v string"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:10:00"), "a", 1.0),
            (2, _ts("2024-01-01T00:50:00"), "a", 2.0),
            (3, _ts("2024-01-01T01:10:00"), "b", 3.0),
        ],
        "event_id int, ts timestamp, event_type string, value double",
    )
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    batch_out = sorted(
        (str(r.w.start), r.event_type, r.n_events, r.total_value)
        for r in windowed_event_counts(events).collect()
    )

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .start()
    )
    q.awaitTermination(120)
    stream_out = sorted(
        (str(r.w.start), r.event_type, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    )
    assert stream_out == batch_out


def test_streaming_fact_upsert_guard_and_replay(spark, tmp_path):
    target = str(tmp_path / "gold")
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "t1"),
            (2, _ts("2024-01-01T10:00:00"), "t2"),
        ],
        _SCHEMA,
    ).write.parquet(target)

    # batch 1: fresher k=1 (replaces), staler k=2 (guard keeps target), new k=3
    spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), "s1"),
            (2, _ts("2024-01-01T09:00:00"), "s2"),
            (3, _ts("2024-01-01T08:00:00"), "s3"),
        ],
        _SCHEMA,
    ).write.parquet(src)

    q = streaming_fact_upsert(
        spark, src, _SCHEMA, target, keys=["k"], version_col="ts",
        checkpoint_path=ckpt,
    )
    q.awaitTermination(120)
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "s1", 2: "t2", 3: "s3"}

    # new files arrive; restart from the same checkpoint → only the new
    # file is processed, older state preserved
    spark.createDataFrame(
        [(3, _ts("2024-01-01T12:00:00"), "s3b")], _SCHEMA
    ).write.mode("append").parquet(src)
    q2 = streaming_fact_upsert(
        spark, src, _SCHEMA, target, keys=["k"], version_col="ts",
        checkpoint_path=ckpt,
    )
    q2.awaitTermination(120)
    got2 = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got2 == {1: "s1", 2: "t2", 3: "s3b"}


def test_sessionize_stream_closes_on_gap_and_matches_batch(spark, tmp_path):
    from seng550_a3_etl_spark.operators.sessionize import session_stats
    from seng550_a3_etl_spark.streaming.jobs import sessionize_stream

    schema = "event_id int, ts timestamp, user_id long, value double"
    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    batch1 = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 1, 1.0),
            (2, _ts("2024-01-01T00:10:00"), 1, 2.0),
            (3, _ts("2024-01-01T00:05:00"), 2, 5.0),
        ],
        schema,
    )
    batch1.write.parquet(src)

    out = str(tmp_path / "sess_out")
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )

    def run():
        stream = spark.readStream.schema(batch1.schema).parquet(src)
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    def read_out():
        return spark.read.schema(out_schema).parquet(out)

    run()
    # every session still open -> nothing emitted
    assert read_out().count() == 0

    # user 1 returns after a >30min gap: the first session must close
    spark.createDataFrame(
        [(4, _ts("2024-01-01T01:00:00"), 1, 7.0)], schema
    ).write.mode("append").parquet(src)
    run()
    got = [
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.total_value)
        for r in read_out().collect()
    ]
    assert got == [(1, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2, 3.0)]

    # the closed session agrees with the batch operator on the same data
    all_events = spark.read.parquet(src)
    batch = {
        (r.user_id, r.session_seq): (
            str(r.session_start), str(r.session_end), r.n_events, r.total_value
        )
        for r in session_stats(
            all_events, "user_id", "ts", "value",
            gap="30 minutes", tiebreak=["event_id"],
        ).collect()
    }
    assert batch[(1, 1)] == got[0][1:]


import pytest


@pytest.mark.parametrize("gap_minutes", [10, 30])
def test_sessionize_batch_stream_parity_at_gap_boundary(
    spark, tmp_path, gap_minutes
):
    """Batch and streaming sessionization must agree at the EXACT gap
    boundary: an event arriving precisely ``gap`` after the previous one
    stays in the session (both implement strict `>`); one second past
    the gap starts a new session. Parametrized over two gaps so the
    boundary logic is pinned as a function of the gap, not one value."""
    from seng550_a3_etl_spark.operators.sessionize import session_stats
    from seng550_a3_etl_spark.streaming.jobs import sessionize_stream

    schema = "event_id int, ts timestamp, user_id long, value double"
    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    out = str(tmp_path / "sess_out")
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    base = _ts("2024-01-01T00:00:00")
    gap = dt.timedelta(minutes=gap_minutes)
    # user 1: event at t0, then at EXACTLY t0+gap (same session — the
    # boundary row), then at t0+2*gap+1s (> gap after the boundary row →
    # closes session 1 and starts session 2)
    spark.createDataFrame(
        [
            (1, base, 1, 1.0),
            (2, base + gap, 1, 2.0),
        ],
        schema,
    ).write.parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            sessionize_stream(stream, gap_minutes=gap_minutes)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    run()
    closer = base + gap + gap + dt.timedelta(seconds=1)
    spark.createDataFrame(
        [(3, closer, 1, 4.0)], schema
    ).write.mode("append").parquet(src)
    run()
    got = [
        (
            r.user_id,
            str(r.session_start),
            str(r.session_end),
            r.n_events,
            r.total_value,
        )
        for r in spark.read.schema(out_schema).parquet(out).collect()
    ]
    # exactly one closed session containing BOTH events (boundary row
    # stayed in), ending at the boundary row's timestamp
    assert got == [
        (1, str(base), str(base + gap), 2, 3.0)
    ], f"gap={gap_minutes}: {got}"

    batch = {
        (r.user_id, r.session_seq): (
            str(r.session_start),
            str(r.session_end),
            r.n_events,
            r.total_value,
        )
        for r in session_stats(
            spark.read.parquet(src),
            "user_id",
            "ts",
            "value",
            gap=f"{gap_minutes} minutes",
            tiebreak=["event_id"],
        ).collect()
    }
    # the batch operator groups the same two events into session 1 and
    # the closer into session 2
    assert batch[(1, 1)] == got[0][1:]
    assert batch[(1, 2)] == (str(closer), str(closer), 1, 4.0)


def test_stream_dedup_across_microbatches(spark, tmp_path):
    """stream_dedup keeps exactly one row per key even when the
    duplicate arrives in a LATER micro-batch — i.e. the dedup state
    actually persists across batches rather than deduping per-batch."""
    from seng550_a3_etl_spark.streaming.jobs import stream_dedup

    schema = "event_id int, ts timestamp, v string"
    b1 = spark.createDataFrame(
        [(i, _ts("2024-01-01T00:10:00"), "first") for i in range(1, 8)],
        schema,
    )
    b2 = spark.createDataFrame(
        # 5-7 duplicate batch 1 keys (same event time), 8-12 are new
        [(i, _ts("2024-01-01T00:10:00"), "dup") for i in range(5, 8)]
        + [(i, _ts("2024-01-01T00:30:00"), "new") for i in range(8, 13)],
        schema,
    )
    src = str(tmp_path / "dedup_src")
    b1.write.parquet(src)
    b2.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(src)
    )
    q = (
        stream_dedup(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_d"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id, v FROM dedup_sink").collect()
    assert sorted(r.event_id for r in got) == list(range(1, 13))
    # batch-1 rows won the race for keys 5-7 in every case where both
    # copies were seen (ordering across files is by path: b1 first)
    by_key = {r.event_id: r.v for r in got}
    assert all(by_key[k] == "first" for k in range(1, 8))


def test_event_stream_reads_directory_shaped_table(spark, tmp_path):
    # The bench's 10x replica writes events.parquet as a DIRECTORY of
    # part files; the old pathGlobFilter source silently matched nothing
    # there and streamed zero rows. The glob source must read both
    # layouts.
    from tests.conftest import SF_ORACLE

    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.suite.streaming_suite import _event_stream

    n = load_tables(spark, SF_ORACLE).events.count()
    out = str(tmp_path / "scaled")
    import os

    os.makedirs(out)
    spark.read.parquet(f"{SF_ORACLE}/events.parquet").write.parquet(
        f"{out}/events.parquet"
    )
    q = (
        _event_stream(spark, out)
        .writeStream.format("memory")
        .queryName("dir_shape_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("dir_shape_probe").count() == n
