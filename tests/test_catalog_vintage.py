"""Fixture-vintage regression tests: /root/testdata's events.ts parquet
encoding has CHANGED between driver rounds (TIMESTAMP(NANOS) in rounds
1-2, timezone-less TIMESTAMP(MICROS) since round 3). catalog.load_tables
must normalize EVERY vintage to plain TIMESTAMP — these tests synthesize
both encodings so the next regeneration can't silently break the suite
(watermarks and unix_micros reject NTZ; the vectorized reader rejects
NANOS outright without the conf)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables

_MICROS = 1_700_000_000_123_456  # 2023-11-14 22:13:20.123456 UTC


def _write_events(path, arrow_type, values):
    table = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(values, arrow_type),
            "user_id": pa.array([7], pa.int64()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "arrow_type,raw",
    [
        (pa.timestamp("ns"), _MICROS * 1000),  # rounds 1-2 vintage
        (pa.timestamp("us"), _MICROS),  # round-3+ vintage (NTZ)
    ],
    ids=["nanos", "ntz_micros"],
)
def test_events_ts_normalizes_to_plain_timestamp(
    spark, tmp_path, arrow_type, raw
):
    _write_events(str(tmp_path / "events.parquet"), arrow_type, [raw])
    events = load_tables(spark, str(tmp_path)).events
    assert dict(events.dtypes)["ts"] == "timestamp"  # never ntz / bigint
    got = events.select(F.unix_micros("ts").alias("us")).collect()[0].us
    assert got == _MICROS
