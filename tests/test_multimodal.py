"""Multimodal plumbing tests: decode metadata over Arrow batches
(including null/empty blobs) and chunk sampling shape."""

from __future__ import annotations

from seng550_a3_etl_spark.operators.multimodal import (
    decode_media_batch,
    sample_chunks,
)


def test_decode_media_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(1, b"hello world"), (2, b""), (3, None)],
        "doc_id long, media binary",
    )
    got = {r.doc_id: r for r in decode_media_batch(df).collect()}
    assert got[1].n_bytes == 11
    assert got[1].width == 11 % 640 + 1
    assert got[1].height == ord("h") % 480 + 1
    assert got[1].fmt == "fake"
    assert got[2].n_bytes == 0 and got[2].height == 1
    assert got[3].n_bytes == 0  # null blob treated as empty


def test_sample_chunks(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(10)))], "doc_id long, media binary"
    )
    out = sorted(
        (r.chunk_index, bytes(r.chunk))
        for r in sample_chunks(df, chunk_size=3, every_k=2).collect()
    )
    # chunks: [0:3],[3:6],[6:9],[9:10] → keep indices 0 and 2
    assert out == [(0, bytes([0, 1, 2])), (2, bytes([6, 7, 8]))]
