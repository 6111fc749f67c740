"""Multimodal plumbing tests: decode metadata over Arrow batches
(including null/empty blobs) and chunk sampling shape."""

from __future__ import annotations

from seng550_a3_etl_spark.operators.multimodal import (
    decode_media_batch,
    extract_features,
    resize_meta,
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


def test_extract_features_histogram(spark):
    df = spark.createDataFrame(
        [(1, bytes([0, 16, 32, 5])), (2, b""), (3, None)],
        "doc_id long, media binary",
    )
    got = {r.doc_id: list(r.feature) for r in extract_features(df).collect()}
    want_1 = [0] * 16
    want_1[0] = 3  # 0, 16, 32 ≡ 0 (mod 16)
    want_1[5] = 1
    assert got[1] == want_1
    assert got[2] == [0] * 16  # empty blob → zero vector, not null
    assert got[3] == [0] * 16


def test_resize_meta_shrinks_and_preserves(spark):
    # width = n%640+1, height = first_byte%480+1 per the fake decode
    small = bytes([9]) * 40  # 41x10 — within 64, untouched
    big = bytes([99]) * 255  # 256x100 — shrink long side to 64
    df = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, media binary"
    )
    got = {r.doc_id: r for r in resize_meta(df, max_dim=64).collect()}
    assert (got[1].new_width, got[1].new_height) == (
        got[1].width,
        got[1].height,
    )
    assert got[2].width == 256 and got[2].height == 100
    assert got[2].new_width == 64  # 256*64 // 256
    assert got[2].new_height == 25  # 100*64 // 256
    assert got[2].new_height >= 1


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
