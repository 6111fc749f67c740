"""Multimodal (image/audio/video) column plumbing (north-star extension).

Media travels as an opaque ``binary`` column plus typed metadata — the
pattern for 100 TB multimodal corpora: parquet stores the bytes inline
(or an object-store URI for large blobs), Spark never interprets them
until an Arrow-batched Pandas transform does.

The *decode* itself is STUBBED in this container (no PIL/ffmpeg): when
the real libraries are absent, ``decode_media_batch`` falls back to a
deterministic fake (documented below) so the Spark-side plumbing —
schema, Arrow batch shape, partitioning, null handling — is fully real
and oracle-checkable, while the genuinely-external bit is marked by
``_decode_real`` raising NotImplementedError.

Scale: mapInPandas streams Arrow batches; memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean blob size, so
set that down (e.g. 64) for multi-MB media. Repartition upstream by a
size-balanced key when blob sizes are heavily skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, fmt string"
)


def attach_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary media column (UTF-8 bytes of the
    text) — the fixture stand-in for real image/audio payload bytes."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
    )


def _decode_real(blob: bytes) -> tuple[int, int, str]:
    """Real image decode — requires an imaging library not present in
    this environment. Plug in PIL/libvips here in production."""
    raise NotImplementedError("image decode requires PIL/libvips")


def _decode_fake(blob: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode (oracle-mirrored): width from byte
    count, height from the first byte value."""
    n = len(blob)
    return (n % 640) + 1, (blob[0] % 480 if n else 0) + 1, "fake"


def decode_media_batch(media_df: DataFrame) -> DataFrame:
    """(doc_id, media binary) → typed metadata via Arrow-batched
    mapInPandas. Tries the real decoder, falls back to the deterministic
    fake when the imaging stack is absent."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf["media"]:
                b = bytes(blob) if blob is not None else b""
                try:
                    w, h, fmt = _decode_real(b)
                except NotImplementedError:
                    w, h, fmt = _decode_fake(b)
                metas.append((len(b), w, h, fmt))
            out = pd.DataFrame(
                metas, columns=["n_bytes", "width", "height", "fmt"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media_df.mapInPandas(decode, META_SCHEMA)


def sample_chunks(
    media_df: DataFrame, chunk_size: int, every_k: int
) -> DataFrame:
    """Frame-sampling analog: split each blob into ``chunk_size`` chunks
    and keep every k-th — the video-keyframe access pattern over binary
    columns. Output: doc_id, chunk_index, chunk (binary)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob) if blob is not None else b""
                n_chunks = (len(b) + chunk_size - 1) // chunk_size
                for ci in range(0, n_chunks, every_k):
                    ids.append(doc_id)
                    idxs.append(ci)
                    chunks.append(b[ci * chunk_size : (ci + 1) * chunk_size])
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_index": idxs, "chunk": chunks}
            )

    return media_df.mapInPandas(
        sample, "doc_id bigint, chunk_index bigint, chunk binary"
    )
