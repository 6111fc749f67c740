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


def extract_features(media_df: DataFrame, n_bins: int = 16) -> DataFrame:
    """(doc_id, media binary) → fixed-width feature vector via
    Arrow-batched mapInPandas — the image/audio feature-extract slot.

    The real extractor (CNN embedding, mel spectrogram) needs libraries
    absent here, so the deterministic stand-in is a byte histogram:
    ``feature[i] = count of bytes b with b % n_bins == i``. Exact
    integer counts, so the DuckDB oracle can replay it; the Spark-side
    shape (binary in, ``array<bigint>`` out, one Arrow pass, zero
    shuffle) is exactly the production plumbing.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                b = bytes(blob) if blob is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                counts = np.bincount(arr % n_bins, minlength=n_bins)
                feats.append([int(c) for c in counts])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "feature": feats}
            )

    return media_df.mapInPandas(
        featurize, "doc_id bigint, feature array<bigint>"
    )


def resize_meta(media_df: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize planning over decoded dimensions: aspect-preserving
    shrink-to-fit via pure integer math (``new = old * max_dim //
    max(w, h)``, floored at 1; identity when already within bounds).

    The pixel resample itself belongs to the absent imaging stack; what
    scale cares about — per-row dimension math staying JVM-side with
    zero shuffle — is fully real. Output: doc_id, width, height,
    new_width, new_height.
    """
    meta = decode_media_batch(media_df)
    longest = F.greatest("width", "height")
    shrink = F.col("max_side") > max_dim

    def scaled(c: str):
        # integer DIV end-to-end: bit-identical in Spark and DuckDB,
        # no float rounding at exact-ratio boundaries
        return F.when(
            shrink,
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"{c} * {max_dim} DIV max_side"),
            ),
        ).otherwise(F.col(c))

    return (
        meta.withColumn("max_side", longest)
        .select(
            "doc_id",
            "width",
            "height",
            scaled("width").alias("new_width"),
            scaled("height").alias("new_height"),
        )
    )


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
