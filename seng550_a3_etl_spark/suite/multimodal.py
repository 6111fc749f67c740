"""Multimodal suite query: the binary-column decode pipeline end-to-end
(Arrow batches through mapInPandas), oracle-checked because the stub
decode is deterministic arithmetic on the bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.operators.multimodal import (
    attach_media,
    decode_media_batch,
    extract_features,
    resize_meta,
    sample_chunks,
)
from seng550_a3_etl_spark.suite.registry import query


@query(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
           CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 1
                     ELSE ascii(substr(text, 1, 1)) % 480 + 1 END
                AS BIGINT) AS height,
           'fake' AS fmt
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as stand-in media bytes → mapInPandas decode →
    typed metadata. The oracle recomputes the deterministic fake decode
    from the text itself (documents are ASCII, so first char = first
    byte)."""
    t = load_tables(spark, sf_dir)
    media = attach_media(t.documents, "doc_id", "text")
    return decode_media_batch(media)


_N_BINS = 16
_FEATURE_ENTRIES = ",\n           ".join(
    f"CAST(len(list_filter(bs, b -> b % {_N_BINS} = {i})) AS BIGINT)"
    for i in range(_N_BINS)
)


@query(
    "multimodal_features",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id,
             list_transform(
               range(1, octet_length(encode(text)) + 1),
               i -> ascii(substr(text, CAST(i AS INTEGER), 1))) AS bs
      FROM documents
    )
    SELECT doc_id,
           array_to_string([{_FEATURE_ENTRIES}], ',') AS feature
    FROM bytes
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media (the CNN-embedding /
    spectrogram slot): one Arrow pass through mapInPandas, binary in,
    fixed-width ``array<bigint>`` out, zero shuffle. The deterministic
    stand-in feature is a byte histogram mod 16, which the oracle
    replays per-character (the document fixture is ASCII, so bytes and
    code points coincide).

    The suite query serializes the vector as a comma-joined string so
    the driver's pandas canonicalizer (which sorts column values and
    cannot hash Python lists) gets a scalar column; the operator itself
    keeps the production ``array<bigint>`` shape."""
    t = load_tables(spark, sf_dir)
    media = attach_media(t.documents, "doc_id", "text")
    feats = extract_features(media, n_bins=_N_BINS)
    return feats.select(
        "doc_id",
        F.array_join(F.col("feature").cast("array<string>"), ",").alias(
            "feature"
        ),
    )


@query(
    "multimodal_resize_meta",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
             CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 1
                       ELSE ascii(substr(text, 1, 1)) % 480 + 1 END
                  AS BIGINT) AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           CASE WHEN greatest(width, height) > 64
                THEN greatest(1, width * 64 // greatest(width, height))
                ELSE width END AS new_width,
           CASE WHEN greatest(width, height) > 64
                THEN greatest(1, height * 64 // greatest(width, height))
                ELSE height END AS new_height
    FROM meta
    """,
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning (shrink longest side to 64):
    decode metadata via the Arrow batch path, then pure integer-DIV
    column math — per-row, JVM-side, zero shuffle. The pixel resample
    itself is the stubbed external step (SURVEY §2.10 X13)."""
    t = load_tables(spark, sf_dir)
    media = attach_media(t.documents, "doc_id", "text")
    return resize_meta(media, max_dim=64)


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    frames AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(n_bytes / 32.0) AS BIGINT), 2))
               AS chunk_index
      FROM meta WHERE n_bytes > 0
    )
    SELECT doc_id,
           CAST(chunk_index AS BIGINT) AS chunk_index,
           md5(substr(text, CAST(chunk_index * 32 + 1 AS INTEGER), 32))
             AS chunk_md5,
           CAST(octet_length(encode(substr(text,
                CAST(chunk_index * 32 + 1 AS INTEGER), 32))) AS BIGINT)
             AS n_chunk_bytes
    FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media (the video-keyframe access
    pattern): every 2nd 32-byte chunk of each blob, via the Arrow
    mapInPandas path (operators/multimodal.py:sample_chunks). The binary
    chunks surface to the driver as (md5, byte count) so the comparison
    key is a sortable scalar; the oracle recomputes both from the text
    stand-in (documents are ASCII, so byte slices equal char slices)."""
    t = load_tables(spark, sf_dir)
    media = attach_media(t.documents, "doc_id", "text")
    chunks = sample_chunks(media, chunk_size=32, every_k=2)
    return chunks.select(
        "doc_id",
        F.col("chunk_index").alias("chunk_index"),
        # md5 over the BINARY column directly: casting to string would
        # mangle non-UTF8 bytes through replacement characters before
        # hashing (the ASCII fixture hides it; real media would not)
        F.md5(F.col("chunk")).alias("chunk_md5"),
        F.length("chunk").cast("long").alias("n_chunk_bytes"),
    )
