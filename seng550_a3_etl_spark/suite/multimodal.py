"""Multimodal suite query: the binary-column decode pipeline end-to-end
(Arrow batches through mapInPandas), oracle-checked because the stub
decode is deterministic arithmetic on the bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.operators.multimodal import (
    attach_media,
    decode_media_batch,
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
