"""Embedding similarity-search suite queries (north-star extension),
oracle-checked: DuckDB recomputes the identical double-precision cosine
(elements cast to double before multiply, sequential sums) and the
identical deterministic ranking (round(cos,6) DESC, id ASC)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.operators.similarity import cosine_topk, ivf_topk
from seng550_a3_etl_spark.suite.registry import query


def _dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def _cos(a: str, b: str) -> str:
    return (
        f"({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))"
    )


@query(
    "embedding_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv
               FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    pairs AS (
      SELECT qid, cid, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM q, c WHERE qid != cid
    )
    SELECT qid, cid, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY cosine DESC, cid
      ) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 20 vectors as
    queries — the ANN correctness baseline (broadcast queries, corpus
    scan streams, one window shuffle on qid)."""
    t = load_tables(spark, sf_dir)
    q = t.embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = t.embeddings.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    out = cosine_topk(q, c, k=5)
    return out.select("qid", "cid", "cosine", F.col("rank").cast("long").alias("rank"))


@query(
    "embedding_topk_ivf",
    oracle=f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    cent AS (SELECT vec_id AS bid, embedding AS bv
             FROM embeddings WHERE vec_id % 50 = 0),
    q AS (SELECT vec_id AS qid, embedding AS qv
          FROM embeddings WHERE vec_id < 20),
    assign AS (
      SELECT cid, cv, bid FROM (
        SELECT cid, cv, bid, ROW_NUMBER() OVER (
          PARTITION BY cid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT cid, cv, bid, ROUND({_cos('cv', 'bv')}, 6) AS sim
              FROM c, cent)
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT qid, qv, bid FROM (
        SELECT qid, qv, bid, ROW_NUMBER() OVER (
          PARTITION BY qid ORDER BY sim DESC, bid
        ) AS rn
        FROM (SELECT qid, qv, bid, ROUND({_cos('qv', 'bv')}, 6) AS sim
              FROM q, cent)
      ) WHERE rn <= 3
    ),
    pairs AS (
      SELECT qid, cid, ROUND({_cos('qv', 'cv')}, 6) AS cosine
      FROM probes JOIN assign USING (bid) WHERE qid != cid
    )
    SELECT qid, cid, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY cosine DESC, cid
      ) AS rank
      FROM pairs
    ) WHERE rank <= 5
    """,
)
def embedding_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: every 50th vector is a coarse centroid, corpus is
    bucketed by nearest centroid, each query probes its 3 nearest
    buckets. The oracle replays the full quantize→probe→rank pipeline —
    checking the ANN *construction*, not just the arithmetic."""
    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    cent = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("bv")
    )
    out = ivf_topk(q, c, cent, k=5, nprobe=3)
    return out.select("qid", "cid", "cosine", F.col("rank").cast("long").alias("rank"))
