"""Similarity search over an embedding column (north-star extension).

Two strategies:

- **cosine_topk** — exact brute force: broadcast the (small) query set
  against the corpus scan, window top-k per query. At scale the corpus
  side never shuffles *rows*; the only shuffle carries (query, candidate,
  score) tuples, pre-pruned per partition. This is the correctness
  baseline.
- **ivf_topk** — IVF-style approximate search: a small centroid set
  partitions the corpus into buckets (nearest-centroid assignment =
  broadcast join + window argmin); a query probes only its ``nprobe``
  nearest buckets. Corpus scored per query drops from |corpus| to
  ~nprobe/|C| of it. The bucketed corpus is the thing you'd persist
  (partitionBy(bucket)) for repeated query workloads — the vector-DB
  pattern expressed as plain DataFrames.

Ranking uses (round(cosine, 6) DESC, id ASC) so ordering is
deterministic and oracle-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from seng550_a3_etl_spark.functions.vectors import cosine


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "qid",
    query_vec: str = "qv",
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-pairs excluded when
    ids collide). Output: query_id, corpus_id, cosine (rounded 6), rank."""
    pairs = (
        corpus.join(F.broadcast(queries))
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn(
            "cosine", F.round(cosine(F.col(query_vec), F.col(corpus_vec)), 6)
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cosine"), F.asc(corpus_id)
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def assign_buckets(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
    centroid_id: str = "bid",
    centroid_vec: str = "bv",
) -> DataFrame:
    """Nearest-centroid (max-cosine) bucket per corpus vector — the IVF
    coarse quantizer as a broadcast join + window argmin."""
    scored = corpus.join(F.broadcast(centroids)).withColumn(
        "__sim", F.round(cosine(F.col(corpus_vec), F.col(centroid_vec)), 6)
    )
    w = Window.partitionBy(corpus_id).orderBy(F.desc("__sim"), F.asc(centroid_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(corpus_id, corpus_vec, centroid_id)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int,
    query_id: str = "qid",
    query_vec: str = "qv",
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
    centroid_id: str = "bid",
    centroid_vec: str = "bv",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest centroid buckets.
    Same output schema as :func:`cosine_topk` (rank within probed set)."""
    bucketed = assign_buckets(
        corpus, centroids, corpus_id, corpus_vec, centroid_id, centroid_vec
    )
    probes = (
        queries.join(F.broadcast(centroids))
        .withColumn(
            "__sim", F.round(cosine(F.col(query_vec), F.col(centroid_vec)), 6)
        )
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(
                    F.desc("__sim"), F.asc(centroid_id)
                )
            ),
        )
        .filter(F.col("__pr") <= nprobe)
        .select(query_id, query_vec, centroid_id)
    )
    pairs = (
        probes.join(bucketed, centroid_id)
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn(
            "cosine", F.round(cosine(F.col(query_vec), F.col(corpus_vec)), 6)
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
