"""Spherical k-means step (Lloyd's iteration) over an embedding column —
north-star extension: the clustering pass a corpus pipeline runs to
derive topical buckets, IVF coarse quantizers, or diversity strata.

One step = E (assign every vector to its max-cosine centroid — exactly
the IVF coarse quantizer, reused from operators/similarity.py) + M
(new centroid = element-wise mean of the members). Full Lloyd's is this
step iterated from the driver with the returned centroids (the standard
Spark pattern for fixed-point ML loops; each step is one broadcast join
+ one shuffle on the cluster id, so k iterations cost k passes, never a
collect of the corpus).

Cross-engine determinism: a float mean is summation-order-dependent, so
the M step quantizes elements to integer micro-units FIRST (exact
integer sums in any order), then divides once per dimension — the same
money-column pattern the suite uses everywhere. The emitted centroid is
the rounded-micros integer vector; callers converting back to floats do
one division per element.

Scale: the E step never shuffles corpus rows (centroids broadcast; the
argmin window partitions by vector id over an already-pruned candidate
set); the M step shuffles (cluster, dim, micro) triples with map-side
partial sums — k·dim groups regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seng550_a3_etl_spark.operators.similarity import assign_buckets

MICRO = 1_000_000


def kmeans_step(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
    centroid_id: str = "bid",
    centroid_vec: str = "bv",
) -> DataFrame:
    """One E+M step. Returns (centroid_id, n_members, centroid_micros)
    where ``centroid_micros`` is the new centroid as an array<bigint> of
    round(mean_of_element_micros) — exact in any summation order.
    Clusters that attract no members are absent from the output (the
    caller decides whether to keep, reseed, or drop empty clusters)."""
    assigned = assign_buckets(
        corpus, centroids, corpus_id, corpus_vec, centroid_id, centroid_vec
    )
    exploded = assigned.select(
        centroid_id,
        F.posexplode(corpus_vec).alias("__dim", "__x"),
    ).select(
        centroid_id,
        "__dim",
        F.round(F.col("__x").cast("double") * MICRO).cast("long").alias(
            "__micro"
        ),
    )
    sums = exploded.groupBy(centroid_id, "__dim").agg(
        F.sum("__micro").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    return (
        sums.withColumn(
            "__m", F.round(F.col("__s") / F.col("__n")).cast("long")
        )
        .groupBy(centroid_id)
        .agg(
            # max, not first: first() over the per-dim counts is
            # nondeterministic, and per-dim counts can differ for ragged
            # vectors — max matches the oracle's MAX(n)
            F.max("__n").alias("n_members"),
            F.array_sort(
                F.collect_list(F.struct(F.col("__dim"), F.col("__m")))
            ).alias("__dm"),
        )
        .select(
            centroid_id,
            F.col("n_members").cast("long").alias("n_members"),
            F.transform(F.col("__dm"), lambda s: s["__m"]).alias(
                "centroid_micros"
            ),
        )
    )
