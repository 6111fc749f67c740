"""TF-IDF term ranking over a documents table (north-star extension;
SURVEY.md §7 phase 5).

Scoring uses the log-free variant score = tf * (N/df) =
(cnt * N) / len / df — a fixed left-to-right chain of IEEE multiplies
and divides over integer-valued doubles, so a SQL oracle reproduces
every score bit-for-bit (ln() implementations may differ across engines
by an ulp, which could flip rankings; rational scores cannot).

Plan shape at scale: one explode pass feeds both the (doc, term) counts
and the doc lengths (map-side combined); document frequency is a second
aggregate over the counts; N broadcasts as a 1-row frame. The only
wide shuffles are the three aggregates and the per-doc ranking window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from seng550_a3_etl_spark.functions.text import tokens


def tfidf_top_terms(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k terms per document by tf·(N/df), ties broken by term.
    Output: doc (id), term, score (rounded 6), rank."""
    ex = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    tf = ex.groupBy("doc", "t").agg(F.count(F.lit(1)).alias("cnt"))
    dlen = ex.groupBy("doc").agg(F.count(F.lit(1)).alias("len"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dlen, "doc")
        .join(dfreq, "t")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("cnt").cast("double")
            * F.col("n_docs")
            / F.col("len")
            / F.col("df"),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("t"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc", F.col("t").alias("term"), F.round("score", 6).alias("score"), "rank")
    )
