"""Training-data decontamination (north-star extension).

Before pretraining, every document sharing enough n-gram overlap with an
evaluation/benchmark corpus must be flagged (and usually dropped) so the
model is not trained on its own test set. Not in the reference's surface
(its corpus is municipal incident data); this is the standard first-class
op of an LLM corpus pipeline alongside dedup (operators/text_dedup.py).

Shape: both corpora reduce to distinct n-gram shingles; the eval side
collapses to a distinct shingle-hash set (benchmarks are tiny next to a
training corpus — a few million shingles — so Spark broadcasts it and
the training side NEVER shuffles: flagging 100 TB costs one scan). The
per-document overlap count comes from one groupBy on the doc id, which
is only needed for documents that matched at all (the inner join's
output is empty for clean corpora — the common case — so the shuffle
carries matches, not the corpus).

The oracle replays the same shingling + join in DuckDB, so the flagging
is value-checked, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.hashing import hash64
from seng550_a3_etl_spark.functions.text import shingles, tokens


def _distinct_shingle_hashes(
    df: DataFrame, out: str, text_col: str, n: int, *keep
) -> DataFrame:
    # hash64 (portable md5-60bit) so the DuckDB oracle replays the join
    # key bit-for-bit; swap for F.xxhash64 in production (same contract,
    # see functions/hashing.py).
    sh = F.array_distinct(shingles(tokens(F.col(text_col)), n))
    return df.select(*keep, F.explode(sh).alias("__s")).select(
        *keep, hash64(F.col("__s")).alias(out)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str,
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag documents sharing ≥ ``min_overlap`` distinct ``n``-gram
    shingles with ``eval_docs``.

    Output: every row of ``docs``'s id column plus ``n_overlap`` (count
    of distinct contaminated shingles, 0 when clean) and ``contaminated``
    (boolean). ``n=13`` is the conventional benchmark-overlap window;
    fixtures use smaller ``n`` to keep documents long enough to shingle.

    Scale: the eval shingle set is deduplicated *before* the join and is
    broadcast when small (the usual case — force with
    ``F.broadcast(eval_docs)`` upstream if statistics mislead); the
    training corpus is scanned once and only matching (doc, shingle)
    rows ever shuffle, so a clean corpus costs a scan and nothing else.
    """
    doc_sh = _distinct_shingle_hashes(docs, "hs", text_col, n, F.col(id_col))
    eval_sh = _distinct_shingle_hashes(
        eval_docs, "hs", eval_text_col, n
    ).distinct()
    overlap = (
        doc_sh.join(eval_sh, "hs")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.select(id_col)
        .join(overlap, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )
