"""Document deduplication operators (north-star extension).

Four strategies, ordered by cost/recall trade-off — the standard ladder
for a pretraining-corpus pipeline:

1. **exact_dedup** — hash-groupBy on content hash. One shuffle of
   (hash, id); at 100 TB this is the cheapest possible full-corpus op.
2. **ngram_jaccard_pairs** — exact shingle-set Jaccard via a self-join on
   exploded distinct shingles. Quadratic in documents *per shared
   shingle*; correct baseline, does not survive web scale unfiltered
   (the ``max_shingle_freq`` knob drops stop-shingles to bound the join).
3. **minhash_lsh_pairs** — MinHash signatures (explode + codegen'd
   seeded-min aggregates, map-side combined) → banded LSH bucket join
   (shuffle on (band, bucket-key)) → exact Jaccard verify on the
   candidates. The scale path: candidate count is governed by the
   band/row configuration, not |docs|².
4. **simhash_pairs** — 60-bit SimHash fingerprints (explode + 60
   literal-shift sum aggregates, map-side combined); pairs within
   Hamming distance k found by a pigeonhole band join (k+1 bands → any
   pair with ≤k differing bits shares at least one exact band), then
   exact popcount verify. One narrow shuffle on (band, chunk-value).

All hashing is the md5-derived 60-bit hash from functions/hashing.py so
a DuckDB oracle reproduces results bit-for-bit; production can inject
xxhash64 instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.hashing import (
    minhash_signatures,
    simhash_fingerprints,
)
from seng550_a3_etl_spark.functions.text import shingles, tokens


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Map every document to its canonical (minimum) id among exact
    content duplicates. Output: id, canonical_id, group_size."""
    h = F.md5(F.col(text_col)).alias("__h")
    groups = (
        df.select(F.col(id_col), h)
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )
    return (
        df.select(F.col(id_col), h)
        .join(groups, "__h")
        .select(id_col, "canonical_id", "group_size")
    )


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(shingles(tokens(F.col(text_col)), n)).alias("sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All document pairs with n-gram-shingle Jaccard ≥ threshold.

    Output: doc_a < doc_b, inter, size_a, size_b, jaccard. The
    intersection is counted by self-joining exploded distinct shingles —
    partial-agg shrinks the pair stream before the final group."""
    sets_ = _shingle_sets(df, id_col, text_col, n)
    sizes = sets_.select("doc", F.size("sh").cast("long").alias("n_sh"))
    exploded = sets_.select("doc", F.explode("sh").alias("s"))
    if max_shingle_freq is not None:
        freq_ok = (
            exploded.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__f"))
            .filter(F.col("__f") <= max_shingle_freq)
            .select("s")
        )
        exploded = exploded.join(freq_ok, "s")
    a = exploded.toDF("doc_a", "s")
    b = exploded.toDF("doc_b", "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.toDF("doc_a", "size_a"), "doc_a")
        .join(sizes.toDF("doc_b", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    Signature per doc (no shuffle) → per band, bucket key = the band's
    signature slice → shuffle on (band, key) → candidate pairs sharing
    any band → verify exact Jaccard via array_intersect on the (distinct)
    shingle arrays. Output schema matches :func:`ngram_jaccard_pairs`.
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    sets_ = _shingle_sets(df, id_col, text_col, n).filter(F.size("sh") > 0)
    signed = minhash_signatures(sets_, "doc", F.col("sh"), num_perm)
    banded = signed.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.key")
    cand = (
        banded.toDF("doc_a", "band", "key")
        .join(banded.toDF("doc_b", "band", "key"), ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        cand.join(sets_.toDF("doc_a", "sh_a"), "doc_a")
        .join(sets_.toDF("doc_b", "sh_b"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn("size_a", F.size("sh_a").cast("long"))
        .withColumn("size_b", F.size("sh_b").cast("long"))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select(
        "doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard"
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 60,
) -> DataFrame:
    """Document pairs whose SimHash fingerprints differ in ≤ max_hamming
    bits. Pigeonhole band join: split the fingerprint into
    ``max_hamming+1`` chunks — any qualifying pair agrees exactly on at
    least one chunk — then verify with popcount(xor). Output: doc_a,
    doc_b, hamming."""
    n_bands = max_hamming + 1
    chunk = bits // n_bands
    fps = simhash_fingerprints(
        df.select(F.col(id_col).alias("doc"), F.col(text_col)),
        "doc",
        tokens(F.col(text_col)),
        bits=bits,
    )
    banded = fps.select(
        "doc",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("fp"), b * chunk)
                        .bitwiseAND(F.lit((1 << chunk) - 1))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "fp", "bk.band", "bk.key")
    a = banded.toDF("doc_a", "fp_a", "band", "key")
    b = banded.toDF("doc_b", "fp_b", "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
