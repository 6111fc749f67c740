"""Stage-level 10x scaling profile for the two sf1-spot watch items
(minhash_dup_pairs 11.9x, embedding_cosine_dedup 10.4x — VERDICT r5 #3).

Builds the bench's salted 10x replica of $SPARK_GRAFT_SF_DIR, then times
each pipeline stage (shingle/signature build, banding+candidates,
verify) at 1x and 10x and reports the per-stage ratio plus candidate /
bucket-size distributions, so the superlinear stage is identified by
measurement instead of guesswork.

Usage: python scripts/profile_10x.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seng550_a3_etl_spark.session import get_spark  # noqa: E402


def _t(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"    {label:42s} {dt:7.2f}s")
    return out, dt


def profile_minhash(spark, sf_dir: str) -> dict:
    # Stage boundaries force this to mirror minhash_lsh_pairs'
    # internals; the scale knobs are imported from the suite module so
    # a re-parameterization there cannot leave this profiler measuring
    # a different pipeline under the same query name.
    from seng550_a3_etl_spark.functions.text import shingles, tokens
    from seng550_a3_etl_spark.functions.hashing import minhash_signatures
    from seng550_a3_etl_spark.operators.text_dedup import (
        band_keys,
        bucket_pairs,
    )
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.suite.text import (
        MINHASH_BANDS,
        MINHASH_NUM_PERM,
    )

    t = load_tables(spark, sf_dir)
    res: dict = {}

    sets_, res["shingle_build"] = _t(
        "shingle build (string, eager ckpt)",
        lambda: t.documents.select(
            F.col("doc_id").alias("doc"),
            F.array_distinct(shingles(tokens(F.col("text")), 3)).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .localCheckpoint(eager=True),
    )

    signed = minhash_signatures(sets_, "doc", F.col("sh"), MINHASH_NUM_PERM)
    banded = band_keys(
        signed, MINHASH_BANDS, MINHASH_NUM_PERM // MINHASH_BANDS
    )
    cand, res["sign_band_cand"] = _t(
        "signatures + banding + candidates (ckpt)",
        lambda: bucket_pairs(banded, ["band", "key"], F.col("doc"))
        .toDF("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=True),
    )
    res["n_cand"] = cand.count()
    print(f"    candidates: {res['n_cand']}")

    # bucket-size distribution of the banding groupBy
    bs = (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_sz"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("pair_budget"),
        )
        .collect()[0]
    )
    print(
        f"    buckets={bs['n_buckets']} max_size={bs['max_sz']} "
        f"C(n,2) budget={int(bs['pair_budget'])}"
    )
    res["max_bucket"] = bs["max_sz"]
    res["pair_budget"] = int(bs["pair_budget"])

    melted = cand.select(
        F.struct("doc_a", "doc_b").alias("__pair"),
        F.posexplode(F.array("doc_a", "doc_b")).alias("__side", "doc"),
    )
    verified = (
        melted.join(sets_, "doc")
        .groupBy("__pair")
        .agg(
            F.first(
                F.when(F.col("__side") == 0, F.col("sh")), ignorenulls=True
            ).alias("sh_a"),
            F.first(
                F.when(F.col("__side") == 1, F.col("sh")), ignorenulls=True
            ).alias("sh_b"),
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    _, res["verify"] = _t(
        "verify (melt-join + array_intersect)",
        lambda: verified.select("inter").write.format("noop").mode(
            "overwrite"
        ).save(),
    )
    return res


def profile_cosine(spark, sf_dir: str) -> dict:
    # Same mirroring caveat as profile_minhash: knobs come from the
    # suite module (COSINE_DEDUP_*), never hardcoded here.
    from seng550_a3_etl_spark.catalog import load_tables
    from seng550_a3_etl_spark.operators.similarity import (
        _band_keys_expr,
        _sign_bits_expr,
        hyperplane_weights,
    )
    from seng550_a3_etl_spark.operators.text_dedup import bucket_pairs
    from seng550_a3_etl_spark.suite.vectors import (
        COSINE_DEDUP_BANDS,
        COSINE_DEDUP_DIM,
        COSINE_DEDUP_PLANES,
    )

    t = load_tables(spark, sf_dir)
    base = t.embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    jitter = t.embeddings.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("id"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") + F.lit(0.02)).cast("float"),
        ).alias("v"),
    )
    corpus = base.unionAll(jitter)
    res: dict = {}

    planes, bands = COSINE_DEDUP_PLANES, COSINE_DEDUP_BANDS
    rows = planes // bands
    weights = hyperplane_weights(planes, COSINE_DEDUP_DIM)
    banded_df = corpus.select(
        F.col("id"), F.expr(_sign_bits_expr("v", weights)).alias("__bits")
    ).select(
        F.col("id"),
        F.posexplode(F.expr(_band_keys_expr("__bits", bands, rows))).alias(
            "band", "bkey"
        ),
    )
    banded, res["sign_band"] = _t(
        "sign bits + band keys (eager ckpt)",
        lambda: banded_df.localCheckpoint(eager=True),
    )

    cand, res["cand"] = _t(
        "bucket pairs + distinct (ckpt)",
        lambda: bucket_pairs(banded, ["band", "bkey"], F.col("id"))
        .toDF("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True),
    )
    res["n_cand"] = cand.count()
    print(f"    candidates: {res['n_cand']}")

    bs = (
        banded.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_sz"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("pair_budget"),
        )
        .collect()[0]
    )
    print(
        f"    buckets={bs['n_buckets']} max_size={bs['max_sz']} "
        f"C(n,2) budget={int(bs['pair_budget'])}"
    )
    res["max_bucket"] = bs["max_sz"]
    res["pair_budget"] = int(bs["pair_budget"])

    vn = corpus.select(
        F.col("id"),
        F.col("v").alias("__v"),
        F.sqrt(
            F.aggregate(
                F.transform(
                    F.col("v"), lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("__n"),
    )
    melted = cand.select(
        F.struct("id_a", "id_b").alias("__pair"),
        F.posexplode(F.array("id_a", "id_b")).alias("__side", "id"),
    )

    def side(i, c):
        return F.first(
            F.when(F.col("__side") == i, F.col(c)), ignorenulls=True
        )

    verified = (
        melted.join(vn, "id")
        .groupBy("__pair")
        .agg(
            side(0, "__v").alias("va"),
            side(1, "__v").alias("vb"),
            side(0, "__n").alias("na"),
            side(1, "__n").alias("nb"),
        )
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with(
                    "va", "vb",
                    lambda a, b: a.cast("double") * b.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn("cos", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6))
    )
    _, res["verify"] = _t(
        "verify (melt-join + dot)",
        lambda: verified.select("cos").write.format("noop").mode(
            "overwrite"
        ).save(),
    )
    return res


PROFILES = {
    "minhash_dup_pairs": profile_minhash,
    "embedding_cosine_dedup": profile_cosine,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(PROFILES)
    spark = get_spark()

    import bench

    scaled = tempfile.mkdtemp(prefix=".prof_10x_", dir=".")
    try:
        # Same JIT warm-up the bench does before timing: without it the
        # first 1x stage absorbs the one-off codegen compile of the
        # wide tokenize->shingle pipeline (~2s) while the 10x rerun is
        # warm, biasing the very ratios this script exists to measure.
        t0 = time.perf_counter()
        bench._warm_text_pipeline(spark, sf_dir)
        print(f"JIT warm-up: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        bench._scale_10x(spark, sf_dir, scaled)
        print(f"10x replica build: {time.perf_counter() - t0:.1f}s")
        for name in names:
            fn = PROFILES[name]
            print(f"\n=== {name} @ 1x ({sf_dir})")
            one = fn(spark, sf_dir)
            print(f"=== {name} @ 10x")
            ten = fn(spark, scaled)
            print("--- stage ratios (10x/1x):")
            for k in one:
                if isinstance(one[k], float) and one[k] > 0:
                    print(f"    {k:42s} {ten[k] / one[k]:6.1f}x")
                else:
                    print(f"    {k:42s} {one[k]} -> {ten[k]}")
    finally:
        shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
