"""Unit tests for functions/hashing.py — the packed simhash aggregate
must stay bit-identical to the per-row HOF spec, including for documents
past the old 16-bit counter capacity (65,535 tokens), where the previous
packing silently corrupted neighboring counters."""

from __future__ import annotations

from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.hashing import (
    simhash,
    simhash_fingerprints,
)


def _fingerprint_pair(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    packed = {
        r.doc_id: r.fp
        for r in simhash_fingerprints(df, "doc_id", F.col("tokens")).collect()
    }
    spec = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", simhash(F.col("tokens")).alias("fp")
        ).collect()
    }
    return packed, spec


def test_packed_matches_hof_spec(spark):
    docs = [
        (1, ["alpha", "beta", "gamma", "alpha"]),
        (2, ["alpha", "beta", "gamma", "delta"]),
        (3, []),  # empty → fp 0 via the closing left join
        (4, ["solo"]),
    ]
    packed, spec = _fingerprint_pair(spark, docs)
    assert packed[3] == 0
    spec[3] = 0  # HOF spec over [] is also 0 (no bit sums > 0)
    assert packed == spec


def test_packed_survives_token_counts_past_16bit(spark):
    # 70,000 tokens (> 65,535): each per-bit counter must stay in its own
    # 32-bit lane — under the old 16-bit packing the low counter carried
    # into its neighbor and corrupted the fingerprint.
    tokens = [f"t{i % 997}" for i in range(70_000)]
    packed, spec = _fingerprint_pair(spark, [(1, tokens)])
    assert packed[1] == spec[1]


def test_onepass_matches_hof_spec(spark):
    # The streaming (single-fold) form must stay bit-identical to both
    # the HOF spec and the packed aggregate, including the empty-array
    # and repeated-token cases.
    from seng550_a3_etl_spark.functions.hashing import simhash_onepass

    docs = [
        (1, ["alpha", "beta", "gamma", "alpha"]),
        (2, ["alpha", "beta", "gamma", "delta"]),
        (3, []),  # fold over [] → every bit sum 0 → fp 0
        (4, ["solo"]),
        (5, [f"t{i % 97}" for i in range(1_000)]),
    ]
    df = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    onepass = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", simhash_onepass(F.col("tokens")).alias("fp")
        ).collect()
    }
    spec = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", simhash(F.col("tokens")).alias("fp")
        ).collect()
    }
    assert onepass == spec
    assert onepass[3] == 0


def test_simhash_idf_weights_cut_banding_clustering(spark):
    """The r14 clustering finding, demonstrated end to end: a corpus
    whose docs share heavy common tokens (same 'language') clusters in
    banding keyspace under unit-weight SimHash; IDF weighting zeroes
    the common tokens' votes and the candidate budget collapses, while
    true near-dups (one rare token changed) stay within the Hamming
    threshold."""
    import random

    from pyspark.sql import functions as F

    from seng550_a3_etl_spark.functions.hashing import (
        simhash_fingerprints,
        simhash_fingerprints_idf,
    )
    from seng550_a3_etl_spark.operators.text_dedup import simhash_band_keys

    rnd = random.Random(41)
    common = [f"the{i}" for i in range(12)]
    rows = []
    for d in range(200):
        rare = [f"w{d}_{i}" for i in range(20)]
        rows.append((d, common * 3 + rare))  # common tokens dominate
    # a genuine near-dup of doc 0: one rare token swapped (1 of 20 —
    # each bit's weighted vote is a 19-step walk plus the differing
    # pair, so E[flips] ~ 60 * P(|walk| <= 1) * P(bits differ) ~ 5)
    dup = list(rows[0][1])
    dup[-1] = "w0_changed"
    rows.append((200, dup))
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")

    def budget(fps):
        return (
            simhash_band_keys(fps, "doc_id", "fp", 3, 60)
            .groupBy("band", "key")
            .count()
            .selectExpr("sum(count * (count - 1) / 2) AS b")
            .collect()[0]["b"]
        )

    plain = simhash_fingerprints(df, "doc_id", F.col("toks"))
    idf = simhash_fingerprints_idf(df, "doc_id", F.col("toks"))
    b_plain, b_idf = budget(plain), budget(idf)
    assert b_idf < b_plain / 3, (b_plain, b_idf)

    # the near-dup pair survives IDF weighting within a small Hamming
    fp = {r["doc_id"]: r["fp"] for r in idf.collect()}
    ham = bin(fp[0] ^ fp[200]).count("1")
    assert ham <= 15, ham
    # while two UNRELATED docs sit near the 30-bit random midpoint
    ham_far = bin(fp[1] ^ fp[2]).count("1")
    assert ham_far > 15, ham_far
    # and empty-token docs surface as fp=0
    empty = spark.createDataFrame(
        [(1, []), (2, ["x"])], "doc_id long, toks array<string>"
    )
    got = {
        r["doc_id"]: r["fp"]
        for r in simhash_fingerprints_idf(
            empty, "doc_id", F.col("toks")
        ).collect()
    }
    assert got[1] == 0
