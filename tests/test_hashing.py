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
