"""Unit tests for the Bloom semi-join reduction and the degree-oriented
triangle census (round-5 scale operators)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from seng550_a3_etl_spark.operators.bloomjoin import (
    bloom_build,
    bloom_probe,
    bloom_semi_join,
)
from seng550_a3_etl_spark.operators.graph import triangle_count


def test_bloom_probe_is_superset_and_semi_join_exact(spark):
    random.seed(7)
    build = list(random.sample(range(100_000), 500))
    probe = list(random.sample(range(100_000), 3_000))
    keys = spark.createDataFrame([(k,) for k in build], "k long")
    facts = spark.createDataFrame([(k,) for k in probe], "fk long")

    words = bloom_build(keys, "k", num_bits=1 << 14, num_hashes=3)
    passed = {
        r.fk
        for r in bloom_probe(
            facts, "fk", words, num_bits=1 << 14, num_hashes=3
        ).collect()
    }
    truth = set(build) & set(probe)
    # one-sided error: every true member passes
    assert truth <= passed
    # and the exact residual join removes every false positive
    exact = {
        r.fk
        for r in bloom_semi_join(
            facts, "fk", keys, "k", num_bits=1 << 14, num_hashes=3
        ).collect()
    }
    assert exact == truth


def test_bloom_words_bounded_by_num_bits(spark):
    keys = spark.range(10_000).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=3).collect()
    # at most num_bits/64 words regardless of build cardinality
    assert len(words) <= (1 << 12) // 64
    assert all(0 <= r.word_idx < (1 << 12) // 64 for r in words)


def test_bloom_empty_build_passes_nothing(spark):
    keys = spark.createDataFrame([], "k long")
    facts = spark.range(100).select(F.col("id").alias("fk"))
    words = bloom_build(keys, "k")
    assert bloom_probe(facts, "fk", words).count() == 0


def test_triangle_count_known_graph(spark):
    # K4 plus a pendant edge: 4 triangles, 7 edges
    # wedges: K4 deg {3,3,3,4(node w/ pendant)} + pendant deg 1
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    # feed duplicates + reversed orientation: operator must canonicalize
    noisy = edges + [(b, a) for a, b in edges] + edges[:3]
    df = spark.createDataFrame(noisy, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row.n_edges == 7
    assert row.n_triangles == 4
    degs = {0: 3, 1: 3, 2: 3, 3: 4, 4: 1}
    assert row.n_wedges == sum(d * (d - 1) // 2 for d in degs.values())


def test_triangle_count_matches_brute_force_random(spark):
    random.seed(11)
    nodes = range(40)
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if random.random() < 0.15
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    es = set(edges)

    def has(a, b):
        return (a, b) in es or (b, a) in es

    brute = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if has(a, b) and has(a, c) and has(b, c)
    )
    assert row.n_triangles == brute
    assert row.n_edges == len(es)


def test_triangle_orientation_caps_hub_fanout(spark):
    # star graph: hub 0 connected to 1..200 — zero triangles, and the
    # degree orientation must point every edge INTO the hub, so the
    # wedge join emits C(1,2)=0 candidates per leaf instead of
    # C(200,2) from the hub. The assertion is on the result (no
    # triangles, correct wedge count) and that the plan completes
    # instantly even with the hub present.
    edges = [(0, i) for i in range(1, 201)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row.n_triangles == 0
    assert row.n_edges == 200
    assert row.n_wedges == 200 * 199 // 2


def test_lsh_incremental_survivors_semantics(spark):
    from seng550_a3_etl_spark.operators.text_dedup import (
        lsh_incremental_survivors,
    )

    base = spark.createDataFrame(
        [(100, 0, "k1")], "doc long, band int, key string"
    )
    # new batch: 1 collides with base; 2 collides with 1 (dropped -> no
    # chain revival: 2 still drops); 3 collides with 2 only via a bucket
    # 2 is in; 4 is clean; 5 shares a bucket with larger-id 6 -> 5 keeps,
    # 6 drops.
    new = spark.createDataFrame(
        [
            (1, 0, "k1"),
            (2, 1, "k2"),
            (1, 1, "k2"),
            (3, 2, "k3"),
            (2, 2, "k3"),
            (4, 0, "k4"),
            (5, 3, "k5"),
            (6, 3, "k5"),
        ],
        "doc long, band int, key string",
    )
    got = {
        r.doc for r in lsh_incremental_survivors(base, new).collect()
    }
    assert got == {4, 5}
