"""Bloom-filter semi-join reduction — sideways information passing for
selective joins over a huge fact table.

At 100 TB the dominant cost of ``fact JOIN dim WHERE dim.selective`` is
shuffling fact rows that the dim filter will discard anyway. The classic
fix (Bloomjoin; Spark implements it as the AQE runtime bloom filter,
``spark.sql.optimizer.runtime.bloomFilter.enabled``) builds a compact
Bloom filter over the surviving build-side keys and evaluates it inside
the fact scan stage, so non-matching rows die before the exchange.

This module implements the pattern explicitly with DataFrame ops so the
reduction is visible, testable, and tunable:

- ``bloom_build`` — the build-side keys hash to ``num_hashes``
  positions in an ``num_bits``-wide bitset, stored DISTRIBUTED as
  ``(word_idx, bits)`` 64-bit words via a ``bit_or`` aggregate (one
  shuffle whose output is at most ``num_bits/64`` rows — a few KB). The
  bitset never materializes on the driver.
- ``bloom_probe`` — each probe row tests its ``num_hashes`` positions
  through broadcast hash joins against the word table (one per hash;
  the fact table itself is never exploded and never shuffled). A row
  survives only if every tested bit is set.

Membership is one-sided: the probe output is a SUPERSET of the true
matches (false-positive rate ~ (1 - e^{-kn/m})^k), so callers follow
with the exact join on the (now tiny) survivor set — correctness never
depends on the filter, only the shuffle volume does.

Hashing uses native ``xxhash64`` (JVM codegen) — no oracle-parity
constraint applies because the final exact join erases the filter from
the visible result.

Reference parity: the reference engine has no runtime-filter operator
(its joins run in PostgreSQL, which plans semi-join reduction itself
where stats allow); this is a scale extension per SURVEY §2 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key, num_bits: int, num_hashes: int) -> list:
    """The ``num_hashes`` bit positions of ``key`` (seeded xxhash64)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> DataFrame:
    """Distributed Bloom bitset over ``keys[key]``.

    Returns ``(word_idx int, bits long)`` — only words with at least one
    set bit are present, so the result is at most ``num_bits / 64`` rows
    regardless of build-side cardinality. The single shuffle is the
    ``groupBy(word_idx)`` with map-side partial ``bit_or``, so exchange
    volume is bounded by (partitions x words), not by |keys|.
    """
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key), num_bits, num_hashes))).alias(
            "pos"
        )
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key: str,
    words: DataFrame,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> DataFrame:
    """Rows of ``df`` whose ``key`` passes the Bloom filter ``words``.

    One broadcast hash join per hash function (the word table is a few
    KB); ``df`` keeps its schema, is never exploded, and is never
    shuffled — the whole probe runs inside the scan stage, which is the
    point: at 100 TB the filter must execute map-side.
    """
    out = df
    for i, pos in enumerate(_positions(F.col(key), num_bits, num_hashes)):
        w = words.select(
            F.col("word_idx").alias(f"__bw{i}"),
            F.col("bits").alias(f"__bb{i}"),
        )
        out = (
            out.withColumn(f"__pos{i}", pos)
            .join(
                F.broadcast(w),
                F.shiftright(F.col(f"__pos{i}"), 6).cast("int")
                == F.col(f"__bw{i}"),
                "left",
            )
            # An absent word means no build key hashed anywhere into
            # that 64-bit window -> definitely not a member.
            .filter(
                F.expr(
                    f"__bb{i} IS NOT NULL AND (__bb{i} & shiftleft("
                    f"CAST(1 AS BIGINT), CAST(__pos{i} % 64 AS INT))) != 0"
                )
            )
            .drop(f"__pos{i}", f"__bw{i}", f"__bb{i}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> DataFrame:
    """EXACT semi-join of ``fact`` against ``dim_keys``, Bloom-reduced.

    The Bloom probe cuts the fact side map-side; the residual inner
    join against the (distinct) build keys removes false positives, so
    the result equals a plain ``left_semi`` join — only the exchange
    volume differs.
    """
    keys = dim_keys.select(dim_key).distinct()
    # The probe references the word table once per hash function;
    # localCheckpoint materializes the (tiny, <= num_bits/64 rows)
    # bitset once instead of replaying the build per broadcast.
    words = bloom_build(keys, dim_key, num_bits, num_hashes).localCheckpoint(
        eager=True
    )
    pruned = bloom_probe(fact, fact_key, words, num_bits, num_hashes)
    return pruned.join(
        keys, pruned[fact_key] == keys[dim_key], "left_semi"
    )
