"""The r15 unrolled-dot contract: dot(dim=K) must be bit-identical to
the HOF fold on every input in the callers' domain — including negative
zeros, negative values, denormals, and literal-weight operands — and
must reject Column operands (the py4j plan-build hazard)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.vectors import dot, dot_sql


def _pairs(spark, rows, dim):
    schema = "a array<float>, b array<float>"
    df = spark.createDataFrame(rows, schema)
    return df.select(
        dot(F.col("a"), F.col("b")).alias("fold"),
        dot("a", "b", dim).alias("unrolled"),
    ).collect()


def test_unrolled_matches_fold_bitwise(spark):
    rows = [
        ([1.5, -2.25, 3.125, 0.0], [4.0, 5.5, -6.75, 7.0]),
        ([-0.0, 1.0, 2.0, 3.0], [1.0, -0.0, 0.5, -0.5]),
        ([1e-38, -1e-38, 1e38, -1e38], [1e-38, 1e-38, 1e-30, 1e-30]),
        ([0.1, 0.2, 0.3, 0.4], [0.7, 0.8, 0.9, 1.0]),
    ]
    for r in _pairs(spark, rows, 4):
        assert math.isclose(r.fold, r.unrolled, rel_tol=0.0, abs_tol=0.0), r
        # bitwise, not just isclose: struct-pack both
        import struct

        assert struct.pack("d", r.fold) == struct.pack("d", r.unrolled), r


def test_unrolled_prefix_is_matryoshka_slice(spark):
    # dim=K over longer arrays scores exactly the K-prefix — the
    # matryoshka callers rely on this instead of F.slice.
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0])],
        "a array<float>, b array<float>",
    )
    row = df.select(
        dot("a", "b", 2).alias("pref"),
        dot(F.slice("a", 1, 2), F.slice("b", 1, 2)).alias("fold_slice"),
    ).collect()[0]
    assert row.pref == row.fold_slice == 1.0 * 5.0 + 2.0 * 6.0


def test_literal_weight_operand(spark):
    w = [0.5, -1.25, 2.0]
    df = spark.createDataFrame(
        [([2.0, 4.0, 8.0],)], "a array<float>"
    )
    row = df.select(
        dot("a", w, 3).alias("lit"),
        dot(F.col("a"), F.array(*[F.lit(x) for x in w])).alias("fold"),
    ).collect()[0]
    assert row.lit == row.fold == 2.0 * 0.5 + 4.0 * -1.25 + 8.0 * 2.0


def test_column_operands_with_dim_rejected():
    with pytest.raises(TypeError, match="py4j"):
        dot(F.col("a"), F.col("b"), 4)


def test_dot_sql_shape():
    s = dot_sql("a", "b", 2)
    assert s == (
        "(CAST(a[0] AS DOUBLE) * CAST(b[0] AS DOUBLE)) + "
        "(CAST(a[1] AS DOUBLE) * CAST(b[1] AS DOUBLE))"
    )
    with pytest.raises(ValueError):
        dot_sql("a", "b", 0)
