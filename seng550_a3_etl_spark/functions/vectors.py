"""Vector column expressions for embedding similarity (north-star
extension). Dot products / norms / cosine via zip_with + aggregate —
JVM-side, no UDF; elements are cast to double *before* multiplying so the
DuckDB oracle (which does the same) produces bit-identical sums.

At 100 TB the same expressions run unchanged; the scale lever is the
join strategy around them (see operators/similarity.py), not the
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two float arrays as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
