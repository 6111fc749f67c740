"""Vector column expressions for embedding similarity (north-star
extension). Dot products / norms / cosine via zip_with + aggregate —
JVM-side, no UDF; elements are cast to double *before* multiplying so the
DuckDB oracle (which does the same) produces bit-identical sums.

Two execution forms with ONE arithmetic contract (r15 optimization):

- ``dim=None`` (default): zip_with + aggregate fold. Higher-order
  functions are CodegenFallback in Catalyst — every element pays an
  interpreted lambda dispatch and zip_with materializes an intermediate
  array per pair — but the form works for any runtime length and stays
  compact inside lambda bodies and iterated lineages.
- ``dim=K`` (statically known length, e.g. the 64-dim embeddings
  fixture): the same sum unrolled into a flat ``a[0]*b[0] + … +
  a[K-1]*b[K-1]`` chain, which whole-stage-codegen compiles — measured
  ~2.2x on the brute-force cosine top-k path (guide §4.2: prefer
  codegen expressions over interpreted evaluation for per-row math).
  The chain is built as ONE ``F.expr`` SQL string, never per-term
  Column operations: 3·K Column calls per dot site cost hundreds of
  py4j round-trips at PLAN BUILD time and measurably regressed every
  caller (the _sign_bits_expr lesson from operators/similarity.py,
  re-measured this round) — so the unrolled form requires operands as
  SQL fragments (column names or literal weight lists), not Columns.

IEEE equivalence of the two forms: the fold computes
``((0.0 + p0) + p1) + …`` and the chain ``(p0 + p1) + …``; ``0.0 + p0``
is bitwise ``p0`` for every double except ``-0.0`` (whose sum is
``+0.0``), and a ``-0.0`` product can only survive the chain if EVERY
subsequent term is also ``-0.0`` — impossible for vectors with any
nonzero element, and an all-zero embedding has norm 0 and is already
outside every caller's domain (cosine would divide by zero). So for the
fixture domain the two forms are bit-identical, which
tests/test_vectors_dot.py pins on adversarial inputs including negative
zeros. Contract: ``dim`` MUST equal the true array length — shorter
arrays fail (ANSI out-of-bounds) where the fold would silently sum the
prefix; a LONGER array is silently truncated to its first ``dim``
elements (which is exactly the matryoshka prefix semantic — callers
scoring a prefix pass the prefix length instead of slicing).

WHERE NOT TO USE ``dim``: inside higher-order-function lambdas (the
enclosing HOF is interpreted anyway, and the 3·K-node tree is *slower*
to walk than the fold) and inside iterated lineages whose plans nest
per step (k-means/k-center loops — the unrolled trees compound into
minutes of analysis/codegen time; measured 2-5x END-TO-END regressions
when applied there). Those sites keep the fold on purpose — see
operators/similarity.assign_buckets.

At 100 TB the same expressions run unchanged; the scale lever is the
join strategy around them (see operators/similarity.py), not the
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _term_sql(col: str | list[float], i: int) -> str:
    """SQL fragment for element ``i`` of an operand: a column name (or
    any array-typed SQL expression) indexed 0-based, or a Python float
    list rendered as a double literal."""
    if isinstance(col, list):
        return f"{float(col[i])!r}D"
    return f"CAST({col}[{i}] AS DOUBLE)"


def dot_sql(a: str | list[float], b: str | list[float], dim: int) -> str:
    """The unrolled dot product as one SQL string (see module docstring
    for the bit-identical-IEEE contract)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    return " + ".join(
        f"({_term_sql(a, i)} * {_term_sql(b, i)})" for i in range(dim)
    )


def dot(
    a: Column | str | list[float],
    b: Column | str | list[float],
    dim: int | None = None,
) -> Column:
    """Sequential-order dot product of two float arrays as double.

    ``dim``: statically known array length → codegen-able unrolled
    chain built as ONE ``F.expr`` (operands must then be SQL fragments:
    column names, array-typed SQL expressions, or float lists). Without
    ``dim``: the HOF fold (operands may be Columns or names).
    """
    if dim is not None:
        if isinstance(a, Column) or isinstance(b, Column):
            raise TypeError(
                "dot(dim=...) needs SQL-fragment operands (column name, "
                "array SQL expression, or float list), not Columns — "
                "per-term Column construction pays hundreds of py4j "
                "round-trips at plan build (see module docstring)"
            )
        return F.expr(dot_sql(a, b, dim))
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))
