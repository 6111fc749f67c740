"""Data-quality validation (expectations-style rule checking).

The reference's only correctness machinery is post-load row-count
verification (/root/reference/etl.py:214-218) and empty-result dashboard
guards (viz.py:125-131). A 100 TB curation pipeline needs declarative
checks that run as ONE scan regardless of rule count: every rule becomes
a conditional aggregate over the same pass, so adding a rule adds a
per-row predicate, not a job.

NULL semantics: a rule *passes* only where its predicate is definitively
TRUE; FALSE and NULL both count as violations (a null `price > 0` is a
bad row, not a pass) — via ``coalesce(pred, false)``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate named boolean rules over ``df`` in a single scan.

    Returns a long-format report ``(check_name, n_violations, n_rows)``
    with one row per rule.

    Scale: all rules fold into one partial+final aggregate — the scan is
    shared, the shuffle carries a single wide row, and the long-format
    pivot (``explode`` of a Column-literal map) runs on that one row.
    Rule count N costs N per-row predicate evaluations, zero extra jobs.
    """
    if not rules:
        raise ValueError("check_rules needs at least one rule")
    aggs = [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{i}")
        for i, pred in enumerate(rules.values())
    ]
    wide = df.agg(*aggs, F.count(F.lit(1)).alias("__n"))
    # Long-format pivot via explode(map(...)) built from Column literals —
    # rule names never pass through a SQL parser, so a name containing
    # quotes (or anything else) cannot break or alter the expression (the
    # f-string-interpolation hazard catalog.py documents for DDL).
    name_to_count = F.create_map(
        *[
            c
            for i, name in enumerate(rules)
            for c in (F.lit(name), F.col(f"__v_{i}"))
        ]
    )
    return wide.select(
        F.explode(name_to_count).alias("check_name", "n_violations"),
        F.col("__n").alias("n_rows"),
    )


def fk_violations(
    child: DataFrame, parent: DataFrame, on: Sequence[tuple[str, str]]
) -> DataFrame:
    """Rows of ``child`` whose key has no match in ``parent``
    (referential-integrity orphans), via LEFT ANTI join.

    ``on`` is a list of (child_col, parent_col) pairs. NULL child keys
    are orphans (they reference nothing), so the join condition is
    null-rejecting and a null key never matches.

    Scale: anti join broadcasts when the parent's key projection is
    small; otherwise it's one shuffle on the key with early row
    elimination (no payload columns from the parent ever move).
    """
    cond = None
    for c_col, p_col in on:
        clause = child[c_col] == parent[p_col]
        cond = clause if cond is None else (cond & clause)
    return child.join(parent, cond, "left_anti")
