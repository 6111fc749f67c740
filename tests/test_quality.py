"""Unit tests for the data-quality operators (operators/quality.py) —
NULL-as-violation semantics and FK orphan detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seng550_a3_etl_spark.operators.quality import check_rules, fk_violations


def test_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1.0,), (-1.0,), (None,)], "price double"
    )
    out = check_rules(df, {"price_positive": F.col("price") > 0}).collect()
    assert len(out) == 1
    row = out[0]
    assert row["check_name"] == "price_positive"
    assert row["n_violations"] == 2  # -1.0 fails, NULL is not a pass
    assert row["n_rows"] == 3


def test_multiple_rules_share_one_pass(spark):
    df = spark.createDataFrame(
        [(5, "a"), (15, "b"), (25, "zz")], "x int, s string"
    )
    report = check_rules(
        df,
        {
            "x_small": F.col("x") < 20,
            "s_in_domain": F.col("s").isin("a", "b"),
            "never_fails": F.lit(True),
        },
    )
    got = {r["check_name"]: r["n_violations"] for r in report.collect()}
    assert got == {"x_small": 1, "s_in_domain": 1, "never_fails": 0}
    # one scan: the report plan contains exactly one scan of the input
    # (after collect, AQE's toString prints Final + Initial plans — look
    # at the final section only)
    plan = report._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1


def test_rule_names_are_not_parsed(spark):
    """Rule names carrying quotes/SQL must pass through verbatim — the
    long-format pivot is built from Column literals, never interpolated
    into a SQL string."""
    df = spark.createDataFrame([(1,), (None,)], "x int")
    hostile = "price 'USD' > 0; DROP TABLE t--"
    report = check_rules(df, {hostile: F.col("x") > 0}).collect()
    assert len(report) == 1
    assert report[0]["check_name"] == hostile
    assert report[0]["n_violations"] == 1


def test_empty_rules_rejected(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        check_rules(df, {})


def test_fk_violations_include_null_keys(spark):
    child = spark.createDataFrame(
        [(1, "ok"), (2, "orphan"), (None, "nullkey")], "k int, tag string"
    )
    parent = spark.createDataFrame([(1,)], "k int")
    orphans = fk_violations(child, parent, on=[("k", "k")])
    tags = sorted(r["tag"] for r in orphans.collect())
    assert tags == ["nullkey", "orphan"]


def test_fk_violations_composite_key(spark):
    child = spark.createDataFrame(
        [(1, 10, "ok"), (1, 11, "orphan")], "a int, b int, tag string"
    )
    parent = spark.createDataFrame([(1, 10)], "a int, b int")
    orphans = fk_violations(child, parent, on=[("a", "a"), ("b", "b")])
    assert [r["tag"] for r in orphans.collect()] == ["orphan"]
