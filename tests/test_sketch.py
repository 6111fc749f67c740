"""KMV sketch tests: exactness below k, two-level == single-pass
semilattice property under repartitioning, error bounds above k, and
parity with the DuckDB replay of the estimate."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.hashing import duck_hash64
from seng550_a3_etl_spark.operators.sketch import (
    duck_kmv_estimate,
    kmv_distinct,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "grp string, v string")


def test_exact_below_k(spark):
    rows = [("a", f"u{i}") for i in range(10) for _ in range(3)] + [
        ("b", "solo")
    ]
    got = {
        r.grp: r.est_distinct
        for r in kmv_distinct(_mk(spark, rows), ["grp"], F.col("v"), k=64)
        .collect()
    }
    assert got == {"a": 10.0, "b": 1.0}


def test_partitioning_invariance(spark):
    rows = [("g", f"user-{i}") for i in range(500)]
    df = _mk(spark, rows)
    ests = {
        kmv_distinct(df.repartition(n), ["grp"], F.col("v"), k=16)
        .collect()[0]
        .est_distinct
        for n in (1, 3, 17)
    }
    assert len(ests) == 1  # min-k merge is partitioning-invariant


@pytest.mark.parametrize("n_true", [200, 1000])
def test_error_bound_above_k(spark, n_true):
    k = 64
    rows = [("g", f"item:{i}") for i in range(n_true)]
    est = (
        kmv_distinct(_mk(spark, rows), ["grp"], F.col("v"), k=k)
        .collect()[0]
        .est_distinct
    )
    # ~1/sqrt(k-2) relative error; allow 4 sigma
    assert abs(est - n_true) / n_true < 4 / (k - 2) ** 0.5


def test_estimate_matches_duckdb_replay(spark):
    k = 8
    rows = [("x", f"val{i}") for i in range(50)] + [
        ("y", f"val{i}") for i in range(5)
    ]
    got = {
        r.grp: r.est_distinct
        for r in kmv_distinct(_mk(spark, rows), ["grp"], F.col("v"), k=k)
        .collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"('{g}', '{v}')" for g, v in rows)
    want = {
        g: e
        for g, e in con.sql(
            f"""
            WITH t(grp, v) AS (VALUES {vals}),
            hashed AS (SELECT DISTINCT grp, {duck_hash64("v")} AS h FROM t),
            minima AS (SELECT grp, list_sort(list(h))[1:{k}] AS hs
                       FROM hashed GROUP BY grp)
            SELECT grp, {duck_kmv_estimate("hs", k)} FROM minima
            """
        ).fetchall()
    }
    assert got == want  # bit-identical doubles, not approximately equal


def test_kmv_setops_degenerates_to_exact_below_k(spark):
    from seng550_a3_etl_spark.operators.sketch import kmv_setops

    a = spark.createDataFrame([(i,) for i in range(10)], "x long")
    b = spark.createDataFrame([(i,) for i in range(5, 15)], "y long")
    row = kmv_setops(a, b, "x", "y", k=64).collect()[0]
    # union 15 < k: sketch holds every key, estimates are exact
    assert row.est_union == 15.0
    assert row.est_inter == 5.0


def test_kmv_setops_disjoint_and_identical(spark):
    from seng550_a3_etl_spark.operators.sketch import kmv_setops

    a = spark.createDataFrame([(i,) for i in range(8)], "x long")
    b = spark.createDataFrame([(i,) for i in range(100, 108)], "y long")
    row = kmv_setops(a, b, "x", "y", k=32).collect()[0]
    assert row.est_union == 16.0 and row.est_inter == 0.0
    same = kmv_setops(a, a, "x", "x", k=32).collect()[0]
    assert same.est_union == 8.0 and same.est_inter == 8.0


# HLL (X139) ---------------------------------------------------------------


def test_hll_error_bound(spark):
    from seng550_a3_etl_spark.operators.sketch import hll_distinct

    n_true = 2000
    rows = [("g", f"user-{i}") for i in range(n_true)]
    row = hll_distinct(_mk(spark, rows), ["grp"], F.col("v")).collect()[0]
    # raw HLL relative error ~1.04/sqrt(m); allow 4 sigma at m=64
    assert abs(row.est_distinct - n_true) / n_true < 4 * 1.04 / 8


def test_hll_partitioning_invariance(spark):
    from seng550_a3_etl_spark.operators.sketch import hll_distinct

    rows = [("g", f"user-{i}") for i in range(800)]
    df = _mk(spark, rows)
    outs = {
        tuple(
            hll_distinct(df.repartition(n), ["grp"], F.col("v"))
            .collect()[0]
        )
        for n in (1, 3, 17)
    }
    assert len(outs) == 1  # max-merged registers are layout-invariant


def test_hll_duplicates_do_not_move_registers(spark):
    from seng550_a3_etl_spark.operators.sketch import hll_distinct

    base = [("g", f"u{i}") for i in range(300)]
    once = hll_distinct(_mk(spark, base), ["grp"], F.col("v")).collect()[0]
    thrice = hll_distinct(
        _mk(spark, base * 3), ["grp"], F.col("v")
    ).collect()[0]
    assert tuple(once) == tuple(thrice)


def test_hll_matches_duckdb_replay(spark):
    import duckdb

    from seng550_a3_etl_spark.operators.sketch import (
        duck_hll_estimate,
        hll_distinct,
    )

    rows = [("x", f"val{i}") for i in range(150)] + [
        ("y", f"val{i}") for i in range(7)
    ]
    got = {
        r.grp: (r.n_zero_regs, r.reg_sum, r.est_distinct)
        for r in hll_distinct(_mk(spark, rows), ["grp"], F.col("v"))
        .collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"('{g}', '{v}')" for g, v in rows)
    con.sql(f"CREATE VIEW t AS SELECT * FROM (VALUES {vals}) v(grp, v)")
    want = {
        g: (z, s, e)
        for g, z, s, e in con.sql(
            duck_hll_estimate("t", "grp", "v")
        ).fetchall()
    }
    assert got == want  # registers AND the one float division, bit-exact
