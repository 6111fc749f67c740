"""Unit tests for distributed global ranking, sorted-neighborhood
pairs, and the Z-order span guarantee (round-5 scale operators)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from seng550_a3_etl_spark.operators.ranking import (
    global_row_number,
    sorted_neighborhood_pairs,
)


def test_global_row_number_matches_order(spark):
    random.seed(3)
    vals = random.sample(range(100_000), 5_000)
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(16)
    got = {
        r.v: r.rank
        for r in global_row_number(df, ["v"], out="rank").collect()
    }
    for want_rank, v in enumerate(sorted(vals), start=1):
        assert got[v] == want_rank


def test_global_row_number_no_single_partition_window(spark):
    """The plan must NOT contain a single-partition window — the whole
    point is ranking in parallel after a range exchange."""
    df = spark.range(1000).select(F.col("id").alias("v"))
    plan = global_row_number(df, ["v"])._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_sorted_neighborhood_pairs_brute_force(spark):
    random.seed(5)
    rows = [(i, f"k{random.randrange(300):03d}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, key string").repartition(8)
    got = {
        (r.id_a, r.id_b, r.gap)
        for r in sorted_neighborhood_pairs(
            df, ["key", "id"], "id", window=4
        ).collect()
    }
    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {
        (ranked[i][0], ranked[j][0], j - i)
        for i in range(len(ranked))
        for j in range(i + 1, min(i + 5, len(ranked)))
    }
    assert got == want


def test_zorder_tile_bounds_hold(spark):
    """Every 256-wide Z-run covers at most a 16x16 quantized cell —
    the file-skipping guarantee the layout exists for."""
    from seng550_a3_etl_spark.suite import QUERIES
    from tests.conftest import SF_ORACLE

    rows = QUERIES["zorder_tile_stats"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.xq_max - r.xq_min <= 15
        assert r.yq_max - r.yq_min <= 15
        # tile id is consistent with its members' cell
        assert r.xq_min >> 4 == r.xq_max >> 4
        assert r.yq_min >> 4 == r.yq_max >> 4


def test_observe_metrics_single_pass(spark):
    """df.observe attaches accumulator-style metrics to an existing
    action — the 100 TB monitoring pattern: row counts and invariant
    checks ride along with the job instead of costing a second scan.
    Spark's Observation helper blocks until the action's metrics
    arrive."""
    from pyspark.sql import Observation

    from seng550_a3_etl_spark.suite import QUERIES
    from tests.conftest import SF_ORACLE

    df = QUERIES["nation_order_counts"](spark, SF_ORACLE)
    obs = Observation("gate")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("order_count") < 0, 1).otherwise(0)).alias(
            "n_negative"
        ),
    )
    rows = observed.collect()
    assert obs.get["n_rows"] == len(rows) == 25
    assert obs.get["n_negative"] == 0
