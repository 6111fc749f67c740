"""salted_join must equal the plain join — inner and left, hot keys,
unmatched rows on both sides — while spreading fact rows over salts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seng550_a3_etl_spark.operators.skew import salted_join


@pytest.fixture()
def frames(spark):
    # key 1 is hot (6 rows); key 3 unmatched in dim; dim key 9 unmatched
    fact = spark.createDataFrame(
        [(1, i) for i in range(6)] + [(2, 10), (3, 11)], "fk long, v long"
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "z")], "dk long, attr string"
    )
    return fact, dim


def _plain(fact, dim, how):
    return (
        fact.join(dim, fact["fk"] == dim["dk"], how)
        .select("fk", "v", "attr")
        .collect()
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_equals_plain(spark, frames, how):
    fact, dim = frames
    got = sorted(
        (r.fk, r.v, r.attr)
        for r in salted_join(
            fact, dim, ["fk"], ["dk"], n_salt=4, how=how
        ).collect()
    )
    want = sorted((r.fk, r.v, r.attr) for r in _plain(fact, dim, how))
    assert got == want


def test_hot_key_spreads_over_salts(spark):
    fact = spark.createDataFrame(
        [(1, i) for i in range(200)], "fk long, v long"
    ).repartition(8)
    dim = spark.createDataFrame([(1, "a")], "dk long, attr string")
    joined = salted_join(fact, dim, ["fk"], ["dk"], n_salt=8)
    assert joined.count() == 200
    # the salt must actually fan out (not collapse to one value)
    from seng550_a3_etl_spark.operators import skew

    salted = fact.withColumn(
        "s",
        F.pmod(
            F.xxhash64(
                "fk", F.spark_partition_id(), F.monotonically_increasing_id()
            ),
            F.lit(8),
        ),
    )
    assert salted.select("s").distinct().count() > 1


def test_rejects_unsupported_how(spark, frames):
    fact, dim = frames
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["fk"], ["dk"], how="right")
