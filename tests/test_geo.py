"""Unit fixtures for the spatial layer (SURVEY.md §5.3, §7 hard-part 1):
point-in-polygon with holes / multi-part polygons / outside points, WKT
multipolygon parse/format round-trip, haversine sanity, grid cells."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.geo import (
    covered_cells,
    format_wkt_multipolygon,
    haversine_m,
    multipolygon_contains,
    parse_wkt_multipolygon,
    parse_wkt_point,
    wkt_point,
)

# Square with a square hole, plus a second disjoint square part:
# outer [0,10]², hole [4,6]², island [20,30]×[0,10]
WKT_COMPLEX = (
    "MULTIPOLYGON(((0 0, 10 0, 10 10, 0 10, 0 0), "
    "(4 4, 6 4, 6 6, 4 6, 4 4)), "
    "((20 0, 30 0, 30 10, 20 10, 20 0)))"
)

CASES = [
    (2.0, 2.0, True),  # inside outer ring
    (5.0, 5.0, False),  # inside the hole
    (4.5, 2.0, True),  # below the hole, still inside
    (25.0, 5.0, True),  # inside the island part
    (15.0, 5.0, False),  # between the parts
    (-1.0, 5.0, False),  # left of everything
    (5.0, 11.0, False),  # above
    (9.999, 9.999, True),  # near corner, inside
]


@pytest.fixture(scope="module")
def geo_df(spark):
    rows = [(x, y, exp) for x, y, exp in CASES]
    df = spark.createDataFrame(rows, "x double, y double, expected boolean")
    return df.withColumn("wkt", F.lit(WKT_COMPLEX))


def test_point_in_polygon_cases(geo_df):
    out = geo_df.withColumn(
        "got",
        multipolygon_contains(
            parse_wkt_multipolygon(F.col("wkt")), F.col("x"), F.col("y")
        ),
    ).collect()
    for r in out:
        assert r.got == r.expected, f"({r.x},{r.y}): got {r.got}"


def test_wkt_multipolygon_roundtrip(spark):
    df = spark.createDataFrame([(WKT_COMPLEX,)], "wkt string")
    parsed = parse_wkt_multipolygon(F.col("wkt"))
    rt = df.select(format_wkt_multipolygon(parsed, decimals=0).alias("out"))
    got = rt.collect()[0].out
    assert got == WKT_COMPLEX


def test_parsed_shape(spark):
    df = spark.createDataFrame([(WKT_COMPLEX,)], "wkt string")
    arr = df.select(parse_wkt_multipolygon(F.col("wkt")).alias("p")).collect()[0].p
    assert len(arr) == 2  # two polygons
    assert len(arr[0]) == 2  # outer + hole
    assert len(arr[1]) == 1  # island: single ring
    assert arr[0][0][0] == [0.0, 0.0]
    assert arr[0][1][2] == [6.0, 6.0]


def test_wkt_point_roundtrip(spark):
    df = spark.createDataFrame([(-114.0708, 51.0486)], "lon double, lat double")
    out = df.select(
        parse_wkt_point(wkt_point(F.col("lon"), F.col("lat"))).alias("p")
    ).collect()[0].p
    assert out.x == pytest.approx(-114.0708)
    assert out.y == pytest.approx(51.0486)


def test_haversine_known_distance(spark):
    # Calgary Tower → Saddledome ≈ 1.25 km (rough landmark check)
    df = spark.createDataFrame(
        [(-114.0630, 51.0443, -114.0519, 51.0374)],
        "lon1 double, lat1 double, lon2 double, lat2 double",
    )
    d = df.select(
        haversine_m(
            F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
        ).alias("d")
    ).collect()[0].d
    assert 1000 < d < 1500


def test_covered_cells(spark):
    df = spark.createDataFrame([(WKT_COMPLEX,)], "wkt string")
    cells = df.select(
        covered_cells(parse_wkt_multipolygon(F.col("wkt")), 7.0).alias("c")
    ).collect()[0].c
    # bbox is [0,30]×[0,10] → x cells 0..4, y cells 0..1 → 10 cells
    assert sorted(cells) == sorted(
        f"{cx}_{cy}" for cx in range(5) for cy in range(2)
    )


def test_points_in_polygons_join_modes(spark):
    from seng550_a3_etl_spark.operators.spatial import points_in_polygons_join

    polys = spark.createDataFrame(
        [("complex", WKT_COMPLEX)], "name string, wkt string"
    ).select("name", parse_wkt_multipolygon(F.col("wkt")).alias("polys"))
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y, _) in enumerate(CASES)],
        "pid int, x double, y double",
    )
    expected_in = {i for i, (_, _, exp) in enumerate(CASES) if exp}

    for cell_size in (None, 7.0):
        inner = points_in_polygons_join(
            pts, polys, "x", "y", "polys", how="inner", cell_size=cell_size
        )
        assert {r.pid for r in inner.collect()} == expected_in

        left = points_in_polygons_join(
            pts, polys, "x", "y", "polys",
            how="left", cell_size=cell_size, point_key="pid",
        )
        got = {r.pid: r.name for r in left.collect()}
        assert set(got) == set(range(len(CASES)))
        for i in range(len(CASES)):
            assert got[i] == ("complex" if i in expected_in else None)
