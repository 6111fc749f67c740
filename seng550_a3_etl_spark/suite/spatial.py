"""Spatial suite queries (SURVEY.md §2.3 J1/J2, §2.7 F1-F4/F7).

The fixture tables have no geometry, so geometry is *derived
deterministically* from keys: districts are 10×10 rectangles tiling
[0,50)² (one per nation, via its nationkey), points come from customer
keys with a +0.005 offset that keeps them off every cell boundary.

The Spark side exercises the real machinery — WKT strings → HOF parser →
ray-casting containment → grid-cell prefilter join — while the DuckDB
oracle verifies the same result with plain bounding-box arithmetic
(valid because the districts are rectangles). Containment parity is a
*stronger* check than it looks: the general even-odd test must agree
with the half-open box on every one of the thousands of derived points.

Point derivation (identical expression tree in both engines, so the
IEEE doubles are bit-equal):
    px = ((c_custkey * 7919) % 5000) / 100.0 + 0.005
    py = ((c_custkey * 104729) % 5000) / 100.0 + 0.005
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seng550_a3_etl_spark.catalog import load_tables
from seng550_a3_etl_spark.functions.geo import (
    haversine_m,
    parse_wkt_multipolygon,
    parse_wkt_point,
    wkt_point,
)
from seng550_a3_etl_spark.operators.spatial import (
    dwithin_join,
    points_in_polygons_join,
)
from seng550_a3_etl_spark.suite.registry import query

# --- deterministic fixture geometry -------------------------------------

_ORACLE_POINTS = """
      SELECT c_custkey,
             ((c_custkey * 7919) % 5000) / 100.0 + 0.005 AS px,
             ((c_custkey * 104729) % 5000) / 100.0 + 0.005 AS py
      FROM customer
"""

_ORACLE_DISTRICTS = """
      SELECT n_name,
             (n_nationkey % 5) * 10.0 AS x0,
             (n_nationkey // 5) * 10.0 AS y0
      FROM nation
"""


def customer_points(t) -> DataFrame:
    """Deterministic point per customer, never on a cell boundary."""
    k = F.col("c_custkey")
    return t.customer.select(
        "c_custkey",
        (((k * 7919) % 5000) / 100.0 + 0.005).alias("px"),
        (((k * 104729) % 5000) / 100.0 + 0.005).alias("py"),
    )


def district_rects(t, gap_modulo: int | None = None) -> DataFrame:
    """One 10×10 district rectangle per nation as *WKT text*, then parsed
    through the engine's WKT parser — so the suite covers F3/F7, not just
    the containment test. ``gap_modulo`` drops some districts to create
    uncovered territory (exercises the NULL-district LEFT-join case,
    /root/reference/queries.py:58-59)."""
    n = t.nation
    if gap_modulo:
        n = n.filter(F.col("n_nationkey") % gap_modulo != 0)
    x0 = (F.col("n_nationkey") % 5) * 10.0
    y0 = F.floor(F.col("n_nationkey") / 5) * 10.0
    wkt = F.format_string(
        "MULTIPOLYGON(((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f)))",
        x0, y0, x0 + 10.0, y0, x0 + 10.0, y0 + 10.0, x0, y0 + 10.0, x0, y0,
    )
    return n.select(
        "n_name", parse_wkt_multipolygon(wkt).alias("polys")
    )


# --- queries -------------------------------------------------------------


@query(
    "district_point_counts",
    oracle=f"""
    WITH d AS ({_ORACLE_DISTRICTS}),
         p AS ({_ORACLE_POINTS})
    SELECT d.n_name, COUNT(p.c_custkey) AS point_count
    FROM d LEFT JOIN p
      ON p.px >= d.x0 AND p.px < d.x0 + 10
     AND p.py >= d.y0 AND p.py < d.y0 + 10
    GROUP BY d.n_name
    """,
)
def district_point_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+A1: polygon-preserving point counts (accidents per district,
    /root/reference/queries.py:69-77) through the grid-prefilter spatial
    join. cell_size=7 ≠ the 10-unit district grid, so polygons genuinely
    explode to multiple cells."""
    t = load_tables(spark, sf_dir)
    districts = district_rects(t)
    matched = points_in_polygons_join(
        customer_points(t), districts, "px", "py", "polys",
        how="inner", cell_size=7.0,
    )
    counts = matched.groupBy("n_name").agg(
        F.count("c_custkey").alias("point_count")
    )
    return (
        districts.select("n_name")
        .join(counts, "n_name", "left")
        .select(
            "n_name", F.coalesce("point_count", F.lit(0)).alias("point_count")
        )
    )


@query(
    "point_district_assignment",
    oracle=f"""
    WITH d AS (
      SELECT n_name,
             (n_nationkey % 5) * 10.0 AS x0,
             (n_nationkey // 5) * 10.0 AS y0
      FROM nation WHERE n_nationkey % 7 != 0
    ),
         p AS ({_ORACLE_POINTS})
    SELECT p.c_custkey, d.n_name
    FROM p LEFT JOIN d
      ON p.px >= d.x0 AND p.px < d.x0 + 10
     AND p.py >= d.y0 AND p.py < d.y0 + 10
    """,
)
def point_district_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: LEFT from points — each point gets its containing district or
    NULL (districts with nationkey % 7 == 0 are removed, leaving holes in
    the tiling). Broadcast theta-join path (polygon side is tiny)."""
    t = load_tables(spark, sf_dir)
    districts = district_rects(t, gap_modulo=7)
    return points_in_polygons_join(
        customer_points(t), districts, "px", "py", "polys",
        how="left", point_key="c_custkey",
    ).select("c_custkey", "n_name")


@query(
    "wkt_point_roundtrip",
    oracle=f"""
    WITH p AS ({_ORACLE_POINTS})
    SELECT c_custkey,
           CAST(printf('%.4f', px) AS DOUBLE) AS x_out,
           CAST(printf('%.4f', py) AS DOUBLE) AS y_out
    FROM p
    """,
)
def wkt_point_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7+F3+F2: format each point as WKT text at 4 decimals, parse it
    back, extract coordinates (geojson→WKT→geometry→ST_X/ST_Y chain,
    /root/reference/etl.py:108-130,269-270)."""
    t = load_tables(spark, sf_dir)
    pts = customer_points(t)
    parsed = parse_wkt_point(
        wkt_point(F.col("px"), F.col("py"), decimals=4)
    ).alias("p")
    return pts.select("c_custkey", parsed).select(
        "c_custkey",
        F.col("p.x").alias("x_out"),
        F.col("p.y").alias("y_out"),
    )


@query(
    "incident_facts_pipeline",
    oracle=f"""
    WITH p AS ({_ORACLE_POINTS}),
    d AS (
      SELECT n_name,
             (n_nationkey % 5) * 10.0 AS x0,
             (n_nationkey // 5) * 10.0 AS y0
      FROM nation WHERE n_nationkey % 7 != 0
    ),
    located AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS od, p.px, p.py
      FROM orders o JOIN p ON p.c_custkey = o.o_custkey
    ),
    w AS (
      SELECT CAST(l_shipdate AS DATE) AS dt,
             ROUND(SUM(l_quantity), 2) AS day_qty
      FROM lineitem GROUP BY 1
    ),
    assigned AS (
      SELECT l.o_orderkey, l.od, d.n_name
      FROM located l LEFT JOIN d
        ON l.px >= d.x0 AND l.px < d.x0 + 10
       AND l.py >= d.y0 AND l.py < d.y0 + 10
    )
    SELECT a.o_orderkey, a.n_name,
           strftime(a.od, '%Y-%m-%d') AS order_date,
           COALESCE(w.day_qty, 0.0) AS day_qty
    FROM assigned a LEFT JOIN w ON w.dt = a.od
    """,
)
def incident_facts_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2E gold pipeline (the accident_facts build, /root/reference/
    queries.py:120-150 via plans/gold.build_facts): orders act as
    incidents located at their customer's point; spatial LEFT assign to
    gap-tiled districts; temporal LEFT join to a per-day dimension."""
    from seng550_a3_etl_spark.plans.gold import build_facts

    t = load_tables(spark, sf_dir)
    incidents = (
        t.orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .join(customer_points(t), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "px", "py")
    )
    weather = t.lineitem.groupBy(
        F.col("l_shipdate").cast("date").alias("date")
    ).agg(F.round(F.sum("l_quantity"), 2).alias("day_qty"))
    facts = build_facts(
        incidents,
        district_rects(t, gap_modulo=7),
        weather,
        incident_key="o_orderkey",
        x="px",
        y="py",
        ts="o_orderdate",
    )
    return facts.select(
        "o_orderkey",
        "n_name",
        F.date_format("incident_date", "yyyy-MM-dd").alias("order_date"),
        F.coalesce("day_qty", F.lit(0.0)).alias("day_qty"),
    )


_HAVERSINE_SQL = """
    2 * 6371000.0 * asin(sqrt(
      sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)
      + cos(radians({lat1})) * cos(radians({lat2}))
        * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)
    ))
"""


@query(
    "supplier_customer_dwithin",
    oracle=f"""
    WITH s AS (
      SELECT s_suppkey,
             -114.3 + ((s_suppkey * 13) % 400) / 1000.0 AS slon,
             50.8 + ((s_suppkey * 17) % 300) / 1000.0 AS slat
      FROM supplier
    ),
    c AS (
      SELECT c_custkey,
             -114.3 + ((c_custkey * 7) % 400) / 1000.0 AS clon,
             50.8 + ((c_custkey * 11) % 300) / 1000.0 AS clat
      FROM customer
    )
    SELECT s_suppkey, c_custkey,
           ROUND({_HAVERSINE_SQL.format(lon1="slon", lat1="slat",
                                        lon2="clon", lat2="clat")}, 3)
           AS dist_m
    FROM s, c
    WHERE {_HAVERSINE_SQL.format(lon1="slon", lat1="slat",
                                 lon2="clon", lat2="clat")} <= 2000.0
    """,
)
def supplier_customer_dwithin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/J6-distance: all (supplier, customer) pairs within 2 km
    (ST_DWithin, /root/reference/queries.py:182-186) via the grid
    prefilter join — the oracle cross-joins, the engine never does."""
    t = load_tables(spark, sf_dir)
    sk, ck = F.col("s_suppkey"), F.col("c_custkey")
    suppliers = t.supplier.select(
        "s_suppkey",
        (-114.3 + ((sk * 13) % 400) / 1000.0).alias("slon"),
        (50.8 + ((sk * 17) % 300) / 1000.0).alias("slat"),
    )
    customers = t.customer.select(
        "c_custkey",
        (-114.3 + ((ck * 7) % 400) / 1000.0).alias("clon"),
        (50.8 + ((ck * 11) % 300) / 1000.0).alias("clat"),
    )
    # 2 km ≈ 0.0181° lat, ≈ 0.0285° lon at 51°N → 0.03° is conservative.
    pairs = dwithin_join(
        suppliers, customers, radius_m=2000.0, cell_deg=0.03,
        left_lon="slon", left_lat="slat",
        right_lon="clon", right_lat="clat",
    )
    return pairs.select(
        "s_suppkey", "c_custkey", F.round("dist_m", 3).alias("dist_m")
    )


@query(
    "nearest_supplier_per_customer",
    oracle=f"""
    WITH s AS (
      SELECT s_suppkey,
             -114.3 + ((s_suppkey * 13) % 400) / 1000.0 AS slon,
             50.8 + ((s_suppkey * 17) % 300) / 1000.0 AS slat
      FROM supplier
    ),
    c AS (
      SELECT c_custkey,
             -114.3 + ((c_custkey * 7) % 400) / 1000.0 AS clon,
             50.8 + ((c_custkey * 11) % 300) / 1000.0 AS clat
      FROM customer
    ),
    pairs AS (
      SELECT c_custkey, s_suppkey,
             ROUND({_HAVERSINE_SQL.format(lon1="slon", lat1="slat",
                                          lon2="clon", lat2="clat")}, 3)
             AS dist_m
      FROM s, c
      WHERE {_HAVERSINE_SQL.format(lon1="slon", lat1="slat",
                                   lon2="clon", lat2="clat")} <= 2000.0
    )
    SELECT c_custkey, s_suppkey, dist_m FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_custkey ORDER BY dist_m, s_suppkey
      ) AS rn
      FROM pairs
    ) WHERE rn = 1
    """,
)
def nearest_supplier_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 completed end-to-end: the reference's dead lateral join
    (/root/reference/queries.py:164-191 — per row, top-1 neighbor within
    a radius) as grid-prefiltered dwithin pairs + a per-customer top-1
    window — the Spark shape that replaces LATERAL ... ORDER BY LIMIT 1
    without exploding unpruned candidate pairs."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    sk, ck = F.col("s_suppkey"), F.col("c_custkey")
    suppliers = t.supplier.select(
        "s_suppkey",
        (-114.3 + ((sk * 13) % 400) / 1000.0).alias("slon"),
        (50.8 + ((sk * 17) % 300) / 1000.0).alias("slat"),
    )
    customers = t.customer.select(
        "c_custkey",
        (-114.3 + ((ck * 7) % 400) / 1000.0).alias("clon"),
        (50.8 + ((ck * 11) % 300) / 1000.0).alias("clat"),
    )
    pairs = dwithin_join(
        suppliers, customers, radius_m=2000.0, cell_deg=0.03,
        left_lon="slon", left_lat="slat",
        right_lon="clon", right_lat="clat",
    ).select("c_custkey", "s_suppkey", F.round("dist_m", 3).alias("dist_m"))
    w = Window.partitionBy("c_custkey").orderBy("dist_m", "s_suppkey")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- Z-order layout ------------------------------------------------------

_Z_BITS = 10


def _z_spark(xq: str, yq: str, bits: int = _Z_BITS) -> str:
    """Spark SQL bit-interleave of two ``bits``-wide ints (Morton code)."""
    terms = [
        f"shiftleft(shiftright({xq}, {i}) & 1, {2 * i})" for i in range(bits)
    ] + [
        f"shiftleft(shiftright({yq}, {i}) & 1, {2 * i + 1})"
        for i in range(bits)
    ]
    return " + ".join(terms)


def _z_duck(xq: str, yq: str, bits: int = _Z_BITS) -> str:
    """The DuckDB SQL computing exactly :func:`_z_spark`."""
    terms = [
        f"((({xq} >> {i}) & 1) << {2 * i})" for i in range(bits)
    ] + [
        f"((({yq} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)
    ]
    return " + ".join(terms)


_QUANT = "CAST(least(floor(({c} * 1024.0) / 50.0), 1023.0) AS INT)"


@query(
    "zorder_tile_stats",
    oracle=f"""
    WITH p AS ({_ORACLE_POINTS}),
    q AS (
      SELECT c_custkey,
             {_QUANT.format(c="px")} AS xq,
             {_QUANT.format(c="py")} AS yq
      FROM p
    ),
    z AS (SELECT xq, yq, {_z_duck("xq", "yq")} AS zval FROM q)
    SELECT CAST(zval >> 8 AS INT) AS tile,
           COUNT(*) AS n_points,
           MIN(xq) AS xq_min, MAX(xq) AS xq_max,
           MIN(yq) AS yq_min, MAX(yq) AS yq_max
    FROM z GROUP BY tile
    """,
)
def zorder_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout census (X107): customer points quantize
    to a 1024x1024 grid, bit-interleave into a Z-value, and roll up per
    256-wide Z-run ("tile" = zval >> 8, a 16x16 cell). The per-tile
    xq/yq min-max bounds ARE the data-skipping guarantee: a file
    written as a contiguous Z-run covers a bounded rectangle, so
    parquet column min/max stats prune 2-D range predicates — the
    multi-dimensional clustering trick (Delta/Iceberg Z-ORDER) that
    one-column sort layouts cannot provide.

    Scale: Z-assignment is scan-stage integer bit math (20 codegen'd
    shift-mask terms, no UDF); the rollup is one map-side-combined
    aggregate to at most 4096 tiles. The physical layout step at 100 TB
    is repartitionByRange(zval) + sortWithinPartitions before the
    write — same machinery as operators/ranking.global_row_number; the
    span bound (xq/yq width <= 15 per tile, asserted in tests) holds by
    construction of the curve, skew-independent."""
    t = load_tables(spark, sf_dir)
    q = customer_points(t).selectExpr(
        "c_custkey",
        _QUANT.format(c="px") + " AS xq",
        _QUANT.format(c="py") + " AS yq",
    )
    z = q.selectExpr("xq", "yq", f"{_z_spark('xq', 'yq')} AS zval")
    return (
        z.groupBy(
            F.expr("CAST(shiftright(zval, 8) AS INT)").alias("tile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("xq").alias("xq_min"),
            F.max("xq").alias("xq_max"),
            F.min("yq").alias("yq_min"),
            F.max("yq").alias("yq_max"),
        )
    )
