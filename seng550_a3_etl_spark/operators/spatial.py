"""Spatial joins (SURVEY.md §2.3 J1/J2, §2.7 F1/F4).

The reference runs ``ti LEFT JOIN cb ON ST_Contains(cb.geometry,
ti.geometry)`` inside PostgreSQL with GIST indexes
(/root/reference/queries.py:58-59, /root/reference/etl.py:230-237).
Spark has no spatial index; the scale-correct equivalents are:

- **broadcast theta join** when the polygon side is small (it usually
  is: ~300 districts in the reference): broadcast polygons, evaluate the
  exact containment expression on each point — no shuffle of the point
  side at all.
- **grid-cell equi-join prefilter** when neither side broadcasts:
  polygons explode to the cells their bbox covers, points compute their
  single cell, an ordinary shuffle equi-join on the cell id pairs each
  point only with polygons whose bbox shares its cell, and the exact
  ray-casting test prunes false positives. A point lands in exactly one
  cell, so no post-join dedup is needed. This is the same idea as a
  quadtree/geohash partition join, with Catalyst handling the join
  physical strategy (AQE splits skewed cells).

Both paths evaluate the same JVM-side containment expression from
functions/geo.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seng550_a3_etl_spark.functions.geo import (
    covered_cells,
    grid_cell,
    haversine_m,
    multipolygon_contains,
    neighbor_cells,
)

_CELL = "__cell"


def points_in_polygons_join(
    points: DataFrame,
    polygons: DataFrame,
    x: str,
    y: str,
    polys_col: str,
    how: str = "inner",
    cell_size: float | None = None,
    point_key: str | None = None,
) -> DataFrame:
    """Join each point to the polygon(s) containing it.

    ``how='inner'`` keeps matched pairs (J1 shape after the NULL filter);
    ``how='left'`` keeps every point, null polygon payload when no
    polygon contains it (J1, queries.py:58-59); polygon-preserving
    counts (J2) are a groupBy over the inner join LEFT-joined back onto
    the polygon table — see the suite's district_point_counts.

    ``cell_size=None`` → broadcast theta join (small polygon side).
    ``cell_size=s`` → grid prefilter equi-join (big polygon side).
    ``how='left'`` on the grid path requires ``point_key``, a unique
    point id column (the broadcast path left-joins directly).
    """
    # Precompute each polygon's bbox once on the (small) polygon side;
    # the And below short-circuits, so the ray-casting HOF only runs for
    # pairs whose bbox already contains the point (~1 polygon per point
    # instead of all of them) — bbox compares are plain codegen doubles.
    poly_payload = [c for c in polygons.columns if c != polys_col]
    bbox = ["__minx", "__maxx", "__miny", "__maxy"]
    pts_flat = F.flatten(F.flatten(F.col(polys_col)))
    xs = F.transform(pts_flat, lambda p: F.element_at(p, 1))
    ys = F.transform(pts_flat, lambda p: F.element_at(p, 2))
    polygons = (
        polygons.withColumn("__minx", F.array_min(xs))
        .withColumn("__maxx", F.array_max(xs))
        .withColumn("__miny", F.array_min(ys))
        .withColumn("__maxy", F.array_max(ys))
    )
    in_bbox = (
        F.col(x).between(F.col("__minx"), F.col("__maxx"))
        & F.col(y).between(F.col("__miny"), F.col("__maxy"))
    )
    contains = lambda: in_bbox & multipolygon_contains(  # noqa: E731
        F.col(polys_col), F.col(x), F.col(y)
    )
    if cell_size is None:
        if how == "left":
            # Direct broadcast LEFT theta join (build right is supported
            # for left-outer): one pass over the points, no shuffle — the
            # crossJoin+filter route would need a second points scan and
            # an equi back-join on point_key just to restore unmatched
            # rows.
            return points.join(
                F.broadcast(polygons), contains(), "left"
            ).drop(polys_col, *bbox)
        matched = (
            points.crossJoin(F.broadcast(polygons))
            .filter(contains())
            .drop(*bbox)
        )
    else:
        poly_cells = polygons.withColumn(
            _CELL, F.explode(covered_cells(F.col(polys_col), cell_size))
        )
        pt_cells = points.withColumn(
            _CELL, grid_cell(F.col(x), F.col(y), cell_size)
        )
        matched = (
            pt_cells.join(poly_cells, _CELL)
            .filter(contains())
            .drop(_CELL, *bbox)
        )
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError(f"how must be inner|left, got {how}")
    if point_key is None:
        raise ValueError("how='left' requires point_key")
    return points.join(
        matched.select(point_key, *poly_payload), on=point_key, how="left"
    )


def dwithin_join(
    left: DataFrame,
    right: DataFrame,
    radius_m: float,
    cell_deg: float,
    left_lon: str = "lon",
    left_lat: str = "lat",
    right_lon: str = "lon",
    right_lat: str = "lat",
    dist_col: str = "dist_m",
) -> DataFrame:
    """All (left, right) pairs within ``radius_m`` meters (haversine) —
    ST_DWithin as a join predicate (J6's distance half,
    /root/reference/queries.py:182-186).

    ``cell_deg`` must be ≥ the radius expressed in degrees at the data's
    latitudes (for longitude: radius / (111320·cos(lat)) — caller picks a
    conservative value). The left side explodes to its 3×3 cell
    neighborhood, the right side keeps its single cell, and the shuffle
    equi-join on cells bounds candidate pairs before the exact distance
    test — the alternative (cross join + filter) is O(|L|·|R|) and does
    not survive scale.
    """
    l_cells = left.withColumn(
        _CELL,
        F.explode(neighbor_cells(F.col(left_lon), F.col(left_lat), cell_deg)),
    )
    r_cells = right.withColumn(
        _CELL, grid_cell(F.col(right_lon), F.col(right_lat), cell_deg)
    )
    dist = haversine_m(
        F.col(left_lon), F.col(left_lat), F.col(right_lon), F.col(right_lat)
    )
    return (
        l_cells.join(r_cells, _CELL)
        .withColumn(dist_col, dist)
        .filter(F.col(dist_col) <= radius_m)
        .drop(_CELL)
    )
