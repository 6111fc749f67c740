"""Geospatial column expressions (SURVEY.md §2.7 F1-F4, F7).

Replaces the reference's PostGIS surface — ST_Contains / ST_X / ST_Y /
ST_GeomFromText / ST_DWithin (/root/reference/queries.py:59,140-141,
182-186; /root/reference/etl.py:194,269-273) and the geojson→WKT
formatter (/root/reference/etl.py:108-130) — with pure built-in-function
expressions:

- Geometry representation: ``lon``/``lat`` doubles for points; nested
  coordinate arrays ``array<array<array<array<double>>>>``
  ([polygon][ring][point][x,y]) for multipolygons, plus WKT strings at
  the storage boundary. This mirrors the reference's own PostGIS-absent
  fallback (/root/reference/etl.py:204-208) and needs no UDT.
- Point-in-polygon is the even-odd ray-casting rule expressed with
  higher-order functions (filter/aggregate/exists over the ring arrays)
  — fully JVM-side and codegen-friendly, so the predicate runs at scan
  speed instead of Python speed. Holes work because a point inside a
  hole crosses the hole ring an odd number of additional times, flipping
  total parity back to even.

Grid-cell helpers support the scale path for spatial joins: an
equi-join prefilter on deterministic cells replaces the reference's GIST
indexes (/root/reference/etl.py:230-237) — see operators/spatial.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# WKT format / parse (F3, F7, F2)
# ---------------------------------------------------------------------------


def wkt_point(x: Column, y: Column, decimals: int = 6) -> Column:
    """Format a point as ``POINT(x y)`` — the geojson_to_wkt point path
    (/root/reference/etl.py:115-117)."""
    fmt = f"POINT(%.{decimals}f %.{decimals}f)"
    return F.format_string(fmt, x, y)


def parse_wkt_point(wkt: Column) -> Column:
    """Parse ``POINT(x y)`` → struct(x, y) — ST_GeomFromText +
    ST_X/ST_Y for points (/root/reference/etl.py:194,269-270)."""
    num = r"(-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)"
    pat = rf"POINT\s*\(\s*{num}\s+{num}\s*\)"
    return F.struct(
        F.regexp_extract(wkt, pat, 1).cast("double").alias("x"),
        F.regexp_extract(wkt, pat, 2).cast("double").alias("y"),
    )


def parse_wkt_multipolygon(wkt: Column) -> Column:
    """Parse ``MULTIPOLYGON(((...)))`` → [polygon][ring][point][x,y]
    nested arrays, entirely with string built-ins + higher-order
    transforms (no UDF). Inverse of :func:`format_wkt_multipolygon`."""
    body = F.regexp_replace(
        F.regexp_replace(wkt, r"^\s*MULTIPOLYGON\s*\(", ""), r"\)\s*$", ""
    )
    # body == "((r, r), (h)), ((r))" — strip the outermost polygon parens
    # and split on the polygon separator, then the ring separator.
    stripped = F.regexp_replace(
        F.regexp_replace(body, r"^\s*\(\s*\(", ""), r"\)\s*\)\s*$", ""
    )
    polys = F.split(stripped, r"\)\s*\)\s*,\s*\(\s*\(")
    rings = lambda poly: F.split(poly, r"\)\s*,\s*\(")  # noqa: E731
    points = lambda ring: F.transform(  # noqa: E731
        F.split(F.trim(ring), r"\s*,\s*"),
        lambda p: F.transform(
            F.split(F.trim(p), r"\s+"), lambda c: c.cast("double")
        ),
    )
    return F.transform(
        polys, lambda poly: F.transform(rings(poly), points)
    )


def format_wkt_multipolygon(polys: Column, decimals: int = 6) -> Column:
    """Nested coordinate arrays → MULTIPOLYGON WKT string — the
    geojson_to_wkt multipolygon path (/root/reference/etl.py:119-127)."""
    fmt = f"%.{decimals}f %.{decimals}f"
    point = lambda p: F.format_string(  # noqa: E731
        fmt, F.element_at(p, 1), F.element_at(p, 2)
    )
    ring = lambda r: F.concat(  # noqa: E731
        F.lit("("), F.array_join(F.transform(r, point), ", "), F.lit(")")
    )
    poly = lambda po: F.concat(  # noqa: E731
        F.lit("("), F.array_join(F.transform(po, ring), ", "), F.lit(")")
    )
    return F.concat(
        F.lit("MULTIPOLYGON("),
        F.array_join(F.transform(polys, poly), ", "),
        F.lit(")"),
    )


# ---------------------------------------------------------------------------
# Point-in-polygon (F1) — even-odd ray casting over ring arrays
# ---------------------------------------------------------------------------


def _edge_crosses(a: Column, b: Column, x: Column, y: Column) -> Column:
    """Does edge a→b cross the horizontal ray from (x,y) to +inf?

    Standard crossing test; when the edge is horizontal the straddle
    check is false so the (potentially div-by-zero → inf/NaN) intercept
    term is irrelevant — double division never throws.
    """
    ax, ay = F.element_at(a, 1), F.element_at(a, 2)
    bx, by = F.element_at(b, 1), F.element_at(b, 2)
    straddles = (ay > y) != (by > y)
    x_intercept = (bx - ax) * (y - ay) / (by - ay) + ax
    return straddles & (x < x_intercept)


def _ring_crossings(ring: Column, x: Column, y: Column) -> Column:
    edges = F.sequence(F.lit(1), F.size(ring) - 1)
    n = F.size(
        F.filter(
            edges,
            lambda i: _edge_crosses(
                F.element_at(ring, i), F.element_at(ring, i + 1), x, y
            ),
        )
    )
    return F.when(F.size(ring) >= 2, n).otherwise(F.lit(0))


def multipolygon_contains(polys: Column, x: Column, y: Column) -> Column:
    """ST_Contains(multipolygon, point) (/root/reference/queries.py:59).

    True iff the point is inside any polygon of the multipolygon under
    the even-odd rule across that polygon's rings (outer + holes).
    Boundary points follow ray-casting convention (half-open edges).
    """
    return F.exists(
        polys,
        lambda poly: (
            F.aggregate(
                poly,
                F.lit(0),
                lambda acc, ring: acc + _ring_crossings(ring, x, y),
            )
            % 2
            == 1
        ),
    )


# ---------------------------------------------------------------------------
# Distance (F4) and grid cells (the scale path for J1/J2)
# ---------------------------------------------------------------------------

EARTH_RADIUS_M = 6371000.0


def haversine_m(
    lon1: Column, lat1: Column, lon2: Column, lat2: Column
) -> Column:
    """Great-circle distance in meters — ST_DWithin's measure
    (/root/reference/queries.py:182-186). Mirrored term-for-term by the
    SQL oracle so both engines evaluate the identical expression tree."""
    dlat_h = F.radians(lat2 - lat1) / 2
    dlon_h = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat_h) * F.sin(dlat_h)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon_h)
        * F.sin(dlon_h)
    )
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def grid_cell(x: Column, y: Column, cell_size: float) -> Column:
    """Deterministic grid-cell id "cx_cy" for a point."""
    return F.concat_ws(
        "_",
        F.floor(x / F.lit(cell_size)).cast("long"),
        F.floor(y / F.lit(cell_size)).cast("long"),
    )


def covered_cells(polys: Column, cell_size: float) -> Column:
    """All grid cells intersecting the multipolygon's bounding box.

    Bbox-based: cheap, may over-approximate concave shapes (the exact
    containment test after the equi-join removes false positives).
    """
    pts = F.flatten(F.flatten(polys))
    xs = F.transform(pts, lambda p: F.element_at(p, 1))
    ys = F.transform(pts, lambda p: F.element_at(p, 2))
    cx = F.sequence(
        F.floor(F.array_min(xs) / F.lit(cell_size)).cast("long"),
        F.floor(F.array_max(xs) / F.lit(cell_size)).cast("long"),
    )
    cy = F.sequence(
        F.floor(F.array_min(ys) / F.lit(cell_size)).cast("long"),
        F.floor(F.array_max(ys) / F.lit(cell_size)).cast("long"),
    )
    return F.flatten(
        F.transform(
            cx, lambda a: F.transform(cy, lambda b: F.concat_ws("_", a, b))
        )
    )


def neighbor_cells(x: Column, y: Column, cell_size: float) -> Column:
    """The 3×3 cell neighborhood of a point — the probe side of a
    within-distance equi-join prefilter (cell_size must be ≥ the search
    radius in the same units)."""
    cx = F.floor(x / F.lit(cell_size)).cast("long")
    cy = F.floor(y / F.lit(cell_size)).cast("long")
    offsets = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    return F.flatten(
        F.transform(
            offsets,
            lambda dx: F.transform(
                offsets, lambda dy: F.concat_ws("_", cx + dx, cy + dy)
            ),
        )
    )
