"""GeoJSON FeatureCollection → DataFrame normalization (SURVEY.md §2.1 S3).

The reference flattens features row-by-row in Python — properties dict →
columns, geometry → WKT, residual nested values → JSON strings
(/root/reference/etl.py:133-159). Spark-first: ``spark.read.json`` infers
the nested schema, ``explode`` flattens the feature array, ``select
properties.*`` spreads the columns, geometry converts to WKT through the
engine's array-based formatters, residual structs/arrays stringify with
``to_json`` — all distributed, no Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from seng550_a3_etl_spark.functions.geo import (
    format_wkt_multipolygon,
    wkt_point,
)


def read_feature_collection(spark: SparkSession, path: str) -> DataFrame:
    """Read a GeoJSON FeatureCollection file into one row per feature
    with columns (properties struct, geometry struct)."""
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(F.explode("features").alias("f")).select(
        "f.properties", "f.geometry"
    )


def geometry_to_wkt(geometry_type: str, coords: F.Column) -> F.Column:
    """Coordinate arrays → WKT text (/root/reference/etl.py:108-130).
    ``geometry_type`` must be known per-source (a mixed collection makes
    Spark's JSON inference degrade coordinates to strings — ingest
    homogeneous layers separately, as the reference does)."""
    # JSON inference types whole-number coordinates as long — cast the
    # whole nested array so the WKT float formatter always sees doubles.
    if geometry_type == "Point":
        return wkt_point(
            F.element_at(coords, 1).cast("double"),
            F.element_at(coords, 2).cast("double"),
        )
    if geometry_type == "Polygon":
        return format_wkt_multipolygon(
            F.array(coords.cast("array<array<array<double>>>"))
        )
    if geometry_type == "MultiPolygon":
        return format_wkt_multipolygon(
            coords.cast("array<array<array<array<double>>>>")
        )
    raise ValueError(f"unsupported geometry type: {geometry_type}")


def normalize_features(
    features: DataFrame, geometry_type: str
) -> DataFrame:
    """properties.* spread to columns (nested values JSON-stringified,
    /root/reference/etl.py:148-155) + geometry as ``geometry_wkt``."""
    props_type: StructType = features.schema["properties"].dataType
    cols = []
    for field in props_type.fields:
        src = F.col(f"properties.{field.name}")
        if isinstance(field.dataType, (StructType, ArrayType)):
            cols.append(F.to_json(src).alias(field.name))
        else:
            cols.append(src.alias(field.name))
    cols.append(
        geometry_to_wkt(geometry_type, F.col("geometry.coordinates")).alias(
            "geometry_wkt"
        )
    )
    return features.select(*cols)


def read_geojson(
    spark: SparkSession, path: str, geometry_type: str
) -> DataFrame:
    """End-to-end S3: FeatureCollection file → flat DataFrame with
    scalar property columns + geometry_wkt."""
    return normalize_features(
        read_feature_collection(spark, path), geometry_type
    )
