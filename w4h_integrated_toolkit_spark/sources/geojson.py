"""GeoJSON polygon source (reference S11).

The reference loads a neighborhoods ``.geojson`` overlay client-side
(viz.py:702-718). Spark has no geometry type, so features land as
(name, geometry_type, ring of (lon,lat) structs, wkt) rows — the canonical
lon/lat representation from SURVEY §1.3. multiLine JSON read because a
FeatureCollection is one document, then one explode over features.

Coordinate nesting depth is schema-dependent (Polygon rings are 3 levels
deep, MultiPolygon 4) and Spark infers ONE unified type per file, so the
ring expression is chosen from the inferred schema at plan time, not per
row. Files mixing Polygon and MultiPolygon don't unify under JSON
inference — split such files upstream (GeoJSON overlays are practically
always homogeneous).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_geojson_polygons"]


def _array_depth(dt: T.DataType) -> int:
    d = 0
    while isinstance(dt, T.ArrayType):
        d += 1
        dt = dt.elementType
    return d


def read_geojson_polygons(
    spark: SparkSession, path: str, name_property: str = "name"
) -> DataFrame:
    """FeatureCollection -> one row per (Multi)Polygon feature: name,
    geometry type, outer-ring points array<struct<lon,lat>>, WKT string.

    MultiPolygons contribute their first polygon's outer ring (the overlay
    use-case renders outlines); extend with posexplode over polygons for
    full multi-part fidelity."""
    raw = spark.read.option("multiLine", True).json(path)
    feats = raw.select(F.explode("features").alias("f"))
    coords_type = feats.schema["f"].dataType["geometry"].dataType["coordinates"].dataType
    depth = _array_depth(coords_type)
    coords = F.col("f.geometry.coordinates")
    if depth == 4:  # MultiPolygon: polygons -> rings -> points -> [lon, lat]
        ring: Column = coords[0][0]
    elif depth == 3:  # Polygon: rings -> points -> [lon, lat]
        ring = coords[0]
    else:
        raise ValueError(
            f"unsupported GeoJSON coordinate nesting (depth {depth}); "
            "expected Polygon or MultiPolygon features"
        )
    points = F.transform(
        ring, lambda p: F.struct(p[0].alias("lon"), p[1].alias("lat"))
    )
    wkt = F.concat(
        F.lit("POLYGON (("),
        F.array_join(
            F.transform(ring, lambda p: F.concat_ws(" ", p[0], p[1])), ", "
        ),
        F.lit("))"),
    )
    return feats.select(
        F.col(f"f.properties.{name_property}").alias("name"),
        F.col("f.geometry.type").alias("geometry_type"),
        points.alias("ring"),
        wkt.alias("wkt"),
    )
