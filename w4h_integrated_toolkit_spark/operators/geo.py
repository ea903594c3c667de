"""Geometry codecs + trajectory assembly (SURVEY §2.7 C11-C13, §2.1 S3).

No Spark GeometryType and no PostGIS: the canonical representation is plain
``lon``/``lat`` double columns (+ optional WKT string), exactly what the
reference ultimately extracts anyway (viz.py:818 reads ``.x``/``.y``).

- WKT encode/decode: pure built-in string expressions (the reference does
  row-at-a-time Python, w4h_db_utils.py:196-197 / viz.py:126).
- WKB decode: a vectorized pandas UDF using only stdlib ``struct`` — the
  wire format PostGIS emits (hex EWKB, possibly with SRID flag).
- haversine: Column math (augment_with_trajectories.ipynb cell 3 uses the
  same Earth radius).
- trajectory: per-user time-ordered [[lat, lon], ...] path arrays
  (viz.py:814-821) via collect_list over an ordered window.
"""

from __future__ import annotations

import math
import struct as _struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "wkt_point",
    "wkt_decode_lon",
    "wkt_decode_lat",
    "wkb_hex_decode",
    "haversine_m",
    "trajectories",
    "point_in_polygon",
    "geofence_join",
    "grid_density",
]

EARTH_RADIUS_M = 6371000.0  # viz.py:37 / augment_with_trajectories.ipynb cell 3

_NUM = r"(-?[0-9]+\.?[0-9]*(?:[eE][+-]?[0-9]+)?)"


def wkt_point(lon: Column, lat: Column) -> Column:
    """POINT(lon lat) — w4h_db_utils.py:196-197's f-string, vectorized."""
    return F.concat(F.lit("POINT("), lon.cast("string"), F.lit(" "), lat.cast("string"), F.lit(")"))


def wkt_decode_lon(wkt: Column) -> Column:
    return F.regexp_extract(wkt, rf"POINT\s*\(\s*{_NUM}\s+{_NUM}\s*\)", 1).cast("double")


def wkt_decode_lat(wkt: Column) -> Column:
    return F.regexp_extract(wkt, rf"POINT\s*\(\s*{_NUM}\s+{_NUM}\s*\)", 2).cast("double")


_POINT_STRUCT = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)


@F.pandas_udf(_POINT_STRUCT)
def wkb_hex_decode(hex_s: pd.Series) -> pd.DataFrame:
    """Hex-(E)WKB POINT -> (lon, lat). Pure-stdlib parse of the wire format
    the reference decodes with shapely (viz.py:126): byte order flag, geom
    type (with optional SRID flag 0x20000000), two float64s."""

    def one(h):
        if h is None:
            return (None, None)
        try:
            raw = bytes.fromhex(h)
            little = raw[0] == 1
            bo = "<" if little else ">"
            (gtype,) = _struct.unpack_from(bo + "I", raw, 1)
            off = 5
            if gtype & 0x20000000:  # EWKB SRID present
                off += 4
            if gtype & 0xFF != 1:  # not a POINT
                return (None, None)
            lon, lat = _struct.unpack_from(bo + "dd", raw, off)
            return (lon, lat)
        except (ValueError, _struct.error):
            return (None, None)

    decoded = [one(h) for h in hex_s]
    return pd.DataFrame(decoded, columns=["lon", "lat"])


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters (Column math, codegen'd)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def trajectories(
    locations: DataFrame,
    user: str = "user_id",
    ts: str = "timestamp",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-user time-ordered path [[lat, lon], ...] (viz.py:814-821).

    sort_array over structs keyed by timestamp keeps the whole thing one
    hash aggregate (no global sort): collect unordered, order in-place.
    """
    pt = F.struct(F.col(ts).alias("ts"), F.array(F.col(lat), F.col(lon)).alias("p"))
    return (
        locations.groupBy(user)
        .agg(F.sort_array(F.collect_list(pt)).alias("pts"))
        .select(user, F.transform(F.col("pts"), lambda s: s["p"]).alias("path"))
    )


def point_in_polygon(lon: Column, lat: Column, ring: Column) -> Column:
    """Even-odd-rule point-in-polygon test as pure Column math — no UDF.

    ``ring`` is an ``array<struct<lon double, lat double>>`` of vertices
    (open or closed; a closing duplicate vertex contributes a degenerate
    edge that never crosses). The crossing count folds over the edge list
    with ``F.aggregate`` — JVM-side, codegen-friendly, and usable inside
    any join condition or filter. Points exactly on an edge land on
    whichever side the ray count puts them — deterministic, and identical
    in any engine evaluating the same IEEE expression (the oracle unrolls
    the same edges).

    The reference has no geofence operator (its maps only draw
    trajectories, viz.py:814-821); this is the north-star spatial-join
    primitive built the Spark-first way.
    """
    n = F.size(ring)
    # wraparound edge (i -> (i+1) mod n) closes an open ring; on a closed
    # ring the wrap edge is degenerate (a == b, never straddles) — harmless
    ax = lambda i: F.element_at(ring, i + 1)["lon"]  # noqa: E731
    ay = lambda i: F.element_at(ring, i + 1)["lat"]  # noqa: E731
    bx = lambda i: F.element_at(ring, F.pmod(i + 1, n) + 1)["lon"]  # noqa: E731
    by = lambda i: F.element_at(ring, F.pmod(i + 1, n) + 1)["lat"]  # noqa: E731

    def crosses(i: Column) -> Column:
        straddles = (ay(i) > lat) != (by(i) > lat)
        xcross = ax(i) + (bx(i) - ax(i)) * (lat - ay(i)) / (by(i) - ay(i))
        return F.when(straddles & (lon < xcross), F.lit(1)).otherwise(F.lit(0))

    count = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(0), lambda acc, i: acc + crosses(i)
    )
    return F.pmod(count, F.lit(2)) == 1


def geofence_join(
    points: DataFrame,
    polygons: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    polygon_id: str = "polygon_id",
    ring: str = "ring",
    cell_deg: float = 1.0,
) -> DataFrame:
    """Spatial join: each point row paired with every polygon containing it.

    Scale shape: polygons are FEW (geofences, regions — never fact-sized),
    so their grid-cell index broadcasts. Each polygon explodes to the grid
    cells covering its bounding box (computed from the ring, map-side);
    each point computes its own cell (two floors); the join is EQUI on the
    cell — broadcast hash, never a nested-loop over all (point, polygon)
    pairs — and the exact even-odd test runs only on the candidates that
    share a cell. The fact side never shuffles: cell assignment and the
    ring test are map-side expressions over the broadcast index.

    ``cell_deg`` trades index size against candidate precision; cells per
    polygon ~ (bbox area / cell_deg²), so size it to the typical geofence.
    """
    xs = F.transform(F.col(ring), lambda v: v["lon"])
    ys = F.transform(F.col(ring), lambda v: v["lat"])
    cellify = lambda c: F.floor(c / F.lit(float(cell_deg))).cast("long")  # noqa: E731
    fences = polygons.select(
        polygon_id,
        ring,
        F.explode(
            F.sequence(cellify(F.array_min(xs)), cellify(F.array_max(xs)))
        ).alias("_cx"),
        F.col(ring).alias("_r"),
    ).select(
        polygon_id,
        ring,
        "_cx",
        F.explode(
            F.sequence(
                cellify(
                    F.array_min(F.transform(F.col("_r"), lambda v: v["lat"]))
                ),
                cellify(
                    F.array_max(F.transform(F.col("_r"), lambda v: v["lat"]))
                ),
            )
        ).alias("_cy"),
    )
    pts = points.withColumn("_cx", cellify(F.col(lon))).withColumn(
        "_cy", cellify(F.col(lat))
    )
    return (
        pts.join(F.broadcast(fences), ["_cx", "_cy"])
        .filter(point_in_polygon(F.col(lon), F.col(lat), F.col(ring)))
        .drop("_cx", "_cy", ring)
    )


def grid_density(
    points: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 10.0,
    k: int = 20,
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Spatial density grid: bucket points into ``cell_deg``-degree cells
    and rank the k densest — the heatmap/hotspot aggregation behind the
    reference's map panels (viz.py density layers draw per-viewport; this
    is the precomputed global version a tile server would read).

    Cells are integer (floor(lon/cell), floor(lat/cell)) pairs — pure
    integer keys, so counts and ordering are engine-exact. Plan: ONE hash
    aggregate on the cell key (map-side partials absorb the density
    skew that motivates the query in the first place), then global top-k
    via TakeOrderedAndProject — no global sort, no window.

    ``extra_aggs`` adds named aggregate expressions (e.g. distinct
    users) computed in the same single aggregate pass.
    """
    cx = F.floor(F.col(lon) / F.lit(float(cell_deg))).cast("long")
    cy = F.floor(F.col(lat) / F.lit(float(cell_deg))).cast("long")
    aggs = [F.count(F.lit(1)).alias("n_points")]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return (
        points.groupBy(cx.alias("cell_x"), cy.alias("cell_y"))
        .agg(*aggs)
        .orderBy(F.desc("n_points"), "cell_x", "cell_y")
        .limit(k)
    )
