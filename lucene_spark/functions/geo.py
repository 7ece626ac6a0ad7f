"""Geo queries over (lat, lon) doc-values columns — the semantic analog of
LatLonPoint.newDistanceQuery / newBoxQuery (document/LatLonPoint.java:281,
search over the BKD tree), re-expressed as Catalyst predicates:

- box query: pure range predicates on the lat/lon columns — pushed into the
  Parquet scan exactly like PointRangeQuery (the BKD role). Boxes crossing
  the antimeridian split into two lon ranges (LatLonPoint's crossesDateline
  handling).
- distance query: a bounding-box PREFILTER (cheap, scan-pruned) followed by
  the exact haversine distance test — the two-phase shape of the
  reference's distance query (approximation via the tree, then exact
  haversinMeters verification). Distance math is standard haversine on the
  mean earth radius; we match the reference's SEMANTICS (membership within
  radius meters), not SloppyMath's bit patterns (documented envelope).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

EARTH_RADIUS_M = 6_371_008.7714  # mean earth radius (GeoUtils.EARTH_MEAN_RADIUS_METERS)


def haversine_meters(lat1, lon1, lat2, lon2):
    """Haversine distance as a Spark Column (all args degrees)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def geo_box(
    docs: DataFrame, lat_col: str, lon_col: str,
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
) -> DataFrame:
    """Docs inside the lat/lon box (inclusive); min_lon > max_lon means the
    box crosses the antimeridian and splits into two ranges."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    cond = (lat >= min_lat) & (lat <= max_lat)
    if min_lon <= max_lon:
        cond = cond & (lon >= min_lon) & (lon <= max_lon)
    else:
        cond = cond & ((lon >= min_lon) | (lon <= max_lon))
    return docs.filter(cond)


def geo_distance(
    docs: DataFrame, lat_col: str, lon_col: str,
    center_lat: float, center_lon: float, radius_m: float,
) -> DataFrame:
    """Docs within radius_m meters of the center: bounding-box prefilter
    (pushed to the scan) + exact haversine verify, with a distance column."""
    dlat = math.degrees(radius_m / EARTH_RADIUS_M)
    # longitude span widens with latitude; clamp cos at the box's extreme
    extreme = min(90.0, max(abs(center_lat) + dlat, 0.0))
    cos_lat = math.cos(math.radians(min(extreme, 89.9999)))
    dlon = min(180.0, math.degrees(radius_m / (EARTH_RADIUS_M * max(cos_lat, 1e-9))))
    min_lat, max_lat = max(-90.0, center_lat - dlat), min(90.0, center_lat + dlat)
    lo, hi = center_lon - dlon, center_lon + dlon
    if lo < -180.0 or hi > 180.0:
        boxed = docs.filter(
            (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
        )  # wrapped: latitude band only
    else:
        boxed = geo_box(docs, lat_col, lon_col, min_lat, max_lat, lo, hi)
    dist = haversine_meters(
        F.col(lat_col), F.col(lon_col), F.lit(float(center_lat)), F.lit(float(center_lon))
    )
    return boxed.withColumn("distance_m", F.round(dist, 3)).filter(
        F.col("distance_m") <= radius_m
    )


def _raycast_inside(pts, lat, lon):
    """Even-odd ray-cast membership as a pure JVM Column (no UDF, WSCG)."""
    crossings = F.lit(0)
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses the horizontal ray
        cond = (
            ((F.lit(y1) > lat) != (F.lit(y2) > lat))
            & (
                lon
                < F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1)
                + F.lit(x1)
            )
        )
        crossings = crossings + F.when(cond, F.lit(1)).otherwise(F.lit(0))
    return crossings % 2 == 1


def geo_polygon(
    docs: DataFrame, lat_col: str, lon_col: str, points, holes=None,
) -> DataFrame:
    """Docs inside a simple (non-self-intersecting) polygon, minus any
    ``holes`` — the semantic analog of LatLonPoint.newPolygonQuery
    (document/LatLonPoint.java; geo/Polygon.java, whose constructor takes
    inner-ring holes): a bounding-box prefilter (plain range predicates,
    pushed to the Parquet scan — the BKD-tree role) followed by even-odd
    ray-cast membership tests unrolled over the rings' edges as pure JVM
    column expressions (no UDF, whole-stage codegen). A point inside a
    hole does NOT match. Boundary behavior follows the standard half-open
    ray-cast rule, matching the reference's SEMANTICS of containment
    rather than GeoUtils' exact bit patterns (same documented envelope as
    geo_distance). ``points`` / each hole: [(lat, lon), ...], any
    orientation, closing edge implied."""
    pts = [(float(a), float(b)) for a, b in points]
    lat, lon = F.col(lat_col), F.col(lon_col)
    min_lat, max_lat = min(p[0] for p in pts), max(p[0] for p in pts)
    min_lon, max_lon = min(p[1] for p in pts), max(p[1] for p in pts)
    boxed = docs.filter(
        (lat >= min_lat) & (lat <= max_lat) & (lon >= min_lon) & (lon <= max_lon)
    )
    inside = _raycast_inside(pts, lat, lon)
    for hole in holes or ():
        hp = [(float(a), float(b)) for a, b in hole]
        inside = inside & ~_raycast_inside(hp, lat, lon)
    return boxed.filter(inside)


def distance_sort(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    k: int = 10,
) -> DataFrame:
    """LatLonDocValuesField.newDistanceSort analog (document/
    LatLonPointSortField.java): nearest-k docs by exact haversine meters
    from (lat, lon), ties by doc_id; docs with missing coordinates sort
    last and fall out of the top-k (the sort's Double.POSITIVE_INFINITY
    missing value). One TakeOrderedAndProject — no shuffle beyond the
    global top-k merge. → (doc_id, distance_m)"""
    d = haversine_meters(
        F.col(lat_col), F.col(lon_col), F.lit(float(lat)), F.lit(float(lon))
    )
    return (
        docs.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .select("doc_id", d.alias("distance_m"))
        .orderBy(F.asc("distance_m"), F.asc("doc_id"))
        .limit(int(k))
    )
