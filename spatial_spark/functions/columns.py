"""Pure-Column spatial expressions — the JVM-side fast path.

These never leave whole-stage codegen: no Python UDFs, no Arrow transfer.
Point layers (x/y double columns) get their entire hot path here — the
reference's two-phase search (envelope prefilter + exact test,
rtree/filter/AbstractSearchEnvelopeIntersection.java:48-54) becomes pure
column predicates that Catalyst pushes into the Parquet scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0  # OrthodromicDistance.java R=6371


def sphere_distance_km(lon1, lat1, lon2, lat2) -> Column:
    """Spherical law of cosines, R=6371 — exact replication of
    OrthodromicDistance.calculateDistance (reference :90-97), as a pure
    Column expression (codegen'd, vectorized, no Python)."""
    rlat1 = F.radians(_c(lat1))
    rlat2 = F.radians(_c(lat2))
    dlon = F.radians(_c(lon2) - _c(lon1))
    v = F.sin(rlat1) * F.sin(rlat2) + F.cos(rlat1) * F.cos(rlat2) * F.cos(dlon)
    v = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), v))
    return F.acos(v) * F.lit(EARTH_RADIUS_KM)


def _c(v):
    if isinstance(v, Column):
        return v
    if isinstance(v, str):
        return F.col(v)
    return F.lit(v)


def sphere_search_window(lon: float, lat: float, dist_km: float):
    """(xmin, ymin, xmax, ymax) window guaranteed to contain the distance
    circle.

    Improves on OrthodromicDistance.suggestSearchWindow (reference :73-88),
    whose `span/cos(lat)` longitude widening under-covers away from the
    probe latitude (the documented may-miss flaw): the exact max longitude
    extent of a spherical cap of angular radius r at latitude φ is
    asin(sin(r)/cos(φ)), reached at a latitude beyond φ.  We use that, plus
    a 1e-9° guard so boundary points survive the prefilter."""
    r = dist_km / EARTH_RADIUS_KM  # angular radius, radians
    lat_span = math.degrees(r) + 1e-9
    coslat = math.cos(math.radians(lat))
    sinr = math.sin(min(r, math.pi / 2))
    if sinr >= coslat or abs(lat) + lat_span >= 90.0:
        lon_span = 360.0  # cap reaches a pole: all longitudes
    else:
        lon_span = math.degrees(math.asin(sinr / coslat)) + 1e-9
    return (lon - lon_span, lat - lat_span, lon + lon_span, lat + lat_span)


def sphere_search_windows(lon: float, lat: float, dist_km: float) -> list:
    """Antimeridian-aware window list: 1 window normally, 2 when the cap
    crosses ±180 (layer coordinates stay in [-180, 180], so a window
    extending past the antimeridian must wrap).  OR the per-window
    prefilters (bbox_intersects_any)."""
    x0, y0, x1, y1 = sphere_search_window(lon, lat, dist_km)
    if x1 - x0 >= 360.0:
        return [(-180.0, y0, 180.0, y1)]
    if x0 < -180.0:
        return [(-180.0, y0, x1, y1), (x0 + 360.0, y0, 180.0, y1)]
    if x1 > 180.0:
        return [(x0, y0, 180.0, y1), (-180.0, y0, x1 - 360.0, y1)]
    return [(x0, y0, x1, y1)]


def bbox_intersects_window(xmin, ymin, xmax, ymax, window) -> Column:
    """bbox-vs-rectangle predicate on the four bbox columns —
    FilterIntersectWindow.java:32-51 as pure column math."""
    wx0, wy0, wx1, wy1 = window
    return (
        (_c(xmax) >= F.lit(wx0)) & (_c(xmin) <= F.lit(wx1))
        & (_c(ymax) >= F.lit(wy0)) & (_c(ymin) <= F.lit(wy1))
    )


def point_in_window(x, y, window) -> Column:
    wx0, wy0, wx1, wy1 = window
    return (
        (_c(x) >= F.lit(wx0)) & (_c(x) <= F.lit(wx1))
        & (_c(y) >= F.lit(wy0)) & (_c(y) <= F.lit(wy1))
    )


def bbox_covered_by_window(xmin, ymin, xmax, ymax, window) -> Column:
    """SearchCoveredByEnvelope equivalent."""
    wx0, wy0, wx1, wy1 = window
    return (
        (_c(xmin) >= F.lit(wx0)) & (_c(xmax) <= F.lit(wx1))
        & (_c(ymin) >= F.lit(wy0)) & (_c(ymax) <= F.lit(wy1))
    )


def bbox_equals_window(xmin, ymin, xmax, ymax, window, tol: float = 0.0) -> Column:
    """SearchEqualEnvelopes equivalent."""
    wx0, wy0, wx1, wy1 = window
    if tol == 0.0:
        return (
            (_c(xmin) == F.lit(wx0)) & (_c(xmax) == F.lit(wx1))
            & (_c(ymin) == F.lit(wy0)) & (_c(ymax) == F.lit(wy1))
        )
    return (
        (F.abs(_c(xmin) - F.lit(wx0)) <= tol) & (F.abs(_c(xmax) - F.lit(wx1)) <= tol)
        & (F.abs(_c(ymin) - F.lit(wy0)) <= tol) & (F.abs(_c(ymax) - F.lit(wy1)) <= tol)
    )


def sfc_ranges_predicate(key_col, ranges) -> Column:
    """OR-list of BETWEENs over an SFC key column; Catalyst turns each into
    row-group min/max pruning — the reference's curve-range scans
    (LayerSpaceFillingCurvePointIndex.java:114-179)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    pred = None
    for lo, hi in ranges:
        p = key.between(int(lo), int(hi))
        pred = p if pred is None else (pred | p)
    return pred if pred is not None else F.lit(True)


def planar_distance(x1, y1, x2, y2) -> Column:
    return F.sqrt((_c(x2) - _c(x1)) ** 2 + (_c(y2) - _c(y1)) ** 2)


def sphere_azimuth_deg(lon1, lat1, lon2, lat2) -> Column:
    """Initial great-circle bearing from point 1 to point 2, degrees in
    [0, 360) — ST_Azimuth's spherical form, pure Column (codegen'd)."""
    lon1, lat1, lon2, lat2 = [
        F.col(c) if isinstance(c, str) else c
        for c in (lon1, lat1, lon2, lat2)]
    dl = F.radians(lon2 - lon1)
    p1, p2 = F.radians(lat1), F.radians(lat2)
    az = F.degrees(F.atan2(
        F.sin(dl) * F.cos(p2),
        F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)))
    return (az % 360 + 360) % 360


def sphere_project(lon, lat, bearing_deg, km):
    """Destination point ``km`` along the great circle at
    ``bearing_deg`` (R=6371, the engine's sphere) — ST_Project's
    spherical form.  Returns ``(lon2, lat2)`` Columns; longitude is
    normalized to [-180, 180)."""
    lon, lat, bearing_deg, km = [
        F.col(c) if isinstance(c, str) else c
        for c in (lon, lat, bearing_deg, km)]
    d = km / F.lit(6371.0)
    th = F.radians(bearing_deg)
    p1 = F.radians(lat)
    p2 = F.asin(F.sin(p1) * F.cos(d) + F.cos(p1) * F.sin(d) * F.cos(th))
    l2 = F.radians(lon) + F.atan2(
        F.sin(th) * F.sin(d) * F.cos(p1),
        F.cos(d) - F.sin(p1) * F.sin(p2))
    lon2 = (F.degrees(l2) % 360 + 540) % 360 - 180
    return lon2, F.degrees(p2)
