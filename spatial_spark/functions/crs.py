"""CRS reprojection: EPSG:4326 ↔ EPSG:3857 in closed form.

The reference delegates CRS work to GeoTools adapters
(geotools-common/, ~457 LoC of CRS plumbing); per SURVEY §1.2 this
engine scopes CRS to WGS84 + cartesian + the web-mercator frame its
tile math already uses (operators/tiles.py holds the slippy-map
FORWARD half).  This module closes the practical gap (VERDICT r7 ask
#7): spherical-mercator meters ↔ lon/lat degrees, both directions, as

  * dual-engine SQL TEXT (``merc_forward_sql`` / ``merc_inverse_sql``)
    — identical IEEE double expressions valid in Spark SQL and DuckDB,
    the repo's cross-engine oracle discipline, usable as pure Column
    math on point tables (no UDF, whole-stage codegen), and
  * ``st_transform(geom, 'EPSG:4326', 'EPSG:3857')`` — an Arrow-batched
    UDF applying the same formulas to every vertex of any WKB geometry
    (the ``cartesian`` frame passes through untouched).

Spherical mercator (EPSG:3857 definition, R = WGS84 semi-major axis):

    x = R * radians(lon)
    y = R * ln(tan(pi/4 + radians(lat)/2))
    lon = degrees(x / R)
    lat = degrees(2 * atan(exp(y / R)) - pi/2)

No latitude clamp is applied — |lat| → 90 diverges by definition; the
tile layer (operators/tiles.py) clamps to ±85.05112878° where the
slippy grid requires it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import Geometry, GTYPE_POINT, GTYPE_LINESTRING, GTYPE_POLYGON, \
    from_wkb, to_wkb

__all__ = ["MERC_R", "merc_forward_sql", "merc_inverse_sql",
           "transform_points", "st_transform"]

MERC_R = 6378137.0   # WGS84 semi-major axis, the EPSG:3857 sphere radius

_WGS84 = ("epsg:4326", "4326", "crs:84", "wgs84")
_MERC = ("epsg:3857", "3857", "epsg:900913", "web-mercator")
_CART = ("cartesian", "0", "none", "")


def _frame(crs) -> str:
    s = str(crs).strip().lower()
    if s in _WGS84:
        return "wgs84"
    if s in _MERC:
        return "merc"
    if s in _CART:
        return "cart"
    raise ValueError(
        f"st_transform: unsupported CRS {crs!r} "
        "(supported: EPSG:4326, EPSG:3857, cartesian)")


def merc_forward_sql(lon_sql: str, lat_sql: str) -> tuple[str, str]:
    """(x_meters, y_meters) SQL texts — valid in Spark SQL and DuckDB."""
    x = f"({MERC_R!r} * radians({lon_sql}))"
    y = f"({MERC_R!r} * ln(tan(pi() / 4.0 + radians({lat_sql}) / 2.0)))"
    return x, y


def merc_inverse_sql(x_sql: str, y_sql: str) -> tuple[str, str]:
    """(lon_degrees, lat_degrees) SQL texts — valid in both engines."""
    lon = f"(degrees(({x_sql}) / {MERC_R!r}))"
    lat = f"(degrees(2.0 * atan(exp(({y_sql}) / {MERC_R!r})) - pi() / 2.0))"
    return lon, lat


def transform_points(xy: np.ndarray, src: str, dst: str) -> np.ndarray:
    """Vectorized (n, 2) coordinate transform between resolved frames
    ('wgs84' | 'merc' | 'cart').  cart composes with nothing: it is an
    identity passthrough and only pairs with itself."""
    if src == dst:
        return xy
    if "cart" in (src, dst):
        raise ValueError(
            "st_transform: the cartesian frame has no defined mapping to "
            f"{src if dst == 'cart' else dst!r}; cartesian only passes "
            "through to itself")
    out = np.empty_like(xy, dtype=np.float64)
    if src == "wgs84":                      # → merc
        out[:, 0] = MERC_R * np.radians(xy[:, 0])
        out[:, 1] = MERC_R * np.log(
            np.tan(np.pi / 4.0 + np.radians(xy[:, 1]) / 2.0))
    else:                                   # merc → wgs84
        out[:, 0] = np.degrees(xy[:, 0] / MERC_R)
        out[:, 1] = np.degrees(
            2.0 * np.arctan(np.exp(xy[:, 1] / MERC_R)) - np.pi / 2.0)
    return out


def _map_geometry(g: Geometry, fn) -> Geometry:
    if g.gtype == GTYPE_POINT:
        return Geometry(GTYPE_POINT, fn(g.data.reshape(1, 2))[0])
    if g.gtype == GTYPE_LINESTRING:
        return Geometry(GTYPE_LINESTRING, fn(g.data))
    if g.gtype == GTYPE_POLYGON:
        return Geometry(GTYPE_POLYGON, [fn(r) for r in g.data])
    return Geometry(g.gtype, [_map_geometry(p, fn) for p in g.parts()])


@F.pandas_udf(T.BinaryType())
def st_transform(wkb: pd.Series, src: pd.Series, dst: pd.Series) -> pd.Series:
    out = []
    for b, s, d in zip(wkb, src, dst):
        if b is None:
            out.append(None)
            continue
        sf, df_ = _frame(s), _frame(d)
        if sf == df_:
            out.append(bytes(b))
            continue
        out.append(to_wkb(_map_geometry(
            from_wkb(b), lambda a: transform_points(
                np.asarray(a, dtype=np.float64).reshape(-1, 2), sf, df_))))
    return pd.Series(out)
