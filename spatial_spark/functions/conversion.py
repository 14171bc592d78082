"""Named conversion functions — SpatialFunctions.java:46-136 parity.

The reference exposes spatial.asMap / spatial.asGeometry /
spatial.decodeGeometry / spatial.nodeAsWKT / spatial.extractAttributes /
spatial.wktToGeoJson / spatial.neo4jGeometryToWkt as Cypher user
functions.  Re-expressed for the Spark engine: geometries travel as WKB
(or WKT/GeoJSON strings, coordinate pairs), a "node" is a layer row
addressed by its id, and the map form is the GeoJSON structure (the same
structure GeoJsonUtils.toGeoJsonStructure builds).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import Geometry, from_wkb, from_wkt, to_wkt
from ..geom.io_text import from_geojson, to_geojson

CORE_COLS = ("geom", "gtype", "xmin", "ymin", "xmax", "ymax", "zkey")


def _is_pair(v) -> bool:
    return (isinstance(v, (list, tuple)) and len(v) == 2
            and all(isinstance(x, (int, float)) for x in v))


def as_geometry(obj) -> Geometry:
    """spatial.asGeometry: coerce WKT/WKB/GeoJSON-map/coordinate input to
    a Geometry."""
    if isinstance(obj, Geometry):
        return obj
    if isinstance(obj, str):
        s = obj.lstrip()
        return from_geojson(obj) if s.startswith("{") else from_wkt(obj)
    if isinstance(obj, (bytes, bytearray)):
        return from_wkb(bytes(obj))
    if isinstance(obj, dict):
        return from_geojson(json.dumps(obj))
    if _is_pair(obj):
        return Geometry.point(float(obj[0]), float(obj[1]))
    if isinstance(obj, (list, tuple)) and obj and all(_is_pair(p) for p in obj):
        import numpy as np
        from ..geom.core import GTYPE_LINESTRING
        return Geometry(GTYPE_LINESTRING, np.asarray(obj, dtype=float))
    raise TypeError(f"cannot convert {type(obj).__name__} to a geometry")


def as_map(obj) -> dict:
    """spatial.asMap: the GeoJSON structure of the geometry as a dict."""
    return json.loads(to_geojson(as_geometry(obj)))


def wkt_to_geojson(wkt: str | None):
    """spatial.wktToGeoJson (null-propagating, like the reference)."""
    if wkt is None:
        return None
    return json.loads(to_geojson(from_wkt(wkt)))


def native_to_wkt(obj) -> str:
    """spatial.neo4jGeometryToWkt: a coordinate pair → POINT WKT, a
    sequence of pairs → LINESTRING WKT."""
    if _is_pair(obj) or isinstance(obj, (list, tuple)):
        return to_wkt(as_geometry(obj))
    raise TypeError(f"Unsupported type: {type(obj).__name__}")


def _node_row(layer, node_id):
    # file-pruned two-step read on id-indexed layers, pushed-filter scan
    # otherwise — see Layer.lookup_row
    row = layer.lookup_row(node_id)
    if row is None:
        raise KeyError(f"no node {node_id!r} in layer {layer.name!r}")
    return row


def decode_geometry(layer, node_id) -> Geometry:
    """spatial.decodeGeometry: the Geometry stored on a layer row.  Point
    layers store no WKB — the point is its (xmin, ymin) core columns
    (SimplePointEncoder.decodeGeometry parity)."""
    d = _node_row(layer, node_id).asDict()
    if d.get("geom") is not None:
        return from_wkb(bytes(d["geom"]))
    return Geometry.point(float(d["xmin"]), float(d["ymin"]))


def node_as_wkt(layer, node_id) -> str:
    """spatial.nodeAsWKT: the WKT of a layer row's geometry."""
    return to_wkt(decode_geometry(layer, node_id))


def extract_attributes(layer, node_id) -> dict:
    """spatial.extractAttributes: the non-geometry attributes of a layer
    row (everything the geometry encoder did not claim)."""
    row = _node_row(layer, node_id)
    return {k: v for k, v in row.asDict().items() if k not in CORE_COLS}


# --------------------------------------------------------------- encoders
def interleaved_to_wkb_udf():
    """Column fn: interleaved [x0,y0,x1,y1,...] float array → WKB
    LineString (SimplePropertyEncoder.java:49-75 parity: the reference
    stores float32 pairs and decodes to a LineString; coordinates are
    rounded through float32 here so decode round-trips bit-exactly)."""
    from ..geom.wkb import to_wkb

    @F.pandas_udf(T.BinaryType())
    def enc(arrs: pd.Series) -> pd.Series:
        out = []
        for a in arrs:
            if a is None:
                out.append(None)
                continue
            v = np.asarray(a, dtype=np.float32).astype(np.float64)
            if len(v) % 2 or len(v) < 4:
                raise ValueError(
                    "SimpleProperty data must hold >=2 interleaved x,y pairs")
            out.append(to_wkb(Geometry.linestring(v.reshape(-1, 2))))
        return pd.Series(out)

    return enc


def wkb_to_interleaved_udf():
    """Column fn: WKB LineString → interleaved float32 array (the
    SimplePropertyEncoder.decodeGeometry direction)."""
    from ..geom.wkb import from_wkb as _wkb_parse

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def dec(bufs: pd.Series) -> pd.Series:
        out = []
        for b in bufs:
            if b is None:
                out.append(None)
                continue
            g = _wkb_parse(bytes(b))
            out.append(np.asarray(g.data, dtype=np.float64)
                       .reshape(-1).astype(np.float32).tolist())
        return pd.Series(out)

    return dec
