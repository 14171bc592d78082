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
    from pyspark.sql import functions as F
    row = layer.df().filter(F.col("id") == node_id).first()
    if row is None:
        raise KeyError(f"no node {node_id!r} in layer {layer.name!r}")
    return row


def decode_geometry(layer, node_id) -> Geometry:
    """spatial.decodeGeometry: the Geometry stored on a layer row."""
    return from_wkb(bytes(_node_row(layer, node_id)["geom"]))


def node_as_wkt(layer, node_id) -> str:
    """spatial.nodeAsWKT: the WKT of a layer row's geometry."""
    return to_wkt(decode_geometry(layer, node_id))


def extract_attributes(layer, node_id) -> dict:
    """spatial.extractAttributes: the non-geometry attributes of a layer
    row (everything the geometry encoder did not claim)."""
    row = _node_row(layer, node_id)
    return {k: v for k, v in row.asDict().items() if k not in CORE_COLS}
