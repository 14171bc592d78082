"""Text serializations: GeoJSON / KML / GML (+ parsers for GeoJSON).

Parity targets: pipes/processing/GeoJSON.java:30-49,
KeyholeMarkupLanguage.java:32-56, GML.java:30-49, WellKnownText.java:29-48,
functions/SpatialFunctions.java:46-136 (wktToGeoJson etc.).
"""

from __future__ import annotations

import json

import numpy as np

from .core import (
    GTYPE_GEOMETRY, GTYPE_LINESTRING, GTYPE_MULTILINESTRING, GTYPE_MULTIPOINT,
    GTYPE_MULTIPOLYGON, GTYPE_POINT, GTYPE_POLYGON, Geometry,
)


def _coord(v: float):
    return int(v) if v == int(v) else v


def _pos_list(a: np.ndarray):
    return [[_coord(x), _coord(y)] for x, y in a]


def to_geojson(g: Geometry) -> str:
    return json.dumps(_geojson_obj(g), separators=(",", ":"))


def _geojson_obj(g: Geometry) -> dict:
    t = g.type_name()
    if g.gtype == GTYPE_POINT:
        return {"type": t, "coordinates": [_coord(g.data[0]), _coord(g.data[1])]}
    if g.gtype == GTYPE_LINESTRING:
        return {"type": t, "coordinates": _pos_list(g.data)}
    if g.gtype == GTYPE_POLYGON:
        return {"type": t, "coordinates": [_pos_list(r) for r in g.data]}
    if g.gtype == GTYPE_MULTIPOINT:
        return {"type": t, "coordinates": [[_coord(p.data[0]), _coord(p.data[1])] for p in g.data]}
    if g.gtype == GTYPE_MULTILINESTRING:
        return {"type": t, "coordinates": [_pos_list(p.data) for p in g.data]}
    if g.gtype == GTYPE_MULTIPOLYGON:
        return {"type": t,
                "coordinates": [[_pos_list(r) for r in p.data] for p in g.data]}
    return {"type": "GeometryCollection",
            "geometries": [_geojson_obj(p) for p in g.data]}


def from_geojson(s: str) -> Geometry:
    return _from_obj(json.loads(s))


def _from_obj(o: dict) -> Geometry:
    t = o["type"]
    c = o.get("coordinates")
    if t == "Point":
        return Geometry.point(c[0], c[1])
    if t == "LineString":
        return Geometry.linestring(c)
    if t == "Polygon":
        return Geometry.polygon(c[0], c[1:])
    if t == "MultiPoint":
        return Geometry(GTYPE_MULTIPOINT, [Geometry.point(*p) for p in c])
    if t == "MultiLineString":
        return Geometry(GTYPE_MULTILINESTRING, [Geometry.linestring(l) for l in c])
    if t == "MultiPolygon":
        return Geometry(GTYPE_MULTIPOLYGON,
                        [Geometry.polygon(p[0], p[1:]) for p in c])
    if t == "GeometryCollection":
        return Geometry(GTYPE_GEOMETRY, [_from_obj(gg) for gg in o["geometries"]])
    raise ValueError(f"unknown GeoJSON type {t}")


# ------------------------------------------------------------------- KML
def _kml_coords(a: np.ndarray) -> str:
    return " ".join(f"{_coord(x)},{_coord(y)}" for x, y in a)


def to_kml(g: Geometry) -> str:
    if g.gtype == GTYPE_POINT:
        return f"<Point><coordinates>{_coord(g.data[0])},{_coord(g.data[1])}</coordinates></Point>"
    if g.gtype == GTYPE_LINESTRING:
        return f"<LineString><coordinates>{_kml_coords(g.data)}</coordinates></LineString>"
    if g.gtype == GTYPE_POLYGON:
        parts = [
            "<Polygon>",
            f"<outerBoundaryIs><LinearRing><coordinates>{_kml_coords(g.data[0])}"
            "</coordinates></LinearRing></outerBoundaryIs>",
        ]
        for h in g.data[1:]:
            parts.append(
                f"<innerBoundaryIs><LinearRing><coordinates>{_kml_coords(h)}"
                "</coordinates></LinearRing></innerBoundaryIs>"
            )
        parts.append("</Polygon>")
        return "".join(parts)
    inner = "".join(to_kml(p) for p in g.parts())
    return f"<MultiGeometry>{inner}</MultiGeometry>"


# ------------------------------------------------------------------- GML
def _gml_coords(a: np.ndarray) -> str:
    return " ".join(f"{_coord(x)},{_coord(y)}" for x, y in a)


def to_gml(g: Geometry) -> str:
    if g.gtype == GTYPE_POINT:
        return (f"<gml:Point><gml:coordinates>{_coord(g.data[0])},{_coord(g.data[1])}"
                "</gml:coordinates></gml:Point>")
    if g.gtype == GTYPE_LINESTRING:
        return (f"<gml:LineString><gml:coordinates>{_gml_coords(g.data)}"
                "</gml:coordinates></gml:LineString>")
    if g.gtype == GTYPE_POLYGON:
        parts = [
            "<gml:Polygon>",
            f"<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>{_gml_coords(g.data[0])}"
            "</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>",
        ]
        for h in g.data[1:]:
            parts.append(
                f"<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>{_gml_coords(h)}"
                "</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>"
            )
        parts.append("</gml:Polygon>")
        return "".join(parts)
    inner = "".join(to_gml(p) for p in g.parts())
    return f"<gml:MultiGeometry>{inner}</gml:MultiGeometry>"
