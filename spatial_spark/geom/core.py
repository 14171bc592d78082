"""Core geometry model for the PySpark spatial engine.

A deliberately small, NumPy-backed geometry kernel (no Shapely/JTS in this
environment).  Mirrors the reference's type system:
gtype codes per /root/reference/server-plugin/.../Constants.java:66-72
(GTYPE_GEOMETRY=0, POINT=1, LINESTRING=2, POLYGON=3, MULTIPOINT=4,
MULTILINESTRING=5, MULTIPOLYGON=6).

Representation
--------------
``Geometry`` is a thin immutable wrapper:

* POINT            -> coords = ndarray (2,)
* LINESTRING       -> coords = ndarray (n, 2)
* POLYGON          -> rings  = [ndarray (n, 2), ...]  (ring[0]=shell, rest holes,
                      rings are closed: first == last vertex)
* MULTIPOINT       -> parts  = [Geometry(POINT), ...]
* MULTILINESTRING  -> parts  = [Geometry(LINESTRING), ...]
* MULTIPOLYGON     -> parts  = [Geometry(POLYGON), ...]
* GEOMETRYCOLLECTION (gtype 0) -> parts = [Geometry, ...]

This object only lives *inside* pandas UDF batches; the Spark-side canonical
encoding is WKB bytes in a BinaryType column plus (bbox, gtype) columns,
exactly like the reference persists ``gtype`` + ``bbox`` double[4]
(AbstractGeometryEncoder.java:64-92).
"""

from __future__ import annotations

import numpy as np

GTYPE_GEOMETRY = 0
GTYPE_POINT = 1
GTYPE_LINESTRING = 2
GTYPE_POLYGON = 3
GTYPE_MULTIPOINT = 4
GTYPE_MULTILINESTRING = 5
GTYPE_MULTIPOLYGON = 6

GTYPE_NAMES = {
    GTYPE_GEOMETRY: "GeometryCollection",
    GTYPE_POINT: "Point",
    GTYPE_LINESTRING: "LineString",
    GTYPE_POLYGON: "Polygon",
    GTYPE_MULTIPOINT: "MultiPoint",
    GTYPE_MULTILINESTRING: "MultiLineString",
    GTYPE_MULTIPOLYGON: "MultiPolygon",
}
NAME_GTYPES = {v.upper(): k for k, v in GTYPE_NAMES.items()}

_MULTI_OF = {
    GTYPE_POINT: GTYPE_MULTIPOINT,
    GTYPE_LINESTRING: GTYPE_MULTILINESTRING,
    GTYPE_POLYGON: GTYPE_MULTIPOLYGON,
}


class Geometry:
    __slots__ = ("gtype", "data")

    def __init__(self, gtype: int, data):
        self.gtype = gtype
        self.data = data

    # ---- constructors -------------------------------------------------
    @staticmethod
    def point(x: float, y: float) -> "Geometry":
        return Geometry(GTYPE_POINT, np.array([x, y], dtype=np.float64))

    @staticmethod
    def linestring(coords) -> "Geometry":
        a = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        return Geometry(GTYPE_LINESTRING, a)

    @staticmethod
    def polygon(shell, holes=()) -> "Geometry":
        rings = [_close_ring(np.asarray(shell, dtype=np.float64).reshape(-1, 2))]
        for h in holes:
            rings.append(_close_ring(np.asarray(h, dtype=np.float64).reshape(-1, 2)))
        return Geometry(GTYPE_POLYGON, rings)

    @staticmethod
    def box(xmin, ymin, xmax, ymax) -> "Geometry":
        return Geometry.polygon(
            [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)]
        )

    @staticmethod
    def multi(parts: list) -> "Geometry":
        if not parts:
            return Geometry(GTYPE_GEOMETRY, [])
        kinds = {p.gtype for p in parts}
        if len(kinds) == 1:
            k = kinds.pop()
            if k in _MULTI_OF:
                return Geometry(_MULTI_OF[k], list(parts))
        return Geometry(GTYPE_GEOMETRY, list(parts))

    @staticmethod
    def collection(parts: list) -> "Geometry":
        return Geometry(GTYPE_GEOMETRY, list(parts))

    # ---- structure ----------------------------------------------------
    @property
    def is_multi(self) -> bool:
        return self.gtype in (GTYPE_MULTIPOINT, GTYPE_MULTILINESTRING,
                              GTYPE_MULTIPOLYGON, GTYPE_GEOMETRY)

    def parts(self) -> list:
        """Component geometries (self for simple types)."""
        if self.is_multi:
            return list(self.data)
        return [self]

    def rings(self) -> list:
        assert self.gtype == GTYPE_POLYGON
        return self.data

    @property
    def coords(self) -> np.ndarray:
        assert self.gtype in (GTYPE_POINT, GTYPE_LINESTRING)
        return self.data

    def is_empty(self) -> bool:
        if self.is_multi:
            return len(self.data) == 0 or all(p.is_empty() for p in self.data)
        if self.gtype == GTYPE_POINT:
            return self.data.size == 0 or bool(np.isnan(self.data).any())
        if self.gtype == GTYPE_LINESTRING:
            return len(self.data) == 0
        if self.gtype == GTYPE_POLYGON:
            return len(self.data) == 0 or len(self.data[0]) == 0
        return True

    def dimension(self) -> int:
        """Topological dimension (JTS Geometry.getDimension semantics)."""
        if self.gtype == GTYPE_POINT or self.gtype == GTYPE_MULTIPOINT:
            return 0
        if self.gtype in (GTYPE_LINESTRING, GTYPE_MULTILINESTRING):
            return 1
        if self.gtype in (GTYPE_POLYGON, GTYPE_MULTIPOLYGON):
            return 2
        if self.gtype == GTYPE_GEOMETRY:
            return max((p.dimension() for p in self.data), default=-1)
        return -1

    def num_points(self) -> int:
        if self.gtype == GTYPE_POINT:
            return 0 if self.is_empty() else 1
        if self.gtype == GTYPE_LINESTRING:
            return len(self.data)
        if self.gtype == GTYPE_POLYGON:
            return sum(len(r) for r in self.data)
        return sum(p.num_points() for p in self.data)

    def num_geometries(self) -> int:
        return len(self.data) if self.is_multi else 1

    def all_coords(self) -> np.ndarray:
        """All vertices stacked into one (n,2) array."""
        if self.gtype == GTYPE_POINT:
            return self.data.reshape(1, 2)
        if self.gtype == GTYPE_LINESTRING:
            return self.data
        if self.gtype == GTYPE_POLYGON:
            return np.vstack(self.data) if self.data else np.empty((0, 2))
        arrs = [p.all_coords() for p in self.data]
        return np.vstack(arrs) if arrs else np.empty((0, 2))

    def envelope(self):
        """(xmin, ymin, xmax, ymax) — Envelope.java:22-143 equivalent."""
        c = self.all_coords()
        if len(c) == 0:
            return (np.nan, np.nan, np.nan, np.nan)
        return (float(c[:, 0].min()), float(c[:, 1].min()),
                float(c[:, 0].max()), float(c[:, 1].max()))

    def type_name(self) -> str:
        return GTYPE_NAMES[self.gtype]

    def __repr__(self):
        return f"<Geometry {self.type_name()} pts={self.num_points()}>"

    def __eq__(self, other):
        from .wkt import to_wkt
        return isinstance(other, Geometry) and to_wkt(self) == to_wkt(other)

    def __hash__(self):
        from .wkt import to_wkt
        return hash(to_wkt(self))


def _close_ring(a: np.ndarray) -> np.ndarray:
    if len(a) >= 1 and (a[0] != a[-1]).any():
        a = np.vstack([a, a[:1]])
    return a


def envelopes_intersect(e1, e2) -> bool:
    return not (e1[2] < e2[0] or e2[2] < e1[0] or e1[3] < e2[1] or e2[3] < e1[1])


def envelope_covers(e1, e2) -> bool:
    """e1 covers e2."""
    return e1[0] <= e2[0] and e1[1] <= e2[1] and e1[2] >= e2[2] and e1[3] >= e2[3]
