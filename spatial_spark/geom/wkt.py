"""WKT reader/writer for the kernel (WKTGeometryEncoder.java:31-58 parity).

Output format matches JTS WKTWriter conventions closely enough for tests:
uppercase tags, ``POINT (1 2)``, ``POLYGON ((...))``, ``EMPTY`` for empties.
Numbers are rendered via repr-trimming: integral values lose the trailing
``.0`` (JTS also writes ``1`` not ``1.0``).
"""

from __future__ import annotations

import re

import numpy as np

from .core import (
    GTYPE_GEOMETRY, GTYPE_LINESTRING, GTYPE_MULTILINESTRING, GTYPE_MULTIPOINT,
    GTYPE_MULTIPOLYGON, GTYPE_POINT, GTYPE_POLYGON, Geometry,
)


def _num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _coords_txt(a: np.ndarray) -> str:
    return ", ".join(f"{_num(x)} {_num(y)}" for x, y in a)


def to_wkt(g: Geometry) -> str:
    t = g.type_name().upper()
    if g.is_empty():
        return f"{t} EMPTY"
    if g.gtype == GTYPE_POINT:
        return f"POINT ({_num(g.data[0])} {_num(g.data[1])})"
    if g.gtype == GTYPE_LINESTRING:
        return f"LINESTRING ({_coords_txt(g.data)})"
    if g.gtype == GTYPE_POLYGON:
        rings = ", ".join(f"({_coords_txt(r)})" for r in g.data)
        return f"POLYGON ({rings})"
    if g.gtype == GTYPE_MULTIPOINT:
        pts = ", ".join(f"({_num(p.data[0])} {_num(p.data[1])})" for p in g.data)
        return f"MULTIPOINT ({pts})"
    if g.gtype == GTYPE_MULTILINESTRING:
        ls = ", ".join(f"({_coords_txt(p.data)})" for p in g.data)
        return f"MULTILINESTRING ({ls})"
    if g.gtype == GTYPE_MULTIPOLYGON:
        ps = ", ".join(
            "(" + ", ".join(f"({_coords_txt(r)})" for r in p.data) + ")" for p in g.data
        )
        return f"MULTIPOLYGON ({ps})"
    inner = ", ".join(to_wkt(p) for p in g.data)
    return f"GEOMETRYCOLLECTION ({inner})"


_TOKEN = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?)")


class _Parser:
    def __init__(self, s: str):
        self.toks = _TOKEN.findall(s)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"WKT parse error: expected {t!r} got {got!r}")

    def coords(self):
        pts = []
        self.expect("(")
        while True:
            x = float(self.next())
            y = float(self.next())
            # tolerate Z/M ordinates: skip extra numbers
            while self.peek() not in (",", ")"):
                self.next()
            pts.append((x, y))
            if self.next() == ")":
                break
        return np.array(pts, dtype=np.float64)

    def ring_list(self):
        rings = []
        self.expect("(")
        while True:
            rings.append(self.coords())
            if self.next() == ")":
                break
        return rings

    def geometry(self) -> Geometry:
        tag = self.next().upper()
        if tag in ("Z", "M", "ZM"):
            tag = self.next().upper()
        if self.peek() is not None and self.peek().upper() == "EMPTY":
            self.next()
            return _empty(tag)
        if tag == "POINT":
            c = self.coords()
            return Geometry(GTYPE_POINT, c[0])
        if tag == "LINESTRING":
            return Geometry(GTYPE_LINESTRING, self.coords())
        if tag == "POLYGON":
            return Geometry(GTYPE_POLYGON, [_close(r) for r in self.ring_list()])
        if tag == "MULTIPOINT":
            self.expect("(")
            parts = []
            while True:
                if self.peek() == "(":
                    c = self.coords()
                    parts.append(Geometry(GTYPE_POINT, c[0]))
                    nxt = self.next()
                else:  # bare  MULTIPOINT (1 2, 3 4)
                    x = float(self.next()); y = float(self.next())
                    parts.append(Geometry.point(x, y))
                    nxt = self.next()
                if nxt == ")":
                    break
            return Geometry(GTYPE_MULTIPOINT, parts)
        if tag == "MULTILINESTRING":
            return Geometry(
                GTYPE_MULTILINESTRING,
                [Geometry(GTYPE_LINESTRING, r) for r in self.ring_list()],
            )
        if tag == "MULTIPOLYGON":
            self.expect("(")
            polys = []
            while True:
                polys.append(Geometry(GTYPE_POLYGON, [_close(r) for r in self.ring_list()]))
                if self.next() == ")":
                    break
            return Geometry(GTYPE_MULTIPOLYGON, polys)
        if tag == "GEOMETRYCOLLECTION":
            self.expect("(")
            parts = []
            while True:
                parts.append(self.geometry())
                if self.next() == ")":
                    break
            return Geometry(GTYPE_GEOMETRY, parts)
        raise ValueError(f"unknown WKT tag {tag!r}")


def _close(a: np.ndarray) -> np.ndarray:
    if len(a) and (a[0] != a[-1]).any():
        a = np.vstack([a, a[:1]])
    return a


def _empty(tag: str) -> Geometry:
    from .core import NAME_GTYPES
    gt = NAME_GTYPES[tag]
    if gt == GTYPE_POINT:
        return Geometry(GTYPE_POINT, np.array([np.nan, np.nan]))
    if gt == GTYPE_LINESTRING:
        return Geometry(GTYPE_LINESTRING, np.empty((0, 2)))
    if gt == GTYPE_POLYGON:
        return Geometry(GTYPE_POLYGON, [])
    return Geometry(gt, [])


def from_wkt(s: str) -> Geometry:
    return _Parser(s).geometry()
