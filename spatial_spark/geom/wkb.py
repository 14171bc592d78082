"""ISO WKB reader/writer — the canonical Spark-side geometry encoding.

Parity target: WKBGeometryEncoder (reference encoders/WKBGeometryEncoder.java:31-58)
which delegates to JTS WKBReader/WKBWriter.  We emit little-endian 2D WKB,
and read either endianness, skipping Z/M ordinates if flagged (EWKB-style
high bits and ISO +1000/+2000/+3000 type offsets are both tolerated).
"""

from __future__ import annotations

import struct

import numpy as np

from .core import (
    GTYPE_GEOMETRY, GTYPE_LINESTRING, GTYPE_MULTILINESTRING, GTYPE_MULTIPOINT,
    GTYPE_MULTIPOLYGON, GTYPE_POINT, GTYPE_POLYGON, Geometry,
)

_WKB_OF_GTYPE = {
    GTYPE_POINT: 1, GTYPE_LINESTRING: 2, GTYPE_POLYGON: 3,
    GTYPE_MULTIPOINT: 4, GTYPE_MULTILINESTRING: 5, GTYPE_MULTIPOLYGON: 6,
    GTYPE_GEOMETRY: 7,
}
_GTYPE_OF_WKB = {v: k for k, v in _WKB_OF_GTYPE.items()}


def to_wkb(g: Geometry) -> bytes:
    out = bytearray()
    _write(g, out)
    return bytes(out)


def _write(g: Geometry, out: bytearray) -> None:
    out += b"\x01"  # little endian
    out += struct.pack("<I", _WKB_OF_GTYPE[g.gtype])
    if g.gtype == GTYPE_POINT:
        if g.is_empty():
            out += struct.pack("<dd", float("nan"), float("nan"))
        else:
            out += struct.pack("<dd", float(g.data[0]), float(g.data[1]))
    elif g.gtype == GTYPE_LINESTRING:
        _write_coords(g.data, out)
    elif g.gtype == GTYPE_POLYGON:
        out += struct.pack("<I", len(g.data))
        for r in g.data:
            _write_coords(r, out)
    else:
        out += struct.pack("<I", len(g.data))
        for p in g.data:
            _write(p, out)


def _write_coords(a: np.ndarray, out: bytearray) -> None:
    out += struct.pack("<I", len(a))
    out += np.ascontiguousarray(a, dtype="<f8").tobytes()


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geometry(self) -> Geometry:
        endian = "<" if self.buf[self.pos] == 1 else ">"
        self.pos += 1
        (raw,) = struct.unpack_from(endian + "I", self.buf, self.pos)
        self.pos += 4
        # ISO: type = base + 1000*Z + 2000*M + 3000*ZM ; EWKB: high bits
        base = raw & 0x0FFFFFFF
        dims = 2
        if raw & 0x80000000:
            dims += 1
        if raw & 0x40000000:
            dims += 1
        if base >= 1000:
            iso = base // 1000
            if iso in (1, 3):
                dims += 1
            if iso in (2, 3):
                dims += 1
            base = base % 1000
        if raw & 0x20000000:  # EWKB SRID flag
            self.pos += 4
        gt = _GTYPE_OF_WKB[base]
        if gt == GTYPE_POINT:
            vals = struct.unpack_from(endian + "d" * dims, self.buf, self.pos)
            self.pos += 8 * dims
            return Geometry(GTYPE_POINT, np.array(vals[:2], dtype=np.float64))
        if gt == GTYPE_LINESTRING:
            return Geometry(GTYPE_LINESTRING, self._coords(endian, dims))
        if gt == GTYPE_POLYGON:
            (n,) = struct.unpack_from(endian + "I", self.buf, self.pos)
            self.pos += 4
            return Geometry(GTYPE_POLYGON, [self._coords(endian, dims) for _ in range(n)])
        (n,) = struct.unpack_from(endian + "I", self.buf, self.pos)
        self.pos += 4
        return Geometry(gt, [self.geometry() for _ in range(n)])

    def _coords(self, endian: str, dims: int) -> np.ndarray:
        (n,) = struct.unpack_from(endian + "I", self.buf, self.pos)
        self.pos += 4
        dt = np.dtype(("<f8" if endian == "<" else ">f8"))
        a = np.frombuffer(self.buf, dtype=dt, count=n * dims, offset=self.pos)
        self.pos += 8 * n * dims
        a = a.reshape(-1, dims)[:, :2]
        return np.array(a, dtype=np.float64)


def from_wkb(buf) -> Geometry:
    if buf is None:
        return None
    return _Reader(bytes(buf)).geometry()
