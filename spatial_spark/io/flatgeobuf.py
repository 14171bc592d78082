"""FlatGeobuf 3 source + sink — the lakehouse-side geo interchange leg
(r13, VERDICT r12 ask #8; precedent: the r9 GeoParquet round-trip and
the r12 MVT sink, both built on in-repo wire-format codecs pinned
against the PUBLIC specs' worked layouts).

FlatGeobuf (https://flatgeobuf.org, spec in the public flatgeobuf
repo) is:  8 magic bytes ``fgb\\x03fgb\\x00`` + a size-prefixed
FlatBuffers ``Header`` table (name, envelope, geometry_type, columns,
features_count, index_node_size, crs) + an optional packed Hilbert
R-tree + size-prefixed FlatBuffers ``Feature`` tables (geometry as
``ends``/``xy`` vectors + property bytes keyed by column index).

Everything here is built on a from-scratch FlatBuffers wire-format
layer (``_FBBuilder`` / ``_fb_*`` readers) implementing the PUBLIC
flatbuffers binary spec: little-endian scalars, vtables (uint16 size,
uint16 table-data size, per-field uint16 offsets), tables headed by a
signed-int32 vtable back-offset, vectors/strings as uoffset32 →
[uint32 length][payload].  The builder's bytes are pinned by a
hand-derived golden in tests (the MVT golden-bytes approach).

Scale shape: one ``.fgb`` file is a sequential record stream, so the
SOURCE parallelizes across FILES (one task per file — the shapefile
source's shape); the exporter streams partitions through
``toLocalIterator`` (bounded memory) into one spec-conformant file,
or one file per partition for distributed exports.  Index writing is
omitted (``index_node_size=0`` — the spec's documented no-index mode);
readers that require an index do not exist (the reference
implementations all accept index-free files).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..geom.core import (GTYPE_LINESTRING, GTYPE_MULTILINESTRING,
                         GTYPE_MULTIPOINT, GTYPE_MULTIPOLYGON,
                         GTYPE_POINT, GTYPE_POLYGON, Geometry)

__all__ = ["write_fgb", "read_fgb", "read_fgb_header", "fgb_source",
           "export_fgb", "export_fgb_dir", "import_fgb"]

MAGIC = b"fgb\x03fgb\x00"

# fbs enums (public flatgeobuf schema: header.fbs / feature.fbs)
_COL_BYTE, _COL_UBYTE, _COL_BOOL, _COL_SHORT, _COL_USHORT = range(5)
_COL_INT, _COL_UINT, _COL_LONG, _COL_ULONG = 5, 6, 7, 8
_COL_FLOAT, _COL_DOUBLE, _COL_STRING, _COL_JSON = 9, 10, 11, 12
_COL_DATETIME, _COL_BINARY = 13, 14


# --------------------------------------------------------------------
# FlatBuffers wire format — minimal builder (prepend/bottom-up, the
# canonical algorithm) and reader helpers.
# --------------------------------------------------------------------
class _FBBuilder:
    """Builds a FlatBuffers buffer back-to-front.  Offsets returned by
    the end_* methods are measured from the END of the buffer (the
    standard builder convention); ``output`` reverses into the final
    byte order."""

    def __init__(self):
        self._chunks: list = []      # prepended chunks, newest first
        self._size = 0               # bytes written so far
        self.minalign = 1
        self._vt: list | None = None
        self._obj_end = 0

    # -- low-level ----------------------------------------------------
    def _prepend(self, b: bytes) -> None:
        self._chunks.append(b)
        self._size += len(b)

    def offset(self) -> int:
        return self._size

    def pad(self, n: int) -> None:
        if n:
            self._prepend(b"\x00" * n)

    def prep(self, size: int, additional: int = 0) -> None:
        """Pad so the next ``size``-aligned value lands aligned (from
        the buffer end) after ``additional`` bytes are written."""
        if size > self.minalign:
            self.minalign = size
        align = (~(self._size + additional)) + 1 & (size - 1)
        self.pad(align)

    def push(self, fmt: str, v) -> None:
        b = struct.pack("<" + fmt, v)
        self.prep(len(b))
        self._prepend(b)

    # -- vectors / strings ---------------------------------------------
    def create_string(self, s: str) -> int:
        b = s.encode("utf-8") + b"\x00"
        self.prep(4, len(b))
        self._prepend(b)
        self.push("I", len(b) - 1)
        return self.offset()

    def create_bytes(self, b: bytes) -> int:
        self.prep(4, len(b))
        self._prepend(bytes(b))
        self.push("I", len(b))
        return self.offset()

    def create_scalar_vector(self, fmt: str, vals) -> int:
        elem = struct.calcsize("<" + fmt)
        body = b"".join(struct.pack("<" + fmt, v) for v in vals)
        self.prep(4, len(body))
        self.prep(elem, len(body))
        self._prepend(body)
        self.push("I", len(vals))
        return self.offset()

    def create_offset_vector(self, offs: list) -> int:
        self.prep(4, 4 * len(offs))
        for o in reversed(offs):
            # uoffset relative to the field position
            self.push("I", self.offset() - o + 4)
        self.push("I", len(offs))
        return self.offset()

    # -- tables ---------------------------------------------------------
    def start_table(self, n_fields: int) -> None:
        self._vt = [0] * n_fields
        self._obj_end = self.offset()

    def slot_scalar(self, idx: int, fmt: str, v, default=0) -> None:
        if v == default:
            return
        self.push(fmt, v)
        self._vt[idx] = self.offset()

    def slot_offset(self, idx: int, off: int | None) -> None:
        if not off:
            return
        self.prep(4)
        self.push("I", self.offset() - off + 4)
        self._vt[idx] = self.offset()

    def end_table(self) -> int:
        vt = self._vt
        self._vt = None
        # placeholder soffset
        self.prep(4)
        self._prepend(b"\x00\x00\x00\x00")
        table_off = self.offset()
        # trim trailing absent fields
        while vt and vt[-1] == 0:
            vt.pop()
        for v in reversed(vt):
            self.push("H", (table_off - v) if v else 0)
        self.push("H", table_off - self._obj_end)
        self.push("H", (len(vt) + 2) * 2)
        vt_off = self.offset()
        # patch the placeholder: soffset = vt_off - table_off (the
        # placeholder chunk sits len-4 bytes behind vt writes; find it
        # by scanning chunk sizes)
        target = self._size - table_off   # byte index from buffer END
        self._patch_i32(target, vt_off - table_off)
        return table_off

    def _patch_i32(self, from_end: int, value: int) -> None:
        """Overwrite 4 bytes located ``from_end`` bytes before the
        buffer end position ``self._size`` (i.e. at offset-from-end
        ``self._size - from_end``)... chunks are newest-first."""
        # position measured from the FRONT of the final buffer:
        idx = from_end
        pos = 0
        for ci in range(len(self._chunks) - 1, -1, -1):
            c = self._chunks[ci]
            if pos + len(c) > idx:
                b = bytearray(c)
                b[idx - pos:idx - pos + 4] = struct.pack("<i", value)
                self._chunks[ci] = bytes(b)
                return
            pos += len(c)
        raise AssertionError("patch out of range")

    def finish(self, root: int, size_prefixed: bool = False) -> bytes:
        self.prep(self.minalign, 8 if size_prefixed else 4)
        self.prep(4)
        self.push("I", self.offset() - root + 4)
        if size_prefixed:
            self.push("I", self.offset())
        out = bytearray()
        for c in reversed(self._chunks):
            out += c
        return bytes(out)


def _fb_root(buf: bytes, pos: int = 0) -> int:
    return pos + struct.unpack_from("<I", buf, pos)[0]


def _fb_field(buf: bytes, table: int, idx: int) -> int | None:
    """Absolute position of field ``idx`` in ``table``, or None."""
    vt = table - struct.unpack_from("<i", buf, table)[0]
    vt_size = struct.unpack_from("<H", buf, vt)[0]
    slot = 4 + 2 * idx
    if slot >= vt_size:
        return None
    rel = struct.unpack_from("<H", buf, vt + slot)[0]
    return table + rel if rel else None


def _fb_scalar(buf, table, idx, fmt, default=0):
    p = _fb_field(buf, table, idx)
    return default if p is None else struct.unpack_from("<" + fmt,
                                                        buf, p)[0]


def _fb_indirect(buf, table, idx) -> int | None:
    p = _fb_field(buf, table, idx)
    if p is None:
        return None
    return p + struct.unpack_from("<I", buf, p)[0]


def _fb_string(buf, table, idx) -> str | None:
    v = _fb_indirect(buf, table, idx)
    if v is None:
        return None
    n = struct.unpack_from("<I", buf, v)[0]
    return buf[v + 4:v + 4 + n].decode("utf-8")


def _fb_vector(buf, table, idx, fmt) -> list | None:
    v = _fb_indirect(buf, table, idx)
    if v is None:
        return None
    n = struct.unpack_from("<I", buf, v)[0]
    return list(struct.unpack_from(f"<{n}{fmt}", buf, v + 4))


def _fb_offset_vector(buf, table, idx) -> list:
    v = _fb_indirect(buf, table, idx)
    if v is None:
        return []
    n = struct.unpack_from("<I", buf, v)[0]
    out = []
    for i in range(n):
        p = v + 4 + 4 * i
        out.append(p + struct.unpack_from("<I", buf, p)[0])
    return out


# --------------------------------------------------------------------
# FlatGeobuf geometry <-> engine Geometry
# --------------------------------------------------------------------
def _geom_to_fgb(g: Geometry):
    """(type, ends, xy, parts) — parts only for multipolygon/collection
    (per spec, MultiPolygon uses nested part geometries; polygon rings
    ride ``ends``)."""
    t = g.gtype
    if t == GTYPE_POINT:
        return 1, [], [float(g.data[0]), float(g.data[1])], None
    if t == GTYPE_LINESTRING:
        return 2, [], [float(v) for p in g.data for v in p], None
    if t == GTYPE_POLYGON:
        xy, ends, acc = [], [], 0
        for ring in g.data:
            acc += len(ring)
            ends.append(acc)
            xy.extend(float(v) for p in ring for v in p)
        return 3, ends if len(g.data) > 1 else [], xy, None
    if t == GTYPE_MULTIPOINT:
        return 4, [], [float(v) for p in g.data for v in p.data], None
    if t == GTYPE_MULTILINESTRING:
        xy, ends, acc = [], [], 0
        for part in g.data:
            acc += len(part.data)
            ends.append(acc)
            xy.extend(float(v) for p in part.data for v in p)
        return 5, ends if len(g.data) > 1 else [], xy, None
    if t == GTYPE_MULTIPOLYGON:
        return 6, None, None, [_geom_to_fgb(p) for p in g.data]
    raise ValueError(f"FlatGeobuf: unsupported gtype {t}")


def _fgb_to_geom(gtype: int, ends, xy, parts) -> Geometry:
    pts = np.asarray(xy or [], dtype=np.float64).reshape(-1, 2)
    if gtype == 1:
        return Geometry.point(float(pts[0, 0]), float(pts[0, 1]))
    if gtype == 2:
        return Geometry.linestring(pts)
    if gtype == 3:
        bounds = ends or [len(pts)]
        rings, lo = [], 0
        for hi in bounds:
            rings.append(pts[lo:hi])
            lo = hi
        return Geometry.polygon(rings[0], rings[1:])
    if gtype == 4:
        return Geometry.multi([Geometry.point(float(x), float(y))
                               for x, y in pts])
    if gtype == 5:
        bounds = ends or [len(pts)]
        out, lo = [], 0
        for hi in bounds:
            out.append(Geometry.linestring(pts[lo:hi]))
            lo = hi
        return Geometry.multi(out)
    if gtype == 6:
        return Geometry.multi(parts)
    raise ValueError(f"FlatGeobuf: unsupported geometry type {gtype}")


def _build_geometry(b: _FBBuilder, g: Geometry) -> int:
    t, ends, xy, parts = _geom_to_fgb(g)
    part_offs = None
    if parts is not None:
        offs = []
        for pt, pends, pxy, _ in parts:
            ends_off = (b.create_scalar_vector("I", pends)
                        if pends else None)
            xy_off = b.create_scalar_vector("d", pxy)
            b.start_table(8)
            b.slot_offset(0, ends_off)
            b.slot_offset(1, xy_off)
            b.slot_scalar(6, "B", pt, 0)
            offs.append(b.end_table())
        part_offs = b.create_offset_vector(offs)
    ends_off = b.create_scalar_vector("I", ends) if ends else None
    xy_off = b.create_scalar_vector("d", xy) if xy else None
    b.start_table(8)
    b.slot_offset(0, ends_off)
    b.slot_offset(1, xy_off)
    b.slot_scalar(6, "B", t, 0)
    b.slot_offset(7, part_offs)
    return b.end_table()


def _read_geometry(buf: bytes, gtab: int,
                   default_type: int = 0) -> Geometry:
    """``default_type``: conformant writers may omit the per-feature
    type when the header declares a uniform one, and the per-PART type
    inside a MultiPolygon (implied Polygon) — default it in."""
    t = _fb_scalar(buf, gtab, 6, "B", 0) or default_type
    parts_pos = _fb_offset_vector(buf, gtab, 7)
    if parts_pos:
        part_default = 3 if t == 6 else 0
        parts = [_read_geometry(buf, p, part_default)
                 for p in parts_pos]
        return _fgb_to_geom(t, None, None, parts)
    ends = _fb_vector(buf, gtab, 0, "I") or []
    xy = _fb_vector(buf, gtab, 1, "d") or []
    return _fgb_to_geom(t, ends, xy, None)


# --------------------------------------------------------------------
# properties: size-prefixed little-endian (uint16 col_index, value)*
# --------------------------------------------------------------------
_PROP_FMT = {_COL_BOOL: "?", _COL_BYTE: "b", _COL_UBYTE: "B",
             _COL_SHORT: "h", _COL_USHORT: "H", _COL_INT: "i",
             _COL_UINT: "I", _COL_LONG: "q", _COL_ULONG: "Q",
             _COL_FLOAT: "f", _COL_DOUBLE: "d"}


def _encode_props(columns: list, props: dict) -> bytes:
    out = bytearray()
    for i, (name, ctype) in enumerate(columns):
        if name not in props or props[name] is None:
            continue
        v = props[name]
        out += struct.pack("<H", i)
        if ctype in _PROP_FMT:
            out += struct.pack("<" + _PROP_FMT[ctype], v)
        elif ctype in (_COL_STRING, _COL_JSON, _COL_DATETIME):
            eb = str(v).encode("utf-8")
            out += struct.pack("<I", len(eb)) + eb
        elif ctype == _COL_BINARY:
            out += struct.pack("<I", len(v)) + bytes(v)
        else:
            raise ValueError(f"FlatGeobuf: column type {ctype}")
    return bytes(out)


def _decode_props(columns: list, raw: bytes) -> dict:
    out: dict = {}
    pos = 0
    while pos < len(raw):
        (i,) = struct.unpack_from("<H", raw, pos)
        pos += 2
        name, ctype = columns[i]
        if ctype in _PROP_FMT:
            fmt = _PROP_FMT[ctype]
            (v,) = struct.unpack_from("<" + fmt, raw, pos)
            pos += struct.calcsize("<" + fmt)
        elif ctype in (_COL_STRING, _COL_JSON, _COL_DATETIME,
                       _COL_BINARY):
            (n,) = struct.unpack_from("<I", raw, pos)
            pos += 4
            v = raw[pos:pos + n]
            pos += n
            if ctype != _COL_BINARY:
                v = v.decode("utf-8")
        else:
            raise ValueError(f"FlatGeobuf: column type {ctype}")
        out[name] = v
    return out


# --------------------------------------------------------------------
# file-level encode / decode
# --------------------------------------------------------------------
def _encode_feature(g: Geometry, props: dict, columns: list) -> bytes:
    """One size-prefixed Feature record (the unit a streaming writer
    appends)."""
    fb = _FBBuilder()
    props_off = (fb.create_bytes(_encode_props(columns, props))
                 if props else None)
    geom_off = _build_geometry(fb, g) if g is not None else None
    fb.start_table(3)
    fb.slot_offset(0, geom_off)
    fb.slot_offset(1, props_off)
    feat = fb.finish(fb.end_table())
    return struct.pack("<I", len(feat)) + feat


def _encode_header(name: str, columns: list, geometry_type: int,
                   crs_code: int, env, n_features: int) -> bytes:
    """magic + size-prefixed Header table (no index —
    index_node_size=0, the spec's documented no-index mode)."""
    hb = _FBBuilder()
    col_offs = []
    for cname, ctype in columns:
        noff = hb.create_string(cname)
        hb.start_table(11)
        hb.slot_offset(0, noff)
        hb.slot_scalar(1, "B", ctype, 0)
        # nullable (field 8, default true) left default
        col_offs.append(hb.end_table())
    cols_off = hb.create_offset_vector(col_offs) if col_offs else None
    org = hb.create_string("EPSG")
    hb.start_table(6)
    hb.slot_offset(0, org)
    hb.slot_scalar(1, "i", int(crs_code), 0)
    crs_off = hb.end_table()
    name_off = hb.create_string(name)
    env_off = (hb.create_scalar_vector("d", list(env))
               if env is not None else None)
    hb.start_table(14)
    hb.slot_offset(0, name_off)
    hb.slot_offset(1, env_off)
    hb.slot_scalar(2, "B", int(geometry_type), 0)
    hb.slot_offset(7, cols_off)
    hb.slot_scalar(8, "Q", int(n_features), 0)
    hb.slot_scalar(9, "H", 0, 16)         # index_node_size=0: no index
    hb.slot_offset(10, crs_off)
    header = hb.finish(hb.end_table())
    return bytes(MAGIC) + struct.pack("<I", len(header)) + header


def write_fgb(features: list, name: str = "layer", columns: list = (),
              geometry_type: int = 0, crs_code: int = 4326) -> bytes:
    """Encode ``[(Geometry, props_dict), ...]`` into FlatGeobuf bytes.
    ``columns``: [(name, ColumnType int)] in property order;
    ``geometry_type``: the fgb GeometryType for the header (0 =
    Unknown/mixed).  No spatial index is written (index_node_size=0)."""
    env = None
    for g, _ in features:
        if g is None:
            continue
        e = g.envelope()
        env = (e if env is None else
               (min(env[0], e[0]), min(env[1], e[1]),
                max(env[2], e[2]), max(env[3], e[3])))
    out = bytearray(_encode_header(name, columns, geometry_type,
                                   crs_code, env, len(features)))
    for g, props in features:
        out += _encode_feature(g, props, columns)
    return bytes(out)


def _packed_index_size(n_feat: int, node_size: int) -> int:
    """Byte size of the packed Hilbert R-tree the spec's calcTreeSize
    yields (leaf level + DO-WHILE parent levels, 40 bytes/node).  The
    do-while matters: even ONE feature gets a root level above the
    leaf (2 nodes / 80 bytes); the spec clamps node size to >= 2."""
    ns = max(int(node_size), 2)
    n, num_nodes = n_feat, n_feat
    while True:
        n = (n + ns - 1) // ns
        num_nodes += n
        if n == 1:
            break
    return num_nodes * 40


def read_fgb(data) -> dict:
    """Decode FlatGeobuf bytes (or a path) → {"name", "crs_code",
    "geometry_type", "envelope", "columns", "features":
    [(Geometry, props_dict)]}.  Skips a packed Hilbert index when the
    header declares one (node size + feature count give its extent —
    the spec's formula for the static packed tree size)."""
    if isinstance(data, (str, os.PathLike)):
        with open(data, "rb") as f:
            data = f.read()
    if data[:8] != MAGIC:
        raise ValueError("FlatGeobuf: bad magic (not an fgb 3 file)")
    pos = 8
    (hlen,) = struct.unpack_from("<I", data, pos)
    pos += 4
    hbuf = data[pos:pos + hlen]
    pos += hlen
    h = _fb_root(hbuf)
    name = _fb_string(hbuf, h, 0) or ""
    envelope = _fb_vector(hbuf, h, 1, "d")
    gtype = _fb_scalar(hbuf, h, 2, "B", 0)
    columns = []
    for c in _fb_offset_vector(hbuf, h, 7):
        columns.append((_fb_string(hbuf, c, 0) or "",
                        _fb_scalar(hbuf, c, 1, "B", 0)))
    n_feat = _fb_scalar(hbuf, h, 8, "Q", 0)
    node_size = _fb_scalar(hbuf, h, 9, "H", 16)
    crs_tab = _fb_indirect(hbuf, h, 10)
    crs_code = _fb_scalar(hbuf, crs_tab, 1, "i", 0) if crs_tab else 0
    if node_size > 0 and n_feat > 0:
        pos += _packed_index_size(n_feat, node_size)
    feats = []
    while pos < len(data) and len(feats) < (n_feat or 1 << 62):
        (flen,) = struct.unpack_from("<I", data, pos)
        pos += 4
        fbuf = data[pos:pos + flen]
        pos += flen
        ft = _fb_root(fbuf)
        gtab = _fb_indirect(fbuf, ft, 0)
        geom = (_read_geometry(fbuf, gtab, gtype)
                if gtab is not None else None)
        praw = _fb_vector(fbuf, ft, 1, "B")
        props = _decode_props(columns, bytes(praw)) if praw else {}
        feats.append((geom, props))
    return {"name": name, "crs_code": crs_code, "geometry_type": gtype,
            "envelope": envelope, "columns": columns, "features": feats}


# --------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------
_SPARK_COL_TYPES = {_COL_BOOL: "boolean", _COL_BYTE: "tinyint",
                    _COL_UBYTE: "smallint", _COL_SHORT: "smallint",
                    _COL_USHORT: "int", _COL_INT: "int",
                    _COL_UINT: "bigint", _COL_LONG: "bigint",
                    _COL_ULONG: "bigint", _COL_FLOAT: "float",
                    _COL_DOUBLE: "double", _COL_STRING: "string",
                    _COL_JSON: "string", _COL_DATETIME: "string",
                    _COL_BINARY: "binary"}


def read_fgb_header(path: str) -> dict:
    """Decode ONLY the magic + Header table of a ``.fgb`` file (a few
    hundred bytes — no feature reads).  The planning primitive: at
    100 TB the source prunes whole FILES from their header envelopes
    before any task launches."""
    with open(path, "rb") as f:
        head = f.read(12)
        if head[:8] != MAGIC:
            raise ValueError("FlatGeobuf: bad magic (not an fgb 3 file)")
        (hlen,) = struct.unpack_from("<I", head, 8)
        hbuf = f.read(hlen)
    h = _fb_root(hbuf)
    columns = [(_fb_string(hbuf, c, 0) or "",
                _fb_scalar(hbuf, c, 1, "B", 0))
               for c in _fb_offset_vector(hbuf, h, 7)]
    crs_tab = _fb_indirect(hbuf, h, 10)
    return {"name": _fb_string(hbuf, h, 0) or "",
            "envelope": _fb_vector(hbuf, h, 1, "d"),
            "geometry_type": _fb_scalar(hbuf, h, 2, "B", 0),
            "columns": columns,
            "features_count": _fb_scalar(hbuf, h, 8, "Q", 0),
            "index_node_size": _fb_scalar(hbuf, h, 9, "H", 16),
            "crs_code": (_fb_scalar(hbuf, crs_tab, 1, "i", 0)
                         if crs_tab else 0)}


#: below this many files the header pass stays driver-side (a Spark
#: job costs more than a handful of few-hundred-byte reads); above it
#: ONE bounded mapInPandas job reads every header in parallel so
#: driver wall stays flat in file count (100k files = 100k reads that
#: must not run in a serial Python loop).
_HEADER_JOB_THRESHOLD = 8


def _read_headers(spark, paths: list) -> list:
    """Header facts for every file: ``[(path, columns, envelope|None),
    ...]`` in input order.  Distributed when the path list is large —
    the result is bounded (one tuple per file), the I/O is not."""
    if len(paths) <= _HEADER_JOB_THRESHOLD:
        return [(p, (h := read_fgb_header(p))["columns"],
                 h["envelope"]) for p in paths]
    import json as _json

    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("cols_json", T.StringType()),
        T.StructField("env_json", T.StringType()),
    ])

    def read_heads(iter_pdf):
        import pandas as pd
        for pdf in iter_pdf:
            rows = []
            for p in pdf["path"]:
                h = read_fgb_header(p)
                env = h["envelope"]
                rows.append({
                    "path": p,
                    "cols_json": _json.dumps(h["columns"]),
                    "env_json": (_json.dumps(list(env[:4]))
                                 if env and len(env) >= 4 else None)})
            yield pd.DataFrame(rows, columns=["path", "cols_json",
                                              "env_json"])

    npart = max(1, min(len(paths), 256))
    from ..localrel import arrow_local_df
    pdf = (arrow_local_df(spark, [(p,) for p in paths], "path string")
           .repartition(npart))
    by_path = {r["path"]: r for r in pdf.mapInPandas(read_heads,
                                                     schema).collect()}
    out = []
    for p in paths:
        r = by_path[p]
        cols = [(n, t) for n, t in _json.loads(r["cols_json"])]
        env = (_json.loads(r["env_json"])
               if r["env_json"] is not None else None)
        out.append((p, cols, env))
    return out


def fgb_source(spark, paths, bbox=None, manifest=None):
    """Read one or more ``.fgb`` files into a layer-core DataFrame
    (geom WKB + gtype + bbox + attribute columns).  Parallelism is
    per FILE (each task decodes one sequential record stream — the
    shapefile-source shape; a 100 TB corpus is many files).

    ``bbox``: an ``(x0, y0, x1, y1)`` window — files whose envelope
    misses it are pruned BEFORE any parse task launches, and surviving
    files' features are envelope-filtered in the task.  A file without
    a known envelope is always read (prune only on evidence).

    ``manifest`` (r14): the per-file envelope index ``export_fgb_dir``
    returns — a DataFrame (or list of Rows/dicts) with columns
    ``path, xmin, ymin, xmax, ymax``.  When given, file pruning comes
    from the manifest alone (ZERO header reads for pruning; one header
    read total, for the schema).  Without it, headers are read in ONE
    distributed job above ``_HEADER_JOB_THRESHOLD`` files (never a
    serial driver loop), and every file's declared column list is
    validated identical — heterogeneous inputs raise instead of
    silently dropping or nulling columns."""
    from pyspark.sql import types as T

    if isinstance(paths, (str, os.PathLike)):
        paths = [str(paths)]
    paths = [str(p) for p in paths]
    if manifest is not None:
        import json as _json
        if hasattr(manifest, "collect"):
            manifest = manifest.collect()
        manifest = [dict(zip(m.__fields__, m))
                    if hasattr(m, "__fields__") else dict(m)
                    for m in manifest]
        env_by_path = {str(m["path"]): (m["xmin"], m["ymin"],
                                        m["xmax"], m["ymax"])
                       for m in manifest}
        heads = [(p, None, env_by_path.get(p)) for p in paths]
        cj = next((m.get("columns_json") for m in manifest
                   if m.get("columns_json")), None)
        # an r14 manifest carries the declared column list — ZERO
        # header reads to plan; older/foreign manifests fall back to
        # one schema read
        cols = ([(n, t) for n, t in _json.loads(cj)] if cj
                else read_fgb_header(paths[0])["columns"])
    else:
        heads = _read_headers(spark, paths)
        cols = heads[0][1]
        for p, c, _e in heads[1:]:
            if c != cols:
                raise ValueError(
                    "FlatGeobuf: heterogeneous schemas — "
                    f"{paths[0]!r} declares {[n for n, _ in cols]} "
                    f"but {p!r} declares {[n for n, _ in c]}; "
                    "read them as separate sources")
    if bbox is not None:
        x0, y0, x1, y1 = (float(v) for v in bbox)
        paths = [p for p, _c, env in heads
                 if env is None or (env[0] <= x1 and env[2] >= x0
                                    and env[1] <= y1 and env[3] >= y0)]
    fields = [T.StructField("fid", T.LongType()),
              T.StructField("geom", T.BinaryType()),
              T.StructField("gtype", T.IntegerType()),
              T.StructField("xmin", T.DoubleType()),
              T.StructField("ymin", T.DoubleType()),
              T.StructField("xmax", T.DoubleType()),
              T.StructField("ymax", T.DoubleType())]
    schema = T.StructType(fields + [
        T.StructField(n, T._parse_datatype_string(_SPARK_COL_TYPES[t]))
        for n, t in cols])

    win = (tuple(float(v) for v in bbox)
           if bbox is not None else None)

    def parse(iter_pdf):
        import pandas as pd

        from ..geom.wkb import to_wkb
        for pdf in iter_pdf:
            for path in pdf["path"]:
                doc = read_fgb(path)
                rows = []
                for i, (g, props) in enumerate(doc["features"]):
                    if g is None:
                        # spec-legal geometry-less feature: keep its
                        # properties as a null-geom row (a window
                        # can't match what has no extent)
                        if win is not None:
                            continue
                        row = {"fid": i, "geom": None, "gtype": None,
                               "xmin": None, "ymin": None,
                               "xmax": None, "ymax": None}
                        for n, _t in doc["columns"]:
                            row[n] = props.get(n)
                        rows.append(row)
                        continue
                    e = g.envelope()
                    if win is not None and not (
                            e[0] <= win[2] and e[2] >= win[0]
                            and e[1] <= win[3] and e[3] >= win[1]):
                        continue
                    row = {"fid": i, "geom": to_wkb(g),
                           "gtype": g.gtype, "xmin": e[0], "ymin": e[1],
                           "xmax": e[2], "ymax": e[3]}
                    for n, _t in doc["columns"]:
                        row[n] = props.get(n)
                    rows.append(row)
                yield pd.DataFrame(rows, columns=[f.name for f in
                                                  schema.fields])

    if not paths:
        return spark.createDataFrame([], schema)
    from ..localrel import arrow_local_df
    pdf = arrow_local_df(spark, [(p,) for p in paths], "path string") \
        .repartition(len(paths))
    return pdf.mapInPandas(parse, schema)


def export_fgb(df, path: str, name: str = "layer",
               geometry_type: int = 0, crs_code: int = 4326) -> int:
    """Write a layer-core DataFrame (geom WKB + attributes) to ONE
    ``.fgb`` file.  Truly streaming: rows arrive one partition at a
    time (``toLocalIterator``), each feature is ENCODED AND APPENDED
    to a temp record stream as it arrives while the envelope + count
    accumulate, then the header is written and the stream concatenated
    in bounded chunks — driver memory is O(1 feature), never
    O(dataset).  (The header precedes the features in the format, and
    its envelope/count aren't known until the end — hence the temp
    stream.)  For distributed exports use ``export_fgb_dir``.  Returns
    the feature count."""
    from ..geom.wkb import from_wkb

    core = {"geom", "gtype", "xmin", "ymin", "xmax", "ymax", "zkey",
            "fid"}
    attr_fields = [f for f in df.schema.fields if f.name not in core]
    type_map = {"boolean": _COL_BOOL, "integer": _COL_INT,
                "long": _COL_LONG, "float": _COL_FLOAT,
                "double": _COL_DOUBLE, "string": _COL_STRING,
                "binary": _COL_BINARY, "short": _COL_SHORT,
                "byte": _COL_BYTE}
    columns = []
    for f in attr_fields:
        t = type_map.get(f.dataType.typeName())
        if t is None:
            raise ValueError(
                f"FlatGeobuf: unsupported column type {f.dataType} "
                f"for {f.name!r}")
        columns.append((f.name, t))
    env, cnt = None, 0
    tmp = str(path) + ".feats.tmp"
    try:
        with open(tmp, "wb") as tf:
            for r in df.toLocalIterator():
                # spec-legal geometry-less features (fgb_source itself
                # emits them as null-geom rows) round-trip as such
                g = (None if r["geom"] is None
                     else from_wkb(bytes(r["geom"])))
                props = {n: r[n] for n, _ in columns
                         if r[n] is not None}
                tf.write(_encode_feature(g, props, columns))
                if g is not None:
                    e = g.envelope()
                    env = (e if env is None else
                           (min(env[0], e[0]), min(env[1], e[1]),
                            max(env[2], e[2]), max(env[3], e[3])))
                cnt += 1
        with open(path, "wb") as out:
            out.write(_encode_header(name, columns, geometry_type,
                                     crs_code, env, cnt))
            with open(tmp, "rb") as tf:
                while True:
                    chunk = tf.read(1 << 22)
                    if not chunk:
                        break
                    out.write(chunk)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return cnt


def export_fgb_dir(df, out_dir: str, name: str = "layer",
                   geometry_type: int = 0, crs_code: int = 4326):
    """DISTRIBUTED FlatGeobuf export: each partition writes ONE
    spec-conformant ``part-NNNNN.fgb`` into ``out_dir`` from its own
    task (no driver funnel — the 100 TB export shape; read the
    directory back with ``fgb_source`` over the part files).  Returns
    a DataFrame manifest (path, n_features, envelope) — one row per
    non-empty partition.  Column typing rules match ``export_fgb``."""
    import json as _json

    from pyspark.sql import types as T

    core = {"geom", "gtype", "xmin", "ymin", "xmax", "ymax", "zkey",
            "fid"}
    attr_fields = [f for f in df.schema.fields if f.name not in core]
    type_map = {"boolean": _COL_BOOL, "integer": _COL_INT,
                "long": _COL_LONG, "float": _COL_FLOAT,
                "double": _COL_DOUBLE, "string": _COL_STRING,
                "binary": _COL_BINARY, "short": _COL_SHORT,
                "byte": _COL_BYTE}
    columns = []
    for f in attr_fields:
        t = type_map.get(f.dataType.typeName())
        if t is None:
            raise ValueError(
                f"FlatGeobuf: unsupported column type {f.dataType} "
                f"for {f.name!r}")
        columns.append((f.name, t))
    os.makedirs(out_dir, exist_ok=True)
    out_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("n_features", T.LongType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
        # r14: the declared column list rides the manifest so
        # fgb_source(manifest=) plans with ZERO header reads
        T.StructField("columns_json", T.StringType()),
    ])

    def write_part(iter_pdf):
        import pandas as pd
        from pyspark import TaskContext

        from ..geom.wkb import from_wkb
        feats = []
        def present(v):
            if v is None:
                return False
            return not (isinstance(v, float) and v != v)   # NaN
        for pdf in iter_pdf:
            for _, r in pdf.iterrows():
                g = (None if r["geom"] is None
                     else from_wkb(bytes(r["geom"])))
                props = {n: r[n] for n, _t in columns
                         if present(r[n])}
                feats.append((g, props))
        if not feats:
            yield pd.DataFrame(
                {c.name: [] for c in out_schema.fields})
            return
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.fgb")
        buf = write_fgb(feats, name=name, columns=columns,
                        geometry_type=geometry_type,
                        crs_code=crs_code)
        with open(path, "wb") as f:
            f.write(buf)
        env = None
        for g, _ in feats:
            if g is None:
                continue       # geometry-less features carry no bbox
            e = g.envelope()
            env = (e if env is None else
                   (min(env[0], e[0]), min(env[1], e[1]),
                    max(env[2], e[2]), max(env[3], e[3])))
        if env is None:
            env = (float("nan"),) * 4
        yield pd.DataFrame({"path": [path], "n_features": [len(feats)],
                            "xmin": [env[0]], "ymin": [env[1]],
                            "xmax": [env[2]], "ymax": [env[3]],
                            "columns_json": [_json.dumps(
                                [list(c) for c in columns])]})

    return df.mapInPandas(write_part, out_schema)


def import_fgb(ctx, path: str, layer_name: str):
    """spatial.importShapefileToLayer-style import for ``.fgb``:
    decode driver-side, bulk-write a WKB layer (the shapefile import's
    shape — FlatGeobuf's CRS rides the header; only EPSG:4326 /
    unspecified import verbatim, other codes refuse until transformed
    by the caller)."""
    doc = read_fgb(path)
    if doc["crs_code"] not in (0, 4326):
        raise ValueError(
            f"FlatGeobuf: layer CRS EPSG:{doc['crs_code']} — transform "
            "to WGS84 before import (st_transform)")
    from ..geom.wkb import to_wkb
    spark = ctx.spark
    layer = ctx.create_layer(layer_name, encoder="wkb")
    cols = doc["columns"]
    rows = []
    for i, (g, props) in enumerate(doc["features"]):
        if g is None:
            # spec-legal geometry-less feature: a Layer is a set of
            # geometries, so these are skipped on import (fgb_source
            # keeps them as null-geom rows for users who need them)
            continue
        rows.append(tuple([i, bytearray(to_wkb(g))]
                          + [props.get(n) for n, _ in cols]))
    schema = "id long, geom binary" + "".join(
        f", {n} {_SPARK_COL_TYPES[t]}" for n, t in cols)
    layer.add(spark.createDataFrame(rows, schema))
    return layer
