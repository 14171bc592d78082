"""Mapbox Vector Tile (MVT 2.1) sink — the modern tile-export path.

The reference renders layers to PNG via GeoTools/SLD
(StyledImageExporter — io/render.py covers that parity); production
map stacks serve VECTOR tiles instead.  This module implements the
public vector-tile-spec 2.1 wire format from scratch on the repo's
protobuf primitives (io/osmpbf.py — varint/zigzag/fields):

  * ``encode_mvt`` / ``decode_mvt``: one tile's Layer message (points,
    linestrings, polygons; command stream MoveTo/LineTo/ClosePath with
    zigzag deltas; keys/values tag tables),
  * ``tile_local_sql``: the tile-index + in-tile integer coordinate
    math as DUAL-ENGINE SQL text (Spark AND DuckDB) so the oracle
    replays the geometry integers exactly,
  * ``mvt_tiles``: DataFrame sink — points grouped per tile with ONE
    shuffle (the tile key), each tile packed by an Arrow batch; output
    (tile_z, tile_x, tile_y, mvt bytes, n_features).

Scale shape: tile assignment and local coordinates are pure codegen
Columns; the only Python is the per-tile protobuf pack over already-
computed integers (applyInPandas, no second shuffle).  100 TB tiling
is exactly this plan with more reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.tiles import MAX_MERC_LAT, tile_xy_sql
from .osmpbf import _fields, _packed, _unzig, _uvarint, _w_bytes, \
    _w_field, _w_uvarint, _zig

__all__ = ["encode_mvt", "decode_mvt", "mvt_tiles",
           "mvt_tiles_geoms", "tile_local_sql"]

_GEOM_TYPES = {1: "point", 2: "linestring", 3: "polygon"}


def tile_local_sql(z: int, lon_sql: str, lat_sql: str,
                   extent: int = 4096) -> tuple:
    """(tile_x, tile_y, px, py) SQL texts — valid in BOTH Spark SQL
    and DuckDB.  px/py are the in-tile integer coordinates the MVT
    geometry carries: floor(extent * (norm * 2^z - tile)), clamped to
    [0, extent-1] (points assigned to the tile lie inside by
    construction; the clamp absorbs the exact-edge float)."""
    n = 1 << z
    tx, ty = tile_xy_sql(z, lon_sql, lat_sql)
    xn = f"((({lon_sql}) + 180.0) / 360.0)"
    lat_c = (f"least(greatest(CAST(({lat_sql}) AS DOUBLE), "
             f"-{MAX_MERC_LAT}), {MAX_MERC_LAT})")
    yn = (f"((1.0 - ln(tan(radians({lat_c})) "
          f"+ 1.0 / cos(radians({lat_c}))) / pi()) / 2.0)")
    px = (f"CAST(least(greatest(floor({extent}.0 * ({xn} * {n}.0 "
          f"- CAST({tx} AS DOUBLE))), 0.0), {extent - 1}.0) AS BIGINT)")
    py = (f"CAST(least(greatest(floor({extent}.0 * ({yn} * {n}.0 "
          f"- CAST({ty} AS DOUBLE))), 0.0), {extent - 1}.0) AS BIGINT)")
    return tx, ty, px, py


def _encode_geometry(gtype: int, parts: list) -> list:
    """Command-integer stream for one feature.  ``parts``: for points
    one list of (x, y); for linestrings a list of paths; for polygons
    a list of rings (first point NOT repeated at the end — ClosePath
    carries the closure)."""
    cmds: list = []
    cx = cy = 0
    if gtype == 1:
        pts = parts[0]
        cmds.append((1 & 0x7) | (len(pts) << 3))        # MoveTo xN
        for x, y in pts:
            cmds += [_zig(x - cx), _zig(y - cy)]
            cx, cy = x, y
        return cmds
    for part in parts:
        if len(part) < 2:
            raise ValueError("MVT: path/ring needs >= 2 points")
        cmds.append((1 & 0x7) | (1 << 3))               # MoveTo x1
        x, y = part[0]
        cmds += [_zig(x - cx), _zig(y - cy)]
        cx, cy = x, y
        cmds.append((2 & 0x7) | ((len(part) - 1) << 3))  # LineTo xK
        for x, y in part[1:]:
            cmds += [_zig(x - cx), _zig(y - cy)]
            cx, cy = x, y
        if gtype == 3:
            cmds.append((7 & 0x7) | (1 << 3))           # ClosePath x1
    return cmds


def _decode_geometry(cmds: list, gtype: int) -> list:
    parts: list = []
    cur: list = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cid, count = cmds[i] & 0x7, cmds[i] >> 3
        i += 1
        if cid in (1, 2):
            if cid == 1 and cur:
                parts.append(cur)
                cur = []
            for _ in range(count):
                cx += _unzig(cmds[i])
                cy += _unzig(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cid == 7:
            parts.append(cur)
            cur = []
        else:
            raise ValueError(f"MVT: unknown command id {cid}")
    if cur:
        parts.append(cur)
    return parts


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _w_field(7, 1 if v else 0)
    if isinstance(v, int):
        return _w_uvarint((6 << 3) | 0) + _w_uvarint(_zig(v))
    if isinstance(v, float):
        import struct
        return _w_uvarint((3 << 3) | 1) + struct.pack("<d", v)
    return _w_bytes(1, str(v).encode("utf-8"))


def _decode_value(buf: bytes):
    import struct
    for field, val in _fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 3:
            return struct.unpack("<d", val)[0]
        if field == 6:
            return _unzig(val)
        if field == 7:
            return bool(val)
        if field == 2:
            return struct.unpack("<f", val)[0]
        if field in (4, 5):
            return val
    return None


def encode_mvt(features: list, name: str = "layer",
               extent: int = 4096) -> bytes:
    """One Tile message holding one Layer.  ``features``: list of
    (feature_id, gtype 1|2|3, parts, tags_dict) — ``parts`` per
    ``_encode_geometry``, ``tags_dict`` str -> str/int/float/bool."""
    keys: list = []
    values: list = []
    kidx: dict = {}
    vidx: dict = {}
    body = bytearray()
    for fid, gtype, parts, tags in features:
        f = bytearray()
        f += _w_field(1, int(fid))
        if tags:
            packed = bytearray()
            for k, v in tags.items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(values)
                    values.append(v)
                packed += _w_uvarint(kidx[k]) + _w_uvarint(vidx[vk])
            body_tags = bytes(packed)
            f += _w_bytes(2, body_tags)
        f += _w_field(3, int(gtype))
        geom = bytearray()
        for c in _encode_geometry(gtype, parts):
            geom += _w_uvarint(c)
        f += _w_bytes(4, bytes(geom))
        body += _w_bytes(2, bytes(f))
    layer = bytearray()
    layer += _w_field(15, 2)                         # version
    layer += _w_bytes(1, name.encode("utf-8"))
    layer += bytes(body)
    for k in keys:
        layer += _w_bytes(3, k.encode("utf-8"))
    for v in values:
        layer += _w_bytes(4, _encode_value(v))
    layer += _w_field(5, int(extent))
    return bytes(_w_bytes(3, bytes(layer)))          # Tile.layers


def _encode_feature_notags(fid: int, gtype: int, parts: list) -> bytes:
    """One UNWRAPPED Feature message for a tag-less feature —
    byte-identical to the feature body ``encode_mvt`` builds when
    ``tags`` is empty (pinned by a test), so per-feature blobs can be
    encoded in parallel and concatenated per tile."""
    f = bytearray()
    f += _w_field(1, int(fid))
    f += _w_field(3, int(gtype))
    geom = bytearray()
    for c in _encode_geometry(gtype, parts):
        geom += _w_uvarint(c)
    f += _w_bytes(4, bytes(geom))
    return bytes(f)


def _assemble_layer_notags(body: bytes, name: str, extent: int) -> bytes:
    """Tile bytes from pre-encoded feature bodies (already
    ``_w_bytes(2, ...)``-wrapped and concatenated in feature order) —
    byte-identical to ``encode_mvt`` with no keys/values tables."""
    layer = bytearray()
    layer += _w_field(15, 2)                         # version
    layer += _w_bytes(1, name.encode("utf-8"))
    layer += bytes(body)
    layer += _w_field(5, int(extent))
    return bytes(_w_bytes(3, bytes(layer)))          # Tile.layers


def decode_mvt(buf: bytes) -> list:
    """Tile bytes -> [{"name", "extent", "version", "features":
    [{"id", "type", "parts", "tags"}]}]."""
    out = []
    for field, val in _fields(buf):
        if field != 3:
            continue
        name, extent, version = "", 4096, None
        keys: list = []
        values: list = []
        raw_features: list = []
        for lf, lv in _fields(val):
            if lf == 15:
                version = lv
            elif lf == 1:
                name = lv.decode("utf-8")
            elif lf == 2:
                raw_features.append(lv)
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                values.append(_decode_value(lv))
            elif lf == 5:
                extent = lv
        feats = []
        for fb in raw_features:
            fid, gtype, cmds, tag_ids = None, None, [], []
            for ff, fv in _fields(fb):
                if ff == 1:
                    fid = fv
                elif ff == 2:
                    tag_ids = _packed(fv)
                elif ff == 3:
                    gtype = fv
                elif ff == 4:
                    cmds = _packed(fv)
            tags = {keys[tag_ids[i]]: values[tag_ids[i + 1]]
                    for i in range(0, len(tag_ids), 2)}
            feats.append({"id": fid, "type": _GEOM_TYPES.get(gtype),
                          "parts": _decode_geometry(cmds, gtype),
                          "tags": tags})
        out.append({"name": name, "extent": extent, "version": version,
                    "features": feats})
    return out


def mvt_tiles(df: DataFrame, z: int, lon_col: str = "lon",
              lat_col: str = "lat", id_col: str = "id",
              layer_name: str = "layer", extent: int = 4096) -> DataFrame:
    """Point-feature MVT tiles at zoom ``z``: one row per non-empty
    tile — (tile_z, tile_x, tile_y, mvt bytes, n_features).  Tile
    assignment and in-tile integer coordinates are codegen Columns
    (tile_local_sql — the identical text the DuckDB oracle runs); the
    per-tile protobuf pack is the only Python, over already-computed
    integers."""
    tx, ty, px, py = tile_local_sql(z, lon_col, lat_col, extent)
    staged = df.select(
        F.col(id_col).cast("long").alias("fid"),
        F.expr(tx).alias("tile_x"), F.expr(ty).alias("tile_y"),
        F.expr(px).alias("px"), F.expr(py).alias("py"))
    out_schema = T.StructType([
        T.StructField("tile_z", T.IntegerType()),
        T.StructField("tile_x", T.LongType()),
        T.StructField("tile_y", T.LongType()),
        T.StructField("mvt", T.BinaryType()),
        T.StructField("n_features", T.LongType()),
    ])

    def pack(key, pdf):
        import pandas as pd
        pdf = pdf.sort_values("fid")
        feats = [(int(r.fid), 1, [[(int(r.px), int(r.py))]], {})
                 for r in pdf.itertuples()]
        buf = encode_mvt(feats, name=layer_name, extent=extent)
        return pd.DataFrame({
            "tile_z": [z], "tile_x": [key[0]], "tile_y": [key[1]],
            "mvt": [bytearray(buf)], "n_features": [len(feats)]})

    return (_spread_tiles(staged, z)
            .groupBy("tile_x", "tile_y").applyInPandas(pack, out_schema))


def _spread_tiles(staged: DataFrame, z: int) -> DataFrame:
    """Pin the pack stage's parallelism to the tile count.

    The per-(tile) pack work is Python CPU, not bytes: AQE's size-based
    partition coalescing sees a few MB of staged rows and folds the
    whole clip+encode stage onto 1-2 tasks (measured: the z=2 polygon
    gate ran its 16 tiles in 2 tasks, 5.6s wall).  An explicit hash
    repartition on the group key keeps min(4^z, 4x cores)-way
    parallelism — it satisfies the groupBy's clustered distribution, so
    NO second exchange appears — and stays scale-safe: partition count
    derives from the tile grid and the session's parallelism, never a
    constant."""
    n_tiles = 1 << (2 * z)
    par = staged.sparkSession.sparkContext.defaultParallelism
    return staged.repartition(min(n_tiles, max(4 * par, 16)),
                              "tile_x", "tile_y")


def _tile_envelope(z: int, tx: int, ty: int) -> tuple:
    """(lon0, lat0, lon1, lat1) of tile (z, tx, ty) — inverse of the
    web-mercator tile math."""
    import math
    n = 1 << z
    lon0 = tx / n * 360.0 - 180.0
    lon1 = (tx + 1) / n * 360.0 - 180.0

    def lat_of(yn):
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yn))))
    return lon0, lat_of((ty + 1) / n), lon1, lat_of(ty / n)


def _tile_classify(g, lon0: float, lat0: float, lon1: float,
                   lat1: float) -> str | None:
    """INCLUDE_ALL fast classification of a tile envelope against a
    polygonal feature WITHOUT the overlay kernel (the reference's
    envelope-containment short-circuit, SearchIntersectWindow.java:
    56-65): if NO boundary segment's bbox touches the closed tile box,
    the tile is wholly inside or wholly outside the feature — one
    center point-in-polygon test decides which.  Returns ``"inside"``,
    ``"outside"``, or ``None`` (a boundary tile — exact clip needed).
    Conservative by construction: any segment-bbox overlap falls back
    to the exact kernel, so the fast path never changes output."""
    import numpy as np

    from ..geom.algorithms import point_in_polygon
    from ..geom.core import GTYPE_POLYGON
    for p in g.parts():
        if p.gtype != GTYPE_POLYGON:
            return None
        for ring in p.data:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 2:
                continue
            a, b = r[:-1], r[1:]
            hit = ((np.minimum(a[:, 0], b[:, 0]) <= lon1)
                   & (np.maximum(a[:, 0], b[:, 0]) >= lon0)
                   & (np.minimum(a[:, 1], b[:, 1]) <= lat1)
                   & (np.maximum(a[:, 1], b[:, 1]) >= lat0))
            if bool(hit.any()):
                return None
    cx, cy = (lon0 + lon1) / 2.0, (lat0 + lat1) / 2.0
    return "inside" if point_in_polygon(cx, cy, g) == 2 else "outside"


def mvt_tiles_geoms(df: DataFrame, z: int, id_col: str = "id",
                    layer_name: str = "layer",
                    extent: int = 4096) -> DataFrame:
    """POLYGON and LINESTRING MVT tiles: WKB features (layer core
    columns — geom + xmin..ymax) explode to the tiles their bbox
    covers (the PBSM cell trick on the tile grid — pure Columns), then
    each (tile, feature) pair CLIPS against the tile envelope
    (geom/clip.intersection; lines via Liang-Barsky-style clip_line),
    transforms to tile-integer coordinates and packs — the real
    vector-tiling pipeline (clip + encode), one shuffle on the tile
    key.  Polygon rings are oriented per MVT 2.1: exterior rings have
    POSITIVE surveyor-formula area in tile (y-down) coordinates, holes
    negative.  Interior tiles of large polygons skip the overlay
    kernel entirely (``_tile_classify`` — segment-bbox sweep + one
    point-in-polygon test) and emit the tile rectangle; only boundary
    tiles pay the exact clip.  Point inputs belong in ``mvt_tiles``.

    Vertex integerization floors onto the extent grid, so geometry is
    exact only when vertices land on grid points (the test fixtures) —
    production tiling accepts the sub-pixel quantization, as every
    tiler does.

    Execution shape (r15): the per-(tile, feature) clip + feature
    encode runs in a map stage over rows hash-balanced on
    (tile, fid) — a hot tile's features spread across the whole
    cluster instead of serializing on that tile's one task (this
    path's features carry no tags, so feature blobs are
    byte-independent; pinned by a test against ``encode_mvt``).  The
    per-tile stage only concatenates the encoded blobs in fid order
    and wraps the layer header, so the tile-keyed shuffle carries
    encoded bytes, not WKB, and tile skew no longer makes stragglers."""
    import math

    n = 1 << z
    tx_lo = (f"CAST(least(greatest(floor((xmin + 180.0) / 360.0 "
             f"* {n}.0), 0.0), {n - 1}.0) AS BIGINT)")
    tx_hi = (f"CAST(least(greatest(floor((xmax + 180.0) / 360.0 "
             f"* {n}.0), 0.0), {n - 1}.0) AS BIGINT)")

    def yn_expr(lat):
        lat_c = (f"least(greatest(CAST(({lat}) AS DOUBLE), "
                 f"-{MAX_MERC_LAT}), {MAX_MERC_LAT})")
        return (f"((1.0 - ln(tan(radians({lat_c})) "
                f"+ 1.0 / cos(radians({lat_c}))) / pi()) / 2.0)")
    # y grows downward: ymax (north) gives the LOW tile_y
    ty_lo = (f"CAST(least(greatest(floor({yn_expr('ymax')} * {n}.0), "
             f"0.0), {n - 1}.0) AS BIGINT)")
    ty_hi = (f"CAST(least(greatest(floor({yn_expr('ymin')} * {n}.0), "
             f"0.0), {n - 1}.0) AS BIGINT)")
    staged = (df.select(F.col(id_col).cast("long").alias("fid"), "geom",
                        F.expr(tx_lo).alias("_txl"),
                        F.expr(tx_hi).alias("_txh"),
                        F.expr(ty_lo).alias("_tyl"),
                        F.expr(ty_hi).alias("_tyh"))
              .withColumn("tile_x", F.explode(
                  F.sequence(F.col("_txl"), F.col("_txh"))))
              .withColumn("tile_y", F.explode(
                  F.sequence(F.col("_tyl"), F.col("_tyh"))))
              .select("fid", "geom", "tile_x", "tile_y"))
    out_schema = T.StructType([
        T.StructField("tile_z", T.IntegerType()),
        T.StructField("tile_x", T.LongType()),
        T.StructField("tile_y", T.LongType()),
        T.StructField("mvt", T.BinaryType()),
        T.StructField("n_features", T.LongType()),
    ])

    def clip_encode(batches):
        import pandas as pd

        from ..geom import Geometry, from_wkb
        from ..geom.clip import intersection
        env_cache: dict = {}

        def clip_one(geom_wkb, tx, ty):
            ent = env_cache.get((tx, ty))
            if ent is None:
                lon0, lat0, lon1, lat1 = _tile_envelope(z, tx, ty)
                ent = (lon0, lat0, lon1, lat1,
                       Geometry.box(lon0, lat0, lon1, lat1))
                env_cache[(tx, ty)] = ent
            lon0, lat0, lon1, lat1, box = ent

            def local(x, y):
                xn = (x + 180.0) / 360.0
                lat_c = min(max(y, -MAX_MERC_LAT), MAX_MERC_LAT)
                yn = (1.0 - math.log(math.tan(math.radians(lat_c))
                                     + 1.0 / math.cos(math.radians(lat_c)))
                      / math.pi) / 2.0
                px = int(min(max(math.floor(extent * (xn * n - tx)), 0),
                             extent - 1))
                py = int(min(max(math.floor(extent * (yn * n - ty)), 0),
                             extent - 1))
                return px, py

            g = from_wkb(geom_wkb)
            dim = g.dimension()
            if dim == 1:
                clipped = intersection(g, box)
                if clipped.is_empty():
                    return None
                paths = []
                for p in clipped.parts():
                    if p.gtype != 2:
                        continue
                    pts = [local(x, y) for x, y in p.data]
                    dedup = [pt for i, pt in enumerate(pts)
                             if i == 0 or pt != pts[i - 1]]
                    if len(dedup) >= 2:
                        paths.append(dedup)
                return (2, paths) if paths else None
            if dim != 2:
                raise ValueError(
                    "mvt_tiles_geoms packs POLYGON/LINESTRING features;"
                    " route point layers through mvt_tiles")
            cls = _tile_classify(g, lon0, lat0, lon1, lat1)
            if cls == "outside":
                return None
            clipped = box if cls == "inside" else intersection(g, box)
            if clipped.is_empty():
                return None
            rings = []
            for p in clipped.parts():
                if p.gtype != 3:
                    continue
                for ri, ring in enumerate(p.data):
                    pts = [local(x, y) for x, y in ring[:-1]]
                    dedup = [pt for i, pt in enumerate(pts)
                             if i == 0 or pt != pts[i - 1]]
                    while len(dedup) > 1 and dedup[-1] == dedup[0]:
                        dedup.pop()
                    # MVT spec: rings must enclose area — quantization
                    # can collapse a clipped sliver to a zero-area
                    # chain; shoelace == 0 drops it symmetrically
                    area2 = sum(
                        dedup[i][0] * dedup[(i + 1) % len(dedup)][1]
                        - dedup[(i + 1) % len(dedup)][0] * dedup[i][1]
                        for i in range(len(dedup)))
                    if len(dedup) >= 3 and area2 != 0:
                        # MVT 2.1 winding: exterior rings POSITIVE
                        # surveyor-formula area in tile (y-down)
                        # coords, holes negative — the clip kernel
                        # emits shells CCW in lon/lat, which the
                        # y-flip turns negative, so reverse (keeping
                        # the MoveTo start vertex stable)
                        if (area2 > 0) != (ri == 0):
                            dedup = [dedup[0]] + dedup[:0:-1]
                        rings.append(dedup)
            return (3, rings) if rings else None

        for pdf in batches:
            fids, txs, tys, blobs = [], [], [], []
            for r in pdf.itertuples():
                feat = clip_one(bytes(r.geom), int(r.tile_x),
                                int(r.tile_y))
                if feat is None:
                    continue
                gtype, parts = feat
                fids.append(int(r.fid))
                txs.append(int(r.tile_x))
                tys.append(int(r.tile_y))
                blobs.append(_encode_feature_notags(int(r.fid), gtype,
                                                    parts))
            yield pd.DataFrame({"fid": pd.Series(fids, dtype="int64"),
                                "tile_x": pd.Series(txs, dtype="int64"),
                                "tile_y": pd.Series(tys, dtype="int64"),
                                "feat": blobs})

    def assemble(key, pdf):
        import pandas as pd
        body = bytearray()
        for b in pdf.sort_values("fid")["feat"]:
            body += _w_bytes(2, bytes(b))
        buf = _assemble_layer_notags(bytes(body), layer_name, extent)
        return pd.DataFrame({
            "tile_z": [z], "tile_x": [int(key[0])], "tile_y": [int(key[1])],
            "mvt": [bytearray(buf)], "n_features": [len(pdf)]})

    par = df.sparkSession.sparkContext.defaultParallelism
    width = max(par, min(1 << (2 * z), 4 * par))
    encoded = (staged.repartition(width, "tile_x", "tile_y", "fid")
               .mapInPandas(clip_encode,
                            "fid long, tile_x long, tile_y long, "
                            "feat binary"))
    return encoded.groupBy("tile_x", "tile_y").applyInPandas(
        assemble, out_schema)
