"""Probe: MVT INCLUDE_ALL fast path — clip calls drop to boundary tiles.

A continent-scale polygon (512-vertex circle, radius 40 deg) is tiled at
z=6/7: every tile its bbox covers is classified by mvt._tile_classify.
Only tiles classified None (boundary) enter the exact overlay kernel;
'inside' tiles emit the tile rectangle directly and 'outside' tiles are
skipped.  The point: boundary tiles grow O(perimeter) ~ 2^z while covered
tiles grow O(area) ~ 4^z, so the clip-call fraction HALVES per zoom level.

Run:  python tools/probe_mvt_fastpath.py
"""
from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spatial_spark.geom.core import Geometry
from spatial_spark.io.mvt import _tile_classify, _tile_envelope


def main():
    cx, cy, rad, nv = 10.0, 20.0, 40.0, 512
    ang = np.linspace(0.0, 2.0 * math.pi, nv, endpoint=False)
    shell = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)],
                     axis=1)
    g = Geometry.polygon(shell)
    out = {}
    for z in (6, 7):
        n = 1 << z
        tx0 = int((cx - rad + 180.0) / 360.0 * n)
        tx1 = int((cx + rad + 180.0) / 360.0 * n)

        def yn(lat):
            return (1.0 - math.log(math.tan(math.radians(lat))
                                   + 1.0 / math.cos(math.radians(lat)))
                    / math.pi) / 2.0
        ty0 = int(yn(cy + rad) * n)
        ty1 = int(yn(cy - rad) * n)
        counts = {"inside": 0, "outside": 0, "boundary": 0}
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                cls = _tile_classify(g, *_tile_envelope(z, tx, ty))
                counts["boundary" if cls is None else cls] += 1
        total = sum(counts.values())
        counts["covered"] = total
        counts["clip_fraction"] = round(counts["boundary"] / total, 4)
        out[f"z{z}"] = counts
    # the fast path must engage for the vast majority of covered tiles
    assert out["z6"]["clip_fraction"] < 0.35, out
    assert out["z7"]["clip_fraction"] < 0.20, out
    # boundary fraction ~halves per zoom (perimeter vs area scaling)
    ratio = out["z7"]["clip_fraction"] / out["z6"]["clip_fraction"]
    out["z7_over_z6_clip_fraction"] = round(ratio, 3)
    assert ratio < 0.7, out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
