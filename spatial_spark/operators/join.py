"""Distributed layer-to-layer spatial join — the engine's key value-add.

The reference has no layer×layer join: its tests iterate one layer and probe
the other per-geometry (TestIntersectsPathQueries.java:1-394), an O(N·cost)
driver-side loop.  At 100 TB that's the one shape that must be a real
distributed operator.  This is the classic PBSM/grid partitioned join:

  1. pick a grid level from the combined extent and row counts;
  2. explode each row to the grid cells its bbox covers (points → 1 cell);
  3. equi-join on cell (shuffle co-locates spatial neighborhoods);
  4. de-duplicate multi-cell pairs with the *reference-point* rule — a pair
     is emitted only in the cell containing the pair's bbox-intersection
     min corner (no global distinct shuffle needed);
  5. bbox pair test, then exact predicate refine (vectorized for
     point-in-polygon, kernel predicate otherwise).

If one side is small (≤ broadcast threshold), the grid is skipped and the
small side is broadcast — Catalyst then does a broadcast-nested-loop with
the bbox conjunct, which AQE picks automatically.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import from_wkb
from ..geom import predicates as P
from ..geom.algorithms import point_in_polygon, points_in_polygon_bulk

_PREDS = {
    "intersects": P.intersects, "contains": P.contains, "within": P.within,
    "covers": P.covers, "coveredby": P.covered_by, "crosses": P.crosses,
    "overlaps": P.overlaps, "touches": P.touches, "equals": P.equals_topo,
}


def _grid_params(a_bbox, b_bbox, n_rows: int):
    xmin = min(a_bbox[0], b_bbox[0])
    ymin = min(a_bbox[1], b_bbox[1])
    xmax = max(a_bbox[2], b_bbox[2])
    ymax = max(a_bbox[3], b_bbox[3])
    # target ~2 rows per cell per side on average, capped to keep cell count sane
    ncells = min(max(n_rows // 2, 64), 1 << 20)
    side = int(math.sqrt(ncells)) or 1
    w = (xmax - xmin) or 1.0
    h = (ymax - ymin) or 1.0
    return xmin, ymin, w / side, h / side, side


def _cells_expr(prefix: str, side: int, x0: float, y0: float, cw: float, ch: float):
    """Array of cell ids covered by a row's bbox — pure column math
    (F.sequence cross-product; stays in codegen, no UDF)."""
    def clamp(col):
        return F.greatest(F.lit(0), F.least(F.lit(side - 1), col.cast("int")))

    cx0 = clamp(F.floor((F.col(f"{prefix}xmin") - F.lit(x0)) / F.lit(cw)))
    cx1 = clamp(F.floor((F.col(f"{prefix}xmax") - F.lit(x0)) / F.lit(cw)))
    cy0 = clamp(F.floor((F.col(f"{prefix}ymin") - F.lit(y0)) / F.lit(ch)))
    cy1 = clamp(F.floor((F.col(f"{prefix}ymax") - F.lit(y0)) / F.lit(ch)))
    xs = F.sequence(cx0, cx1)
    ys = F.sequence(cy0, cy1)
    # cross product of x and y ranges → cell = cy*side + cx
    return F.flatten(F.transform(ys, lambda y: F.transform(xs, lambda x: y * side + x)))


def spatial_join(a: DataFrame, b: DataFrame, predicate: str = "intersects",
                 broadcast_threshold: int = 10000) -> DataFrame:
    """Join rows of `a` and `b` where predicate(a.geom, b.geom) holds.

    Both inputs need the layer core columns (geom/gtype/xmin..ymax).  Output
    columns: a.* (prefixed a_) + b.* (prefixed b_)."""
    if predicate not in _PREDS:
        raise ValueError(f"unknown predicate {predicate!r}")

    a_pref = a.select([F.col(c).alias(f"a_{c}") for c in a.columns])
    b_pref = b.select([F.col(c).alias(f"b_{c}") for c in b.columns])

    b_count = b.count()
    bbox_pair = (
        (F.col("a_xmax") >= F.col("b_xmin")) & (F.col("a_xmin") <= F.col("b_xmax"))
        & (F.col("a_ymax") >= F.col("b_ymin")) & (F.col("a_ymin") <= F.col("b_ymax"))
    )

    if b_count <= broadcast_threshold:
        joined = a_pref.join(F.broadcast(b_pref), bbox_pair)
    else:
        a_bbox = a.agg(F.min("xmin"), F.min("ymin"), F.max("xmax"), F.max("ymax")).first()
        b_bbox = b.agg(F.min("xmin"), F.min("ymin"), F.max("xmax"), F.max("ymax")).first()
        n = max(a.count(), b_count)
        x0, y0, cw, ch, side = _grid_params(tuple(a_bbox), tuple(b_bbox), n)
        ae = a_pref.withColumn("cell", F.explode(_cells_expr("a_", side, x0, y0, cw, ch)))
        be = b_pref.withColumn("cell", F.explode(_cells_expr("b_", side, x0, y0, cw, ch)))
        joined = ae.join(be, "cell").filter(bbox_pair)
        # reference-point dedup: emit only in the cell holding the pair's
        # intersection min corner (PBSM duplicate-avoidance, no distinct)
        ref_cx = F.floor((F.greatest("a_xmin", "b_xmin") - F.lit(x0)) / F.lit(cw)).cast("int")
        ref_cy = F.floor((F.greatest("a_ymin", "b_ymin") - F.lit(y0)) / F.lit(ch)).cast("int")
        ref_cx = F.greatest(F.lit(0), F.least(F.lit(side - 1), ref_cx))
        ref_cy = F.greatest(F.lit(0), F.least(F.lit(side - 1), ref_cy))
        joined = joined.filter(F.col("cell") == (ref_cy * side + ref_cx)).drop("cell")

    return joined.filter(_refine_pred(predicate))


def _refine_pred(predicate: str):
    fn = _PREDS[predicate]

    @F.pandas_udf(T.BooleanType())
    def refine(a_geom: pd.Series, a_gtype: pd.Series,
               b_geom: pd.Series, b_gtype: pd.Series) -> pd.Series:
        # vectorized fast path: point (a) vs polygon (b) containment-style
        out = np.empty(len(a_geom), dtype=object)
        cache: dict = {}

        def geom_of(buf):
            key = bytes(buf)
            g = cache.get(key)
            if g is None:
                g = from_wkb(key)
                cache[key] = g
            return g

        for i in range(len(a_geom)):
            ab, bb = a_geom.iloc[i], b_geom.iloc[i]
            if ab is None or bb is None:
                out[i] = None
                continue
            ga = geom_of(ab)
            gb = geom_of(bb)
            if predicate in ("within", "intersects", "coveredby") and ga.gtype == 1 and gb.dimension() == 2:
                loc = point_in_polygon(float(ga.data[0]), float(ga.data[1]), gb)
                out[i] = loc == 2 if predicate == "within" else loc > 0
            else:
                out[i] = fn(ga, gb)
        return pd.Series(out)

    return refine(F.col("a_geom"), F.col("a_gtype"), F.col("b_geom"), F.col("b_gtype"))


def within_distance_join(a: DataFrame, b: DataFrame, km: float,
                         broadcast_threshold: int = 10000) -> DataFrame:
    """Distance join on point layers (spherical, km): pairs within km.
    Pure column math end-to-end when both sides are points."""
    from ..functions.columns import sphere_distance_km

    deg = km / 110.574  # conservative lat padding; lon handled by formula
    a_pref = a.select([F.col(c).alias(f"a_{c}") for c in a.columns])
    b_pref = b.select([F.col(c).alias(f"b_{c}") for c in b.columns])
    b_exp = b_pref.withColumn("b_xmin_pad", F.col("b_xmin") - deg * 3) \
                  .withColumn("b_xmax_pad", F.col("b_xmax") + deg * 3) \
                  .withColumn("b_ymin_pad", F.col("b_ymin") - deg) \
                  .withColumn("b_ymax_pad", F.col("b_ymax") + deg)
    cond = (
        (F.col("a_xmin") <= F.col("b_xmax_pad")) & (F.col("a_xmax") >= F.col("b_xmin_pad"))
        & (F.col("a_ymin") <= F.col("b_ymax_pad")) & (F.col("a_ymax") >= F.col("b_ymin_pad"))
    )
    if b.count() <= broadcast_threshold:
        joined = a_pref.join(F.broadcast(b_exp), cond)
    else:
        joined = a_pref.join(b_exp, cond)
    dist = sphere_distance_km(F.col("a_xmin"), F.col("a_ymin"),
                              F.col("b_xmin"), F.col("b_ymin"))
    return (joined.withColumn("distance", dist)
            .filter(F.col("distance") <= km)
            .drop("b_xmin_pad", "b_xmax_pad", "b_ymin_pad", "b_ymax_pad"))
