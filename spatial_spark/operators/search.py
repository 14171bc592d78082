"""Search operators: within-distance, k-NN, window, intersects.

Parity: GeoPipeline.startNearestNeighborLatLonSearch (:276-359),
startWithinSearch/startIntersectSearch/startContainSearch (:197-265),
SpatialProcedures.findGeometriesWithinDistance (:864-880) / .closest
(:850-862) / .bbox (:822-836) / .intersects (:901-911).

Every search is the reference's two-phase plan re-expressed declaratively:
  1. envelope window  -> pure-column bbox predicate (+ SFC key ranges),
     pushed by Catalyst into the Parquet scan (min/max row-group pruning =
     R-tree node envelope pruning);
  2. exact refine     -> column math for point layers (zero Python), pandas
     UDF on WKB for general geometry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

import pandas as pd

from ..functions.columns import (
    bbox_intersects_window, sphere_distance_km, sphere_search_window,
    sphere_search_windows,
)
from ..functions.scalar import wkb_lit
from ..geom import from_wkb, from_wkt
from ..geom.algorithms import nearest_point_on, orthodromic_distance_km
from ..sfc import zorder_ranges
from .pruning import sfc_window_predicate


def _window_prefilter(df: DataFrame, window, all_points: bool | None = None,
                      curve: str = "zorder") -> DataFrame:
    """bbox window + SFC key range pruning (two independent prune layers).
    ``window`` may be a single (x0,y0,x1,y1) or a list of windows (the
    antimeridian split) — list windows OR their per-window predicates.
    ``all_points`` and ``curve`` are the layer catalog's write-time facts
    — no plan-time scan."""
    windows = window if isinstance(window, list) else [window]
    pred = None
    for w in windows:
        p = bbox_intersects_window("xmin", "ymin", "xmax", "ymax", w)
        zpred = sfc_window_predicate(df, w, all_points=all_points, curve=curve)
        if zpred is not None:
            p = zpred & p
        pred = p if pred is None else (pred | p)
    return df.filter(pred)


def _cql_seed(layer, cql: str | None):
    """Translate an optional CQL expression riding a spatial search:
    returns ``(sql, props)`` where ``sql`` is the Catalyst predicate
    to apply in-plan and ``props`` the mined numeric property bounds
    that seed manifest ATTRIBUTE pruning (r14, VERDICT r13 ask #6 —
    ``cql("score > 900")`` + a window now compose BOTH prunes: only
    files in shards intersecting the window AND overlapping the
    property range are planned).  Mining is conservative; the exact
    predicate always runs."""
    if not cql:
        return None, {}
    from .cql import cql_to_sql
    props: dict = {}
    sql = cql_to_sql(cql, has_geom="geom" in layer.df().columns,
                     _prop_out=props)
    return sql, props


def _pruned_window_df(layer, windows, props) -> DataFrame:
    """Manifest-pruned snapshot read: spatial windows AND property
    bounds cut the file list from the manifest alone (falls back to
    df_window for layers without attribute stats support)."""
    if props and hasattr(layer, "df_pruned"):
        return layer.df_pruned(windows=windows, props=props)
    return layer.df_window(windows)


def _layer_all_points(layer) -> bool | None:
    try:
        return layer.all_points
    except Exception:
        return None


def _layer_curve(layer) -> str:
    try:
        return layer.curve
    except Exception:
        return "zorder"


def _distance_col(df: DataFrame, lon: float, lat: float):
    """Spherical distance column: pure column math for points (gtype==1
    everywhere), DistanceOp-style nearest-point fallback for general
    geometries (OrthodromicDistance.java:37-72)."""
    @F.pandas_udf(T.DoubleType())
    def geom_sphere_dist(wkb: pd.Series) -> pd.Series:
        out = []
        for b in wkb:
            if b is None:
                out.append(None)
                continue
            g = from_wkb(b)
            qx, qy = nearest_point_on(g, lon, lat)
            out.append(orthodromic_distance_km(lon, lat, qx, qy))
        return pd.Series(out)

    point_fast = sphere_distance_km(F.lit(lon), F.lit(lat), F.col("xmin"), F.col("ymin"))
    if "geom" in df.columns:
        return F.when(F.col("gtype") == 1, point_fast).otherwise(
            geom_sphere_dist(F.col("geom")))
    return point_fast


def within_distance(layer, lon: float, lat: float, km: float,
                    cql: str | None = None) -> DataFrame:
    """All records within `km` of (lon,lat), with a `distance` column,
    ordered ascending — spatial.withinDistance semantics.  ``cql``:
    an attribute predicate applied in-plan whose mined property bounds
    ALSO seed manifest attribute pruning (both prunes compose)."""
    sql, props = _cql_seed(layer, cql)
    windows = sphere_search_windows(lon, lat, km)
    # manifest-shard file pruning first (windows AND property bounds),
    # then the in-plan bbox + SFC-range predicates — three prune
    # layers, outermost free
    df = _window_prefilter(_pruned_window_df(layer, windows, props),
                           windows, _layer_all_points(layer),
                           _layer_curve(layer))
    if sql is not None:
        df = df.filter(sql)
    df = df.withColumn("distance", _distance_col(df, lon, lat))
    return df.filter(F.col("distance") <= km).orderBy("distance")


def closest(layer, lon: float, lat: float, k: int = 100,
            max_km: float | None = None,
            cql: str | None = None) -> DataFrame:
    """k nearest records (SimplePointLayer.findClosestPointsTo :61-77,
    LIMIT_RESULTS=100 default).

    Window sizing follows the density heuristic
    (SpatialTopologyUtils.createEnvelopeForGeometryDensityEstimate:200-238)
    but iteratively doubles until >=k candidates — fixing the reference's
    documented may-return-nothing flaw (GeoPipeline.java:268-276) while
    remaining superset-correct.

    Planning is metadata-only: count/bbox come from the layer catalog's
    write-time stats.  The result is a LAZY frame — no collect in the
    builder.  One cheap probe action (top-k over the pruned window, a
    TakeOrdered of k rows) runs only when the window does not already cover
    the whole layer, to decide whether the pruned plan is globally correct;
    its rows are never materialized into the result (the returned frame is
    the pruned- or full-scan plan itself, composable by the caller)."""
    total = layer.count()      # metadata (catalog stats) for written layers
    if total == 0:
        return layer.df().withColumn("distance", F.lit(0.0)).limit(0)
    bx = layer.bbox()          # metadata likewise
    import math
    all_pts = _layer_all_points(layer)
    area = max((bx[2] - bx[0]) * (bx[3] - bx[1]), 1e-12)
    # window sized for ~4k expected candidates under uniform density
    est_deg = math.sqrt(4.0 * k * area / (math.pi * total))
    km = max(est_deg * 110.574, 1e-6)
    if max_km is not None:
        km = min(km, max_km)
    sql, props = _cql_seed(layer, cql)
    window = sphere_search_window(lon, lat, km)  # unwrapped, for coverage test
    kwins = sphere_search_windows(lon, lat, km)
    cand = _window_prefilter(_pruned_window_df(layer, kwins, props),
                             kwins, all_pts, _layer_curve(layer))
    if sql is not None:
        cand = cand.filter(sql)
    cand = cand.withColumn("distance", _distance_col(cand, lon, lat))
    if max_km is not None:
        cand = cand.filter(F.col("distance") <= max_km)
    pruned = cand.orderBy("distance").limit(k)
    window_covers_layer = (window[0] <= bx[0] and window[1] <= bx[1]
                           and window[2] >= bx[2] and window[3] >= bx[3])
    if window_covers_layer or (max_km is not None and km >= max_km):
        return pruned
    # correctness probe: a point outside the window is farther than `km`,
    # so the in-window top-k is globally correct only while d_k <= km
    probe = pruned.agg(F.count(F.lit(1)).alias("n"),
                       F.max("distance").alias("dmax")).first()
    if probe["n"] >= k and (probe["dmax"] is None or probe["dmax"] <= km):
        return pruned
    full = (layer.df_pruned(props=props)
            if props and hasattr(layer, "df_pruned") else layer.df())
    if sql is not None:
        full = full.filter(sql)
    full = full.withColumn("distance", _distance_col(full, lon, lat))
    if max_km is not None:
        full = full.filter(F.col("distance") <= max_km)
    return full.orderBy("distance").limit(k)


def bbox_search(layer, window, cql: str | None = None) -> DataFrame:
    """spatial.bbox (:822-836): envelope-intersection search.  ``cql``
    composes an attribute predicate + its mined manifest prune."""
    sql, props = _cql_seed(layer, cql)
    df = _window_prefilter(_pruned_window_df(layer, window, props),
                           window, _layer_all_points(layer),
                           _layer_curve(layer))
    return df.filter(sql) if sql is not None else df


def intersects_search(layer, geom_or_wkt,
                      cql: str | None = None) -> DataFrame:
    """spatial.intersects (:901-911): window prefilter on the probe
    geometry's envelope, then exact st_intersects refine — the degenerate
    broadcast spatial join (one literal geometry).  Point-ness comes from
    the catalog's write-time stats, never a plan-time scan.  ``cql``
    composes an attribute predicate + its mined manifest prune."""
    g = from_wkt(geom_or_wkt) if isinstance(geom_or_wkt, str) else geom_or_wkt
    all_pts = _layer_all_points(layer)
    sql, props = _cql_seed(layer, cql)
    df = _window_prefilter(_pruned_window_df(layer, g.envelope(), props),
                           g.envelope(), all_pts, _layer_curve(layer))
    if sql is not None:
        df = df.filter(sql)
    if all_pts is True:
        # pure point layer: exact test is point-in-geometry, vectorized
        from ..geom.algorithms import points_in_polygon_bulk, point_in_polygon
        import numpy as np

        @F.pandas_udf(T.BooleanType())
        def pts_in(xs: pd.Series, ys: pd.Series) -> pd.Series:
            pts = np.column_stack([xs.to_numpy(float), ys.to_numpy(float)])
            if g.dimension() == 2:
                res = points_in_polygon_bulk(pts, g)
                # include boundary: bulk test is interior-biased; refine edge hits
                for i in np.nonzero(~res)[0]:
                    if point_in_polygon(pts[i, 0], pts[i, 1], g):
                        res[i] = True
                return pd.Series(res)
            from ..geom import Geometry
            from ..geom.predicates import intersects as isect
            return pd.Series([isect(Geometry.point(*p), g) for p in pts])

        return df.filter(pts_in(F.col("xmin"), F.col("ymin")))
    return df.filter(_intersects_refine(g))


def _intersects_refine(g):
    from ..functions.scalar import st_intersects
    return st_intersects(F.col("geom"), wkb_lit(g))
