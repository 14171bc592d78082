"""SFC key-range pruning for window queries.

The reference's space-filling-curve point indexes answer a window query by
computing the curve ranges that intersect the window
(LayerSpaceFillingCurvePointIndex.getTilesIntersectingEnvelope → index range
scans, :114-179).  Here the same ranges become a `zkey BETWEEN lo AND hi`
OR-list that Catalyst pushes to Parquet row-group stats.  Because layer
writes range-partition and sort by zkey, whole files/row-groups fall out of
the scan — the 100 TB story for "index scan".
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.columns import sfc_ranges_predicate
from ..sfc import WGS84, zorder_ranges

MAX_RANGES = 32


def sfc_window_predicate(df: DataFrame, window, extent=WGS84):
    """Column predicate over zkey for rows whose bbox centre may fall in
    `window`, or None if the layer has no zkey column.

    NOTE: zkey indexes the bbox *centre* cell.  For point layers this is
    exact; for extended geometries a centre can sit in a cell outside the
    query window even though the bbox intersects it, so we pad the window by
    one cell at the curve level before enumerating ranges — conservative for
    geometries smaller than a cell (the common case after SFC-clustered
    ingestion); larger geometries are caught by the bbox predicate, so the
    zkey predicate is only applied when the layer is all-points.
    """
    if "zkey" not in df.columns:
        return None
    try:
        gtypes = df.select("gtype").distinct().toPandas()["gtype"].tolist()
    except Exception:
        return None
    if set(gtypes) - {1}:
        return None  # non-point geometries: rely on bbox columns only
    ranges = zorder_ranges(window, extent=extent, max_ranges=MAX_RANGES)
    return sfc_ranges_predicate("zkey", ranges)
