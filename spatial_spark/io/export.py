"""Feature-collection export sinks: GeoJSON / KML / GML / WKT files.

Parity: the GeoTools DataStore read path (Neo4jSpatialDataStore) exists so
external tools can consume layers; here the equivalent is standard text
formats.  Small layers export driver-side to a single file; the distributed
path writes one part per partition via Spark's text writer (the 100 TB
shape — downstream tools concatenate or read the directory).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom import from_wkb
from ..geom.io_text import to_geojson


def _df_of(layer_or_df) -> DataFrame:
    return layer_or_df.df() if hasattr(layer_or_df, "df") else layer_or_df


def export_geojson(layer_or_df, path: str, attrs: list | None = None) -> str:
    """Write a GeoJSON FeatureCollection file (driver-side; small layers)."""
    df = _df_of(layer_or_df)
    attrs = attrs if attrs is not None else [
        c for c in df.columns
        if c not in ("geom", "gtype", "xmin", "ymin", "xmax", "ymax", "zkey")]
    feats = []
    for r in df.select("geom", *attrs).collect():
        if r["geom"] is None:
            continue
        feats.append({
            "type": "Feature",
            "geometry": json.loads(to_geojson(from_wkb(r["geom"]))),
            "properties": {a: r[a] for a in attrs},
        })
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return path


def export_lines(layer_or_df, path: str, fmt: str = "wkt") -> str:
    """Distributed export: one serialized geometry per line, written by
    Spark's text datasource (directory of part files).  fmt: wkt | geojson |
    kml | gml."""
    fn = {"wkt": "st_astext", "geojson": "st_asgeojson",
          "kml": "st_askml", "gml": "st_asgml"}[fmt]
    df = _df_of(layer_or_df)
    (df.select(F.expr(f"{fn}(geom)").alias("value"))
       .filter(F.col("value").isNotNull())
       .write.mode("overwrite").text(path))
    return path
