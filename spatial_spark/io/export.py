"""Feature-collection export sinks: GeoJSON / KML / GML / WKT files.

Parity: the GeoTools DataStore read path (Neo4jSpatialDataStore) exists so
external tools can consume layers; here the equivalent is standard text
formats.  Small layers export driver-side to a single file; the distributed
path writes one part per partition via Spark's text writer (the 100 TB
shape — downstream tools concatenate or read the directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import st_asgeojson


def _df_of(layer_or_df) -> DataFrame:
    return layer_or_df.df() if hasattr(layer_or_df, "df") else layer_or_df


def _default_attrs(df: DataFrame) -> list:
    return [c for c in df.columns
            if c not in ("geom", "gtype", "xmin", "ymin", "xmax", "ymax", "zkey")]


def _feature_col(attrs: list):
    """One GeoJSON Feature per row as a STRING column — serialization runs
    in the tasks (st_asgeojson + JVM to_json), never on the driver."""
    props = (F.to_json(F.struct(*[F.col(a) for a in attrs]))
             if attrs else F.lit("{}"))
    return F.concat(F.lit('{"type": "Feature", "geometry": '),
                    st_asgeojson(F.col("geom")),
                    F.lit(', "properties": '), props, F.lit("}"))


def export_geojson(layer_or_df, path: str, attrs: list | None = None) -> str:
    """Write one GeoJSON FeatureCollection file.

    Features are serialized IN the tasks; the driver only streams finished
    strings (toLocalIterator — one partition in flight, reference streams
    record-at-a-time the same way, GeoPipeline.java:833-872) and writes
    them between the FeatureCollection brackets.  For output too large for
    one file, use export_geojsonl (distributed part files)."""
    df = _df_of(layer_or_df)
    attrs = attrs if attrs is not None else _default_attrs(df)
    rows = (df.filter(F.col("geom").isNotNull())
            .select(_feature_col(attrs).alias("feature")))
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [')
        first = True
        for r in rows.toLocalIterator():
            if not first:
                f.write(", ")
            f.write(r["feature"])
            first = False
        f.write("]}")
    return path


def export_geojsonl(layer_or_df, path: str, attrs: list | None = None) -> str:
    """Distributed newline-delimited GeoJSON features (directory of part
    files) — the 100 TB export shape: no driver funnel at all."""
    df = _df_of(layer_or_df)
    attrs = attrs if attrs is not None else _default_attrs(df)
    (df.filter(F.col("geom").isNotNull())
       .select(_feature_col(attrs).alias("value"))
       .write.mode("overwrite").text(path))
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
