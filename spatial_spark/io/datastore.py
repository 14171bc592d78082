"""GeoTools-DataStore-equivalent facade over layers and external files.

Parity target: the geotools-plugin's Neo4jSpatialDataStore
(Neo4jSpatialDataStore.java:53-173) + Neo4jSpatialFeatureReader /
Neo4jSpatialFeatureWriter, which expose spatial layers to external tools
through one uniform API: enumerate feature types, read a type's schema,
obtain a (filtered) feature reader, obtain an appending feature writer,
and create new types.

Spark-first re-expression: a *feature type* is anything that can produce
a DataFrame.  Layer-backed types push bbox/CQL filters into the layer's
pruned search path (SFC layout + parquet min/max — the same job the
reference's JTS-filtered R-tree traversal does); external read-only
types (shapefile, newline-delimited GeoJSON, parquet) register as lazy
sources, so `store.get_feature_source(name).features()` composes with
any downstream DataFrame program without materializing.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


_INTERNAL = ("zkey",)


class FeatureSource:
    """Read side of one feature type (Neo4jSpatialFeatureReader parity).

    Everything is lazy: `features()` and the filtered variants return
    DataFrames; no action runs until the caller triggers one."""

    def __init__(self, store: "SpatialDataStore", name: str, reader):
        self._store, self.name, self._reader = store, name, reader

    def features(self) -> DataFrame:
        return self._reader()

    def bbox(self, xmin, ymin, xmax, ymax) -> DataFrame:
        layer = self._store._layer_of(self.name)
        if layer is not None:   # pruned index path, not a post-filter
            return layer.bbox_search(xmin, ymin, xmax, ymax)
        df = self.features()
        return df.filter((F.col("xmin") <= xmax) & (F.col("xmax") >= xmin)
                         & (F.col("ymin") <= ymax) & (F.col("ymax") >= ymin))

    def cql(self, expression: str) -> DataFrame:
        layer = self._store._layer_of(self.name)
        if layer is not None:
            return layer.cql(expression)
        from ..operators.cql import cql_to_sql
        df = self.features()
        return df.filter(F.expr(
            cql_to_sql(expression, has_geom="geom" in df.columns)))

    def bounds(self):
        """(xmin, ymin, xmax, ymax) of the type (ReferencedEnvelope
        parity) — catalog metadata for layers, one agg otherwise."""
        layer = self._store._layer_of(self.name)
        if layer is not None:
            return layer.bbox()
        row = (self.features()
               .agg(F.min("xmin"), F.min("ymin"), F.max("xmax"), F.max("ymax"))
               .first())
        return tuple(row)

    def schema(self) -> T.StructType:
        return self.features().schema


class FeatureWriter:
    """Append side of a layer-backed type (Neo4jSpatialFeatureWriter)."""

    def __init__(self, layer):
        self._layer = layer

    def write(self, df: DataFrame, **kw) -> None:
        self._layer.add(df, **kw)


class SpatialDataStore:
    """Uniform catalog of spatial feature types (Neo4jSpatialDataStore).

    Layer types come from the SpatialContext catalog; external files join
    via `register_file`.  Names are unique across both; a registered file
    shadows nothing (duplicate names raise)."""

    def __init__(self, ctx):
        self.ctx = ctx
        self._external: dict = {}

    # ---- catalog ---------------------------------------------------------
    def get_type_names(self) -> list:
        return sorted(list(self.ctx.layers()) + list(self._external))

    def get_schema(self, name: str) -> T.StructType:
        return self.get_feature_source(name).schema()

    def _layer_of(self, name: str):
        try:
            return self.ctx.get_layer(name) if name in self.ctx.layers() else None
        except Exception:
            return None

    # ---- read ------------------------------------------------------------
    def get_feature_source(self, name: str) -> FeatureSource:
        layer = self._layer_of(name)
        if layer is not None:
            def read():
                df = layer.df()
                return df.drop(*[c for c in _INTERNAL if c in df.columns])
            return FeatureSource(self, name, read)
        if name in self._external:
            return FeatureSource(self, name, self._external[name])
        raise KeyError(f"unknown feature type: {name}")

    # ---- write -----------------------------------------------------------
    def get_feature_writer(self, name: str) -> FeatureWriter:
        layer = self._layer_of(name)
        if layer is None:
            raise KeyError(f"not a writable layer type: {name}")
        return FeatureWriter(layer)

    def create_schema(self, name: str, kind: str = "wkb", **kw):
        """Create a new (empty) layer feature type (DataStore.createSchema).

        kind: 'wkb' | 'wkt' | 'point' (point takes x=/y= column names)."""
        if kind == "point":
            return self.ctx.create_point_layer(name, **kw)
        if kind == "wkt":
            return self.ctx.create_wkt_layer(name, **kw)
        return self.ctx.create_layer(name, **kw)

    # ---- external sources ------------------------------------------------
    def register_file(self, name: str, path: str, fmt: str | None = None):
        """Register a read-only external feature type.

        fmt: 'shapefile' | 'geojsonl' | 'parquet' | 'fgb' | 'delta' |
        'iceberg' (inferred from the extension — or a ``_delta_log``
        / ``metadata/version-hint.text`` dir — when omitted).  The
        reader is lazy — registration does not touch the file beyond
        existence checks done by Spark at plan time."""
        import os as _os

        if name in self.get_type_names():
            raise ValueError(f"feature type exists: {name}")
        if fmt is None:
            fmt = ("shapefile" if path.endswith(".shp")
                   else "parquet" if path.endswith(".parquet")
                   else "fgb" if path.endswith(".fgb")
                   else "delta" if _os.path.isdir(
                       _os.path.join(path, "_delta_log"))
                   else "iceberg" if _os.path.isdir(
                       _os.path.join(path, "metadata"))
                   else "geojsonl")
        spark = self.ctx.spark
        if fmt == "shapefile":
            def read(path=path):
                from .shapefile import read_shapefile
                geoms, attrs, _crs = read_shapefile(path)
                return _geoms_to_df(spark, geoms, attrs)
        elif fmt == "parquet":
            def read(path=path):
                return spark.read.parquet(path)
        elif fmt == "geojsonl":
            def read(path=path):
                return _read_geojsonl(spark, path)
        elif fmt == "fgb":
            def read(path=path):
                from .flatgeobuf import fgb_source
                return fgb_source(spark, path)
        elif fmt == "delta":
            def read(path=path):
                from .delta import delta_source
                return delta_source(spark, path)
        elif fmt == "iceberg":
            def read(path=path):
                from .iceberg import iceberg_source
                return iceberg_source(spark, path)
        else:
            raise ValueError(f"unknown format: {fmt}")
        self._external[name] = read
        return self.get_feature_source(name)


def _geoms_to_df(spark, geoms, attrs) -> DataFrame:
    """Parallel Geometry + attr-dict lists → encoded DataFrame (WKB + bbox).

    Attribute values are stringified: an external dbase source has no
    reliable type metadata, and a read-only source should not guess."""
    from ..geom.wkb import to_wkb
    fields = list(attrs[0].keys()) if attrs and attrs[0] else []
    data = []
    for geom, a in zip(geoms, attrs):
        e = geom.envelope()
        data.append((to_wkb(geom), float(e[0]), float(e[1]), float(e[2]),
                     float(e[3]),
                     *[None if a.get(f) is None else str(a.get(f)).strip()
                       for f in fields]))
    schema = ("geom binary, xmin double, ymin double, xmax double, ymax double"
              + "".join(f", {f} string" for f in fields))
    from ..localrel import arrow_local_df
    return arrow_local_df(spark, data, schema)


_GJL_SCHEMA = T.StructType([
    T.StructField("geom", T.BinaryType()),
    T.StructField("xmin", T.DoubleType()), T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()), T.StructField("ymax", T.DoubleType()),
    T.StructField("properties", T.StringType()),
])


def _read_geojsonl(spark, path: str) -> DataFrame:
    """Distributed parse of newline-delimited GeoJSON Features: text
    source → per-batch python parse (mapInPandas — geometry decode is the
    genuinely non-Columnar step) → (WKB geom, bbox, properties-json)."""
    def parse(batches):
        import json
        from ..geom.io_text import _from_obj
        from ..geom.wkb import to_wkb
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                line = line.strip().rstrip(",")
                if not line or line in ("[", "]"):
                    continue
                o = json.loads(line)
                g = _from_obj(o["geometry"] if o.get("type") == "Feature" else o)
                e = g.envelope()
                out.append((to_wkb(g), float(e[0]), float(e[1]), float(e[2]),
                            float(e[3]), json.dumps(o.get("properties", {}))))
            yield pd.DataFrame(out, columns=[f.name for f in _GJL_SCHEMA])
    return spark.read.text(path).mapInPandas(parse, _GJL_SCHEMA)
