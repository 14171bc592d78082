"""GeoParquet 1.0 sink/source (public spec — OGC / geoparquet.org).

Writes the spec's `geo` file-metadata key so external readers
(GeoPandas, GDAL/OGR, DuckDB spatial) recognize the geometry column,
and reads it back, detecting the primary geometry column + CRS.  The
geometry encoding is standard WKB — exactly this repo's native layer
encoding (layer.py ENC_WKB), so export is a metadata projection, not a
re-encode.

Scale design: the write is one mapInPandas pass — each Spark partition
writes its own footer-stamped parquet file via pyarrow (GeoParquet
metadata is per file, so per-partition bboxes are exactly what the
spec wants) and yields a one-row manifest; nothing but the file list
ever reaches the driver.  Per-row bbox/type columns are computed by
the existing vectorized kernels (functions/scalar.st_bbox / st_gtype)
before the writer, so the writer itself only aggregates.

Reference parity: the reference exports layers through GeoTools
DataStores (shapefile/GeoJSON; geotools-common/); GeoParquet is the
columnar-era equivalent interop surface for a Spark-native engine.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GEOPARQUET_VERSION = "1.0.0"

# GeoParquet geometry_types names by WKB code (gtype)
_GT_NAMES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
             5: "MultiLineString", 6: "MultiPolygon",
             7: "GeometryCollection"}

__all__ = ["write_geoparquet", "read_geoparquet", "geoparquet_dataset_meta",
           "export_geoparquet", "import_geoparquet", "GEOPARQUET_VERSION"]


def write_geoparquet(df: DataFrame, path: str, geometry_col: str = "geom",
                     crs: dict | None = None) -> list[dict]:
    """Write `df` (WKB binary `geometry_col`) as GeoParquet 1.0.

    One parquet file per non-empty partition, each stamped with the
    spec's `geo` footer metadata carrying that file's own bbox and
    geometry_types (per-file metadata is the spec's granularity).
    `crs=None` omits the key → OGC:CRS84 per spec default; pass a
    PROJJSON dict to embed one.  Returns the small per-file manifest
    [{file, n_rows, xmin, ymin, xmax, ymax}, ...].
    """
    if geometry_col not in df.columns:
        raise ValueError(f"no column {geometry_col!r} in frame")
    os.makedirs(path, exist_ok=True)

    from ..functions.scalar import st_bbox, st_gtype
    bb = st_bbox(F.col(geometry_col))
    staged = (df
              .withColumn("_gp_xmin", bb.getField("xmin"))
              .withColumn("_gp_ymin", bb.getField("ymin"))
              .withColumn("_gp_xmax", bb.getField("xmax"))
              .withColumn("_gp_ymax", bb.getField("ymax"))
              .withColumn("_gp_gt", st_gtype(F.col(geometry_col))))
    helper = ["_gp_xmin", "_gp_ymin", "_gp_xmax", "_gp_ymax", "_gp_gt"]
    out_schema = T.StructType([
        T.StructField("file", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ])
    crs_json = json.dumps(crs) if crs is not None else None

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        bbox = [float(pdf["_gp_xmin"].min()), float(pdf["_gp_ymin"].min()),
                float(pdf["_gp_xmax"].max()), float(pdf["_gp_ymax"].max())]
        gts = sorted(_GT_NAMES.get(int(g), "Unknown")
                     for g in pdf["_gp_gt"].dropna().unique())
        col_meta = {"encoding": "WKB", "geometry_types": gts, "bbox": bbox}
        if crs_json is not None:
            col_meta["crs"] = json.loads(crs_json)
        geo = {"version": GEOPARQUET_VERSION,
               "primary_column": geometry_col,
               "columns": {geometry_col: col_meta}}
        table = pa.Table.from_pandas(pdf.drop(columns=helper),
                                     preserve_index=False)
        table = table.replace_schema_metadata(
            {**(table.schema.metadata or {}),
             b"geo": json.dumps(geo).encode()})
        fname = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(path, fname))
        yield pd.DataFrame([{
            "file": fname, "n_rows": len(pdf),
            "xmin": bbox[0], "ymin": bbox[1],
            "xmax": bbox[2], "ymax": bbox[3]}])

    return [r.asDict() for r in staged.mapInPandas(write_part,
                                                   out_schema).collect()]


def geoparquet_dataset_meta(path: str) -> dict:
    """Union of the per-file `geo` footers of a GeoParquet directory:
    {version, primary_column, encoding, crs, geometry_types (union),
    bbox (union), n_files}.  Footer-only reads — no data I/O."""
    import pyarrow.parquet as pq
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    merged = None
    for f in files:
        md = pq.read_schema(os.path.join(path, f)).metadata or {}
        if b"geo" not in md:
            raise ValueError(f"{f} has no GeoParquet 'geo' metadata")
        geo = json.loads(md[b"geo"])
        col = geo["primary_column"]
        cm = geo["columns"][col]
        if merged is None:
            merged = {"version": geo["version"], "primary_column": col,
                      "encoding": cm["encoding"], "crs": cm.get("crs"),
                      "geometry_types": set(cm["geometry_types"]),
                      "bbox": list(cm["bbox"]), "n_files": 0}
        else:
            if col != merged["primary_column"]:
                raise ValueError("inconsistent primary_column across files")
            merged["geometry_types"].update(cm["geometry_types"])
            b = cm["bbox"]
            merged["bbox"] = [min(merged["bbox"][0], b[0]),
                              min(merged["bbox"][1], b[1]),
                              max(merged["bbox"][2], b[2]),
                              max(merged["bbox"][3], b[3])]
        merged["n_files"] += 1
    merged["geometry_types"] = sorted(merged["geometry_types"])
    return merged


def read_geoparquet(spark: SparkSession, path: str):
    """Read a GeoParquet directory → (DataFrame, dataset meta).

    The frame comes through the normal distributed parquet scan (column
    pruning / predicate pushdown intact); only footers are read on the
    driver for the metadata union."""
    meta = geoparquet_dataset_meta(path)
    return spark.read.parquet(path), meta


def export_geoparquet(layer, path: str, crs: dict | None = None) -> list[dict]:
    """Export a Layer's current snapshot as GeoParquet (WKB passthrough —
    the layer's native encoding; sidecar/bbox helper columns dropped)."""
    df = layer.df()
    drop = [c for c in df.columns
            if c.startswith("_") or c in ("zkey", "xmin", "ymin",
                                          "xmax", "ymax")]
    return write_geoparquet(df.drop(*drop), path, geometry_col="geom",
                            crs=crs)


def import_geoparquet(ctx, path: str, layer_name: str):
    """Import a GeoParquet directory as a new WKB layer: the spec's
    `geo` footer names the geometry column; rows flow through the
    normal distributed scan into Layer.add (one pass, transactional
    manifest commit)."""
    df, meta = read_geoparquet(ctx.spark, path)
    if meta["encoding"] != "WKB":
        raise ValueError(f"unsupported GeoParquet encoding {meta['encoding']!r}")
    gcol = meta["primary_column"]
    layer = ctx.create_layer(layer_name)
    layer.add(df.withColumnRenamed(gcol, "geom") if gcol != "geom" else df)
    return layer
