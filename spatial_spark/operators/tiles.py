"""Web-mercator (slippy-map) tile aggregation — the scale-out half of
the reference's image/tile export axis (reference: server-plugin image
export via StyledImageExporter, SLD rendering — our io/render.py covers
the styling; THIS module covers assigning and aggregating features to
the z/x/y tile grid, the thing a 100 TB layer actually needs before any
tile can be drawn).

Tile math (OSM slippy-map convention):

    n = 2^z
    x = floor((lon + 180) / 360 * n)
    y = floor((1 - ln(tan(lat) + sec(lat)) / pi) / 2 * n)

with latitude clamped to the mercator domain (±85.05112878°) and x/y
clamped to [0, n-1].  The formulas are emitted as SQL TEXT valid in both
Spark SQL and DuckDB (the repo's cross-engine discipline — identical
IEEE double expressions on both sides, floor() not CAST).

Scale shape: tile assignment is map-only Column math (whole-stage
codegen); ``tile_counts`` is one keyed aggregation with map-side
combine — the canonical partial-agg shape; ``tile_rollup`` derives the
z-1 pyramid level from the z level (x >> 1, y >> 1, re-aggregate), so a
full pyramid is z tiny keyed aggs over already-aggregated data, never a
rescan of the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tile_xy_sql", "with_tiles", "tile_counts", "tile_rollup"]

MAX_MERC_LAT = 85.05112878


def tile_xy_sql(z: int, lon_sql: str, lat_sql: str) -> tuple[str, str]:
    """SQL expression texts for (tile_x, tile_y) at zoom ``z`` — valid in
    BOTH Spark SQL and DuckDB so oracles share the exact arithmetic."""
    if not 0 <= z <= 30:
        raise ValueError(f"zoom must be in [0, 30], got {z}")
    n = 1 << z
    x = (f"CAST(least(greatest(floor((({lon_sql}) + 180.0) / 360.0 "
         f"* {n}.0), 0.0), {n - 1}.0) AS BIGINT)")
    lat_c = (f"least(greatest(CAST(({lat_sql}) AS DOUBLE), "
             f"-{MAX_MERC_LAT}), {MAX_MERC_LAT})")
    y = (f"CAST(least(greatest(floor((1.0 - ln(tan(radians({lat_c})) "
         f"+ 1.0 / cos(radians({lat_c}))) / pi()) / 2.0 * {n}.0), 0.0), "
         f"{n - 1}.0) AS BIGINT)")
    return x, y


def with_tiles(df: DataFrame, z: int, lon_col: str = "lon",
               lat_col: str = "lat") -> DataFrame:
    """Append ``tile_z/tile_x/tile_y`` columns (map-only)."""
    xs, ys = tile_xy_sql(z, lon_col, lat_col)
    return (df.withColumn("tile_z", F.lit(z))
            .withColumn("tile_x", F.expr(xs))
            .withColumn("tile_y", F.expr(ys)))


def tile_counts(df: DataFrame, z: int, lon_col: str = "lon",
                lat_col: str = "lat") -> DataFrame:
    """Feature count per z/x/y tile: one keyed agg with map-side combine.
    Returns ``(tile_z, tile_x, tile_y, n)``."""
    return (with_tiles(df, z, lon_col, lat_col)
            .groupBy("tile_z", "tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("n")))


def tile_rollup(tiles: DataFrame) -> DataFrame:
    """One pyramid level up: aggregate z-level tile counts to z-1
    (``x >> 1, y >> 1``).  Chain z times for the full pyramid — each
    level aggregates the PREVIOUS level's output (4:1 row shrink), so
    building every level costs barely more than the base level."""
    return (tiles.select((F.col("tile_z") - 1).alias("tile_z"),
                         F.shiftright("tile_x", 1).alias("tile_x"),
                         F.shiftright("tile_y", 1).alias("tile_y"),
                         "n")
            .groupBy("tile_z", "tile_x", "tile_y")
            .agg(F.sum("n").alias("n")))


def quadkey(tile_z, tile_x, tile_y):
    """Bing-style quadkey string Column for a z/x/y tile (one char per
    zoom level from the interleaved x/y bits) — the flat string key tile
    stores and caches address by.  Pure Column math: per level i
    (from z-1 down to 0), digit = ((x >> i) & 1) + 2 * ((y >> i) & 1).

    Built as a SQL expression over fixed 31 levels with the leading
    levels sliced off by z, so it works for a *column* z (no per-row
    Python)."""
    zc = F.col(tile_z) if isinstance(tile_z, str) else tile_z
    xc = F.col(tile_x) if isinstance(tile_x, str) else tile_x
    yc = F.col(tile_y) if isinstance(tile_y, str) else tile_y
    digits = [
        ((xc.bitwiseAND(F.lit(1 << i)) != 0).cast("int")
         + (yc.bitwiseAND(F.lit(1 << i)) != 0).cast("int") * 2
         ).cast("string")
        for i in range(30, -1, -1)]
    full = F.concat(*digits)               # 31 digits, msb first
    return F.substring(full, F.lit(31) - zc + 1, zc)


def windowed_tile_counts(events: DataFrame, z: int,
                         lon_col: str = "lon", lat_col: str = "lat",
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """STREAMING tile aggregation: event counts per (time window, z/x/y
    tile) with a watermark bounding state — the live heatmap feed.
    Tile assignment is the same codegen Column math as the batch path,
    so batch and stream agree tile-for-tile; works on batch DataFrames
    too (window agg without watermark semantics differences)."""
    out = with_tiles(events, z, lon_col, lat_col)
    if events.isStreaming:
        out = out.withWatermark("ts", watermark)
    return (out.groupBy(F.window("ts", window).alias("w"),
                        "tile_z", "tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    "tile_z", "tile_x", "tile_y", "n"))
