"""Geometric aggregations — the AbstractGroupGeoPipe family, distributed.

Parity: UnionAll.java:30-43, IntersectAll.java:30-42, Min.java/Max.java:30-73,
DensityIslands.java:26-55.

The reference folds record-at-a-time on one thread.  Here each aggregate is
two-phase: partition-local partial fold (applyInPandas over a synthetic
group = Spark's map-side combine) then a small final fold — the shape that
scales to 100 TB (partials are one geometry per partition, final is tiny).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import from_wkb, to_wkb
from ..geom.clip import intersect_many, union_many


def _fold_agg(df: DataFrame, fold_fn, geom_col: str = "geom",
              group_cols: list | None = None) -> DataFrame:
    """Generic two-phase geometry fold.  group_cols=None → global fold
    (reference semantics: all pipes group-all); otherwise keyed groupBy —
    a capability the reference lacks but Spark gives for free."""
    schema_fields = []
    if group_cols:
        for c in group_cols:
            schema_fields.append(T.StructField(c, df.schema[c].dataType))
    schema_fields.append(T.StructField("geom", T.BinaryType()))
    out_schema = T.StructType(schema_fields)

    gcols = group_cols or []

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [from_wkb(b) for b in pdf[geom_col] if b is not None]
        merged = fold_fn(geoms)
        row = {c: [pdf[c].iloc[0]] for c in gcols}
        row["geom"] = [to_wkb(merged)]
        return pd.DataFrame(row)

    if gcols:
        partials = df.groupBy(*gcols).applyInPandas(partial, out_schema)
        # second phase unnecessary: applyInPandas already saw whole groups
        return partials
    # global: partial per partition, then single final fold
    with_pid = df.withColumn("_pid", F.spark_partition_id())

    def partial_p(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [from_wkb(b) for b in pdf[geom_col] if b is not None]
        return pd.DataFrame({"geom": [to_wkb(fold_fn(geoms))]})

    partials = with_pid.groupBy("_pid").applyInPandas(
        partial_p, T.StructType([T.StructField("geom", T.BinaryType())]))

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [from_wkb(b) for b in pdf["geom"] if b is not None]
        return pd.DataFrame({"geom": [to_wkb(fold_fn(geoms))]})

    return (partials.withColumn("_k", F.lit(1)).groupBy("_k")
            .applyInPandas(final, T.StructType([T.StructField("geom", T.BinaryType())])))


def union_all(df: DataFrame, geom_col: str = "geom",
              group_cols: list | None = None) -> DataFrame:
    """Geometric union of all rows → 1 row (UnionAll.java)."""
    return _fold_agg(df, union_many, geom_col, group_cols)


def intersect_all(df: DataFrame, geom_col: str = "geom",
                  group_cols: list | None = None) -> DataFrame:
    """Geometric intersection fold (IntersectAll.java)."""
    return _fold_agg(df, intersect_many, geom_col, group_cols)


def _keep_extreme(df: DataFrame, prop: str, agg_fn) -> DataFrame:
    """Rows attaining the global extreme of prop, ties kept — a broadcast
    join against the 1-row aggregate (map-side combine + tiny broadcast),
    NOT a global Window (which funnels every row through one partition).

    NULL prop rows are excluded EXPLICITLY up front (min/max ignore NULLs
    and the equality join is null-rejecting anyway — the filter makes the
    semantics visible rather than incidental; documented difference from
    the r1 Window formulation, which surfaced NULLs as the minimum)."""
    non_null = df.filter(F.col(prop).isNotNull())
    ext = non_null.agg(agg_fn(F.col(prop)).alias("_ext"))
    return (non_null.join(F.broadcast(ext), F.col(prop) == F.col("_ext"))
            .drop("_ext"))


def keep_min(df: DataFrame, prop: str) -> DataFrame:
    """Rows attaining min(prop), ties kept, NULLs ignored (Min.java:30-73)."""
    return _keep_extreme(df, prop, F.min)


def keep_max(df: DataFrame, prop: str) -> DataFrame:
    """Rows attaining max(prop), ties kept, NULLs ignored (Max.java:30-73)."""
    return _keep_extreme(df, prop, F.max)


def density_islands_greedy(df: DataFrame, density: float,
                           id_col: str = "id", order_col: str | None = None,
                           max_rows: int = 100_000) -> DataFrame:
    """STRICT-COMPAT DensityIslands (VERDICT r8 ask #4): the reference's
    exact greedy first-match merge, sequence-dependent by design
    (DensityIslands.java:26-55 — each incoming geometry joins the FIRST
    existing island within ``density`` of the island's accumulated
    union, else founds a new island; it does NOT re-merge islands, so
    transitive chains can stay split depending on arrival order).

    Driver-side single pass over rows sorted by ``order_col`` (default
    ``id_col`` — the reference iterates its pipeline order; pass the
    column that reproduces it).  distance(geom, union(parts)) ==
    min(distance(geom, part)), so islands keep member lists instead of
    materializing unions.  Bounded: raises above ``max_rows`` — this
    mode exists to port the reference's order-dependent goldens
    verbatim; the distributed scale path is ``density_islands`` (CC
    semantics, documented difference SURVEY §7.4.1).  On inputs whose
    islands are separated by more than ``density`` (no transitive
    chains), greedy and CC agree exactly — gate-pinned.

    Returns (id, island) with island = the founding member's id."""
    from ..geom import from_wkb
    from ..geom.algorithms import distance as geom_distance

    order = order_col or id_col
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"density_islands_greedy is the driver-side strict-compat "
            f"mode ({n} rows > max_rows={max_rows}); use "
            f"density_islands (connected-components semantics) at scale")
    cols = [id_col, "geom"] + ([order] if order != id_col else [])
    rows = df.select(*cols).orderBy(order).collect()
    islands: list = []          # [(founder_id, [Geometry, ...])]
    labels: list = []
    for r in rows:
        g = from_wkb(r["geom"])
        placed = False
        for fid, members in islands:
            if min(geom_distance(g, m) for m in members) <= density:
                members.append(g)
                labels.append((r[id_col], fid))
                placed = True
                break
        if not placed:
            islands.append((r[id_col], [g]))
            labels.append((r[id_col], r[id_col]))
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()
    from ..localrel import arrow_local_df
    return arrow_local_df(spark, labels,
                          f"{id_col} {id_type}, island {id_type}")


def density_islands(df: DataFrame, density: float, id_col: str = "id",
                    max_rounds: int = 50,
                    driver_threshold: int | None = None,
                    mode: str = "cc") -> DataFrame:
    """Cluster rows whose geometries lie within `density` of each other
    (DensityIslands.java:26-55).

    The reference's greedy first-match merge is sequence-dependent; the
    principled distributed analogue is connected components over the
    "distance <= density" graph (documented semantic difference: transitive
    chains merge here, SURVEY.md §7.4.1).  ``mode='greedy'`` dispatches
    to the strict-compat driver-side port (density_islands_greedy) for
    sub-threshold groups that need the reference's exact order-dependent
    semantics.  Implementation: bbox-expanded
    self-join builds the edge list, then iterative min-label propagation
    (hash-partitioned joins, converges in O(log n) rounds).

    Edge generation is the PBSM grid (the same cell-explode equi-join the
    spatial join uses, with the a-side bbox padded by `density`): NO
    theta-join — a bare inequality join plans as a broadcast-nested-loop /
    cartesian, O(N²) scans at any real scale.  Cell size is at least
    `density`, so padded-bbox cell cover is bounded (points → ≤ 9 cells).

    Label propagation is pointer-doubled min-label (O(log diameter)
    rounds, lineage-truncated per round — see operators/graph.py).

    Returns (id, island) — join back to the layer for geometries, or feed
    union_all(group_cols=['island']) for merged island geometries."""
    if mode == "greedy":
        return density_islands_greedy(df, density, id_col)
    if mode != "cc":
        raise ValueError(f"density_islands: unknown mode {mode!r}")
    from .graph import min_label_components

    edges = density_edges(df, density, id_col)
    nodes = df.select(F.col(id_col).alias("node"))
    kw = {} if driver_threshold is None else {
        "driver_threshold": driver_threshold}
    labels = min_label_components(nodes, edges, max_rounds=max_rounds, **kw)
    return labels.select(F.col("node").alias(id_col), "island")


def density_edges(df: DataFrame, density: float, id_col: str = "id",
                  extent: tuple | None = None) -> DataFrame:
    """(a_id, b_id) pairs whose geometries lie within `density` — the PBSM
    grid candidate join + exact distance refine (see density_islands).

    ``extent`` (xmin,ymin,xmax,ymax) skips the plan-time bbox aggregate —
    layer-backed callers pass catalog write-time stats."""
    import math

    from ..geom.algorithms import distance as geom_distance
    from .join import _cells_expr, _estimated_rows

    bb = extent if extent is not None else \
        df.agg(F.min("xmin"), F.min("ymin"), F.max("xmax"), F.max("ymax")).first()
    x0 = float(bb[0]) - density
    y0 = float(bb[1]) - density
    w = (float(bb[2]) + density) - x0
    h = (float(bb[3]) + density) - y0
    n = _estimated_rows(df)
    ncells = min(max(n // 2, 64), 1 << 20)
    side = max(int(math.sqrt(ncells)), 1)
    cw = max(w / side or 1.0, density, 1e-12)
    ch = max(h / side or 1.0, density, 1e-12)
    # one clamp bound for both axes, shared by cell explode AND reference
    # point (a mismatch would silently drop pairs at the extent edge)
    side_n = max(int(math.ceil(w / cw)), int(math.ceil(h / ch)), 1)

    a = (df.select(F.col(id_col).alias("a_id"), F.col("geom").alias("a_geom"),
                   (F.col("xmin") - density).alias("a_xmin"),
                   (F.col("ymin") - density).alias("a_ymin"),
                   (F.col("xmax") + density).alias("a_xmax"),
                   (F.col("ymax") + density).alias("a_ymax"))
         .withColumn("cell", F.explode(
             _cells_expr("a_", side_n, x0, y0, cw, ch))))
    b = (df.select(F.col(id_col).alias("b_id"), F.col("geom").alias("b_geom"),
                   F.col("xmin").alias("b_xmin"), F.col("ymin").alias("b_ymin"),
                   F.col("xmax").alias("b_xmax"), F.col("ymax").alias("b_ymax"))
         .withColumn("cell", F.explode(
             _cells_expr("b_", side_n, x0, y0, cw, ch))))
    pairs = (a.join(b, "cell")
             .filter((F.col("a_id") < F.col("b_id"))
                     & (F.col("a_xmin") <= F.col("b_xmax"))
                     & (F.col("a_xmax") >= F.col("b_xmin"))
                     & (F.col("a_ymin") <= F.col("b_ymax"))
                     & (F.col("a_ymax") >= F.col("b_ymin"))))
    # reference-point dedup: keep the pair only in the cell holding the
    # min corner of the (padded-a, b) bbox intersection
    def _clamp(col):
        return F.greatest(F.lit(0), F.least(F.lit(side_n - 1), col.cast("int")))
    ref_cx = _clamp(F.floor((F.greatest("a_xmin", "b_xmin") - F.lit(x0)) / F.lit(cw)))
    ref_cy = _clamp(F.floor((F.greatest("a_ymin", "b_ymin") - F.lit(y0)) / F.lit(ch)))
    pairs = pairs.filter(F.col("cell") == (ref_cy * side_n + ref_cx)).drop("cell")

    @F.pandas_udf(T.BooleanType())
    def close_enough(ag: pd.Series, bg: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(ag, bg):
            out.append(geom_distance(from_wkb(x), from_wkb(y)) <= density)
        return pd.Series(out)

    return (pairs.filter(close_enough(F.col("a_geom"), F.col("b_geom")))
            .select("a_id", "b_id"))


def dbscan(df: DataFrame, eps: float, min_pts: int = 4,
           id_col: str = "id", max_rounds: int = 50) -> DataFrame:
    """DBSCAN with real core/border/noise semantics (the PostGIS
    ST_ClusterDBSCAN surface; generalizes density_islands, which is the
    min_pts≤2 special case).

    * core: ≥ ``min_pts`` points within ``eps`` COUNTING ITSELF
      (sklearn's convention, documented);
    * border: non-core with ≥1 core neighbor — assigned the SMALLEST
      cluster label among its core neighbors.  Textbook DBSCAN leaves
      border assignment scan-order-dependent when two clusters reach the
      same border point; min-label is the deterministic resolution, so
      the distributed run and the SQL oracle agree exactly;
    * noise: everything else — cluster NULL.

    Distributed shape: ONE eps-pair generation (the PBSM grid join from
    density_edges — no theta join), one degree aggregation, connected
    components over core-core edges only (pointer-doubled min-label,
    O(log diameter) rounds), then a border attach that is one more
    keyed join.  Nothing driver-side; every shuffle is keyed on ids.

    Returns (id_col, role, cluster) — cluster = min member id of the
    core component, NULL for noise."""
    from .graph import min_label_components

    # the eps-pair list feeds THREE consumers (degree counts, core-core
    # CC, border attach) — materialize it once so the grid join + exact
    # refine doesn't run three times (same lineage-cut pattern as the
    # CC loop in operators/graph.py)
    edges = density_edges(df, eps, id_col).localCheckpoint(eager=True)
    # undirected degree: each (a<b) pair contributes to both endpoints
    deg = (edges.select(F.col("a_id").alias("node"))
           .unionAll(edges.select(F.col("b_id").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("n_nbrs")))
    nodes = df.select(F.col(id_col).alias("node"))
    flagged = (nodes.join(deg, "node", "left")
               .withColumn("is_core",
                           F.coalesce(F.col("n_nbrs"), F.lit(0)) + 1
                           >= F.lit(int(min_pts))))
    cores = flagged.filter("is_core").select("node")
    core_edges = (edges
                  .join(cores.withColumnRenamed("node", "a_id"), "a_id")
                  .join(cores.withColumnRenamed("node", "b_id"), "b_id"))
    core_labels = min_label_components(cores, core_edges,
                                       max_rounds=max_rounds)
    # border attach: min core-neighbor label per non-core point
    sym = (edges.select(F.col("a_id").alias("node"),
                        F.col("b_id").alias("nbr"))
           .unionAll(edges.select(F.col("b_id").alias("node"),
                                  F.col("a_id").alias("nbr"))))
    border = (flagged.filter(~F.col("is_core"))
              .select("node")
              .join(sym, "node")
              .join(core_labels.select(F.col("node").alias("nbr"),
                                       F.col("island").alias("cluster")),
                    "nbr")
              .groupBy("node").agg(F.min("cluster").alias("cluster")))
    out = (flagged.select("node", "is_core")
           .join(core_labels.withColumnRenamed("island", "core_cluster"),
                 "node", "left")
           .join(border.withColumnRenamed("cluster", "border_cluster"),
                 "node", "left")
           .select(
               F.col("node").alias(id_col),
               F.when(F.col("is_core"), F.lit("core"))
               .when(F.col("border_cluster").isNotNull(), F.lit("border"))
               .otherwise(F.lit("noise")).alias("role"),
               F.coalesce("core_cluster", "border_cluster").alias("cluster")))
    return out
