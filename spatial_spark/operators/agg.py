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


def keep_min(df: DataFrame, prop: str) -> DataFrame:
    """Rows attaining min(prop), ties kept (Min.java:30-73)."""
    w = Window.orderBy(F.col(prop).asc())
    return (df.withColumn("_r", F.rank().over(w)).filter(F.col("_r") == 1).drop("_r"))


def keep_max(df: DataFrame, prop: str) -> DataFrame:
    """Rows attaining max(prop), ties kept (Max.java:30-73)."""
    w = Window.orderBy(F.col(prop).desc())
    return (df.withColumn("_r", F.rank().over(w)).filter(F.col("_r") == 1).drop("_r"))


def density_islands(df: DataFrame, density: float, id_col: str = "id") -> DataFrame:
    """Cluster rows whose geometries lie within `density` of each other
    (DensityIslands.java:26-55).

    The reference's greedy first-match merge is sequence-dependent; the
    principled distributed analogue is connected components over the
    "distance <= density" graph (documented semantic difference: transitive
    chains merge here, SURVEY.md §7.4.1).  Implementation: bbox-expanded
    self-join builds the edge list, then iterative min-label propagation
    (hash-partitioned joins, converges in O(log n) rounds).

    Returns (id, island) — join back to the layer for geometries, or feed
    union_all(group_cols=['island']) for merged island geometries."""
    from ..geom.algorithms import distance as geom_distance

    a = df.select(F.col(id_col).alias("a_id"), F.col("geom").alias("a_geom"),
                  "xmin", "ymin", "xmax", "ymax")
    b = df.select(F.col(id_col).alias("b_id"), F.col("geom").alias("b_geom"),
                  F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
                  F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"))
    cond = (
        (F.col("xmin") <= F.col("bxmax") + density)
        & (F.col("xmax") >= F.col("bxmin") - density)
        & (F.col("ymin") <= F.col("bymax") + density)
        & (F.col("ymax") >= F.col("bymin") - density)
        & (F.col("a_id") < F.col("b_id"))
    )
    pairs = a.join(b, cond)

    @F.pandas_udf(T.BooleanType())
    def close_enough(ag: pd.Series, bg: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(ag, bg):
            out.append(geom_distance(from_wkb(x), from_wkb(y)) <= density)
        return pd.Series(out)

    edges = (pairs.filter(close_enough(F.col("a_geom"), F.col("b_geom")))
             .select("a_id", "b_id"))
    edges = edges.union(edges.select(F.col("b_id").alias("a_id"),
                                     F.col("a_id").alias("b_id"))).cache()

    labels = df.select(F.col(id_col).alias("node"),
                       F.col(id_col).cast("long").alias("island")).cache()
    # min-label propagation until fixpoint (bounded rounds)
    for _ in range(30):
        neighbor_min = (edges.join(labels, edges.b_id == labels.node)
                        .groupBy("a_id").agg(F.min("island").alias("n_island")))
        new_labels = (labels.join(neighbor_min, labels.node == neighbor_min.a_id, "left")
                      .select("node",
                              F.least(F.col("island"),
                                      F.coalesce(F.col("n_island"), F.col("island"))
                                      ).alias("island")))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
                   .filter(F.col("n.island") != F.col("o.island")).count())
        labels.unpersist()
        labels = new_labels.cache()
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), "island")
