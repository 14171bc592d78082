"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, pure Column math (F.aggregate/zip_with —
JVM-side, no Python).  Scale path: IVF (coarse k-means partitions, probe the
nearest cells) — the index build is a tiny driver-side k-means on a sample,
assignment/search are distributed column math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_to_probe(vec_col, probe: list):
    """Cosine similarity column against a literal probe vector."""
    p = F.array(*[F.lit(float(v)) for v in probe])
    pn = float(np.sqrt(np.dot(probe, probe)))
    return _dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, p) \
        / (_norm(vec_col if not isinstance(vec_col, str) else F.col(vec_col)) * F.lit(pn))


def knn_cosine(df: DataFrame, probe: list, k: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k — the exact baseline.  orderBy+limit lets
    Spark run a per-partition TakeOrdered (no full sort shuffle)."""
    return (df
            .withColumn("cosine", F.round(cosine_to_probe(vec_col, probe), 6))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "cosine"))


class IVFIndex:
    """Inverted-file ANN index: coarse centroids + cell assignment.

    Build: k-means on a driver-side sample (deterministic seed) — at 100 TB
    the sample is still tiny (centroids << data).  The assignment table is
    written partitioned by cell so a probe reads only nprobe cells."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids

    @staticmethod
    def build(df: DataFrame, n_cells: int = 16, vec_col: str = "embedding",
              sample: int = 10000, iters: int = 10, seed: int = 42) -> "IVFIndex":
        vecs = np.vstack(
            df.select(vec_col).limit(sample).toPandas()[vec_col].to_numpy())
        rng = np.random.RandomState(seed)
        cent = vecs[rng.choice(len(vecs), size=min(n_cells, len(vecs)), replace=False)]
        for _ in range(iters):
            d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(len(cent)):
                m = vecs[assign == c]
                if len(m):
                    cent[c] = m.mean(0)
        return IVFIndex(cent)

    def assign(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        cent = self.centroids

        @F.pandas_udf(T.IntegerType())
        def cell(vecs: pd.Series) -> pd.Series:
            m = np.vstack(vecs.to_numpy())
            d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            return pd.Series(d.argmin(1).astype(np.int32))

        return df.withColumn("ivf_cell", cell(F.col(vec_col)))

    def search(self, assigned: DataFrame, probe: list, k: int = 10,
               nprobe: int = 4, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
        """Top-k among the nprobe nearest cells (approximate; recall grows
        with nprobe).  The cell filter prunes partitions before any vector
        math runs (on a write_assigned store it prunes FILES: ivf_cell is
        the physical partition column, so non-probed cells are never read)."""
        p = np.asarray(probe, dtype=np.float64)
        d = ((self.centroids - p[None, :]) ** 2).sum(1)
        cells = [int(c) for c in np.argsort(d)[:nprobe]]
        return knn_cosine(assigned.filter(F.col("ivf_cell").isin(cells)),
                          probe, k, vec_col, id_col)

    def write_assigned(self, df: DataFrame, path: str,
                       vec_col: str = "embedding") -> str:
        """Assign cells and persist partitioned BY ivf_cell — the scale
        shape: a probe's isin(cells) filter becomes a Parquet partition
        filter, so search reads nprobe directories instead of the whole
        table (the file-level analogue of the reference's index-node
        pruning)."""
        (self.assign(df, vec_col)
         .write.mode("overwrite").partitionBy("ivf_cell").parquet(path))
        return path

    @staticmethod
    def read_assigned(spark, path: str) -> DataFrame:
        """Read a write_assigned store; pass the result to search."""
        return spark.read.parquet(path)


def pairwise_topk_cosine(df: DataFrame, k: int = 5, vec_col: str = "embedding",
                         id_col: str = "vec_id", planes: int = 8) -> DataFrame:
    """For each vector: its top-k most similar others, via hyperplane-LSH
    candidate generation + windowed rank (avoids the full N² cross join)."""
    from .dedup import embedding_near_dup_pairs
    from pyspark.sql import Window

    pairs = embedding_near_dup_pairs(df, vec_col, id_col,
                                     threshold=-1.0, planes=planes)
    sym = pairs.union(pairs.select(F.col("b_id").alias("a_id"),
                                   F.col("a_id").alias("b_id"), "cosine"))
    w = Window.partitionBy("a_id").orderBy(F.col("cosine").desc(), F.col("b_id"))
    return (sym.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col("a_id").alias(id_col),
                    F.col("b_id").alias("neighbor_id"), "cosine", "rnk"))
