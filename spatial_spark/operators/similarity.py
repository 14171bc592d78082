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


# -------------------------------------------------------- int8 quantized ANN
def quantize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization (the memory-bound scale
    lever: a 100 TB float32 embedding table becomes ~25 TB and the
    candidate scan touches a quarter of the bytes).  Adds:

      * ``q``  — array<int> with values in [-127, 127],
        round(v * 127 / max|v|),
      * ``q_scale`` — max|v| / 127 (dequant multiplier; 0 for the
        all-zero vector, whose ``q`` is all zeros).

    Pure Column math (transform/aggregate — JVM-side), deterministic."""
    vc = F.col(vec_col)
    mx = F.aggregate(F.transform(vc, lambda x: F.abs(x)),
                     F.lit(0.0), lambda acc, v: F.greatest(acc, v))
    df = df.withColumn("_mx", mx)
    q = F.when(F.col("_mx") == 0.0,
               F.transform(vc, lambda x: F.lit(0))) \
         .otherwise(F.transform(
             vc, lambda x: F.round(x * 127.0 / F.col("_mx"))
             .cast("int")))
    return (df.withColumn("q", q)
            .withColumn("q_scale", F.col("_mx") / 127.0)
            .drop("_mx"))


def knn_cosine_q8(df: DataFrame, probe: list, k: int = 10,
                  rescore: int = 4, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Quantized-scan + exact-rescore cosine top-k: candidates are the
    top ``k * rescore`` rows by INT8 cosine (integer dot products over
    the 4x-smaller quantized column — the part that scans the corpus),
    and only those candidates get the exact float cosine, whose top-k
    is returned (same output schema/rounding as ``knn_cosine``).

    The approximation only affects which rows REACH the rescore:
    whenever the true top-k survives the candidate cut (int8 cosine
    error is ~1/127 per component; recall-vs-rescore is pinned in
    tests), the result EQUALS the brute-force baseline."""
    p = np.asarray(probe, dtype=np.float64)
    mx = float(np.abs(p).max())
    qp = (np.round(p * 127.0 / mx).astype(int) if mx > 0
          else np.zeros(len(p), dtype=int))
    qp_lit = F.array(*[F.lit(int(v)) for v in qp])
    qp_norm = float(np.sqrt((qp.astype(np.float64) ** 2).sum())) or 1.0
    qdf = quantize_embeddings(df, vec_col)
    qdot = F.aggregate(
        F.zip_with("q", qp_lit, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v).cast("double")
    qnorm = F.sqrt(F.aggregate(
        F.transform("q", lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v).cast("double"))
    cand = (qdf.withColumn(
                "q_cosine",
                qdot / (F.greatest(qnorm, F.lit(1e-12)) * F.lit(qp_norm)))
            .orderBy(F.col("q_cosine").desc(), F.col(id_col).asc())
            .limit(k * rescore))
    exact = F.when(_norm(F.col(vec_col)) == 0.0, F.lit(-1.0)) \
        .otherwise(cosine_to_probe(vec_col, probe))
    return (cand
            .withColumn("cosine", F.round(exact, 6))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, "cosine"))
