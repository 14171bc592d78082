"""Embedding-space clustering: distributed Lloyd k-means.

The SemDeDup-class curation recipe (cluster the corpus in embedding
space, then dedup/select within clusters) needs a k-means whose every
step survives 100 TB:

  * init — the k lowest-id vectors (DETERMINISTIC, so the DuckDB oracle
    can reproduce the whole run; k rows to the driver, bounded);
  * assign — map-only: centroids broadcast in the task closure, one
    Arrow batch GEMM per partition (|x|^2 - 2 x C^T + |c|^2), argmin
    with first-index tie-break;
  * update — ONE groupBy on k keys with per-element F.sum aggregates:
    partial aggregation (map-side combine) means the shuffle carries
    k x dim partial sums per partition, never vectors; empty clusters
    keep their previous centroid (Lloyd convention, oracle-mirrored).

Iterations are a driver loop over those two bounded steps — the
centroid state is k x dim floats, not data-scale.  Reference scope:
the reference engine has no clustering; this is part of the
training-data-pipeline axis (SURVEY §6 extension), same family as
operators/similarity.IVFIndex (whose build is a sampled one-shot
assignment, not iterated Lloyd).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["kmeans", "semdedup"]


def _assign(df: DataFrame, cent: np.ndarray, vec_col: str) -> DataFrame:
    """Map-only cluster assignment under broadcast centroids."""
    c = cent.astype(np.float64)
    c_sq = (c * c).sum(1)

    @F.pandas_udf(T.IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        x = np.array(list(vecs), dtype=np.float64)
        if x.size == 0:
            return pd.Series([], dtype="int32")
        d = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + c_sq[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return df.withColumn("cluster", nearest(F.col(vec_col)))


def kmeans(df: DataFrame, k: int = 8, iters: int = 3,
           vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Lloyd k-means over an ``array<float>`` column; returns the input
    ids with their cluster under the centroids after ``iters`` updates.

    Deterministic end to end: init = the k lowest-``id_col`` vectors,
    argmin ties break to the smallest cluster index, empty clusters
    keep their previous centroid — a DuckDB oracle replays the exact
    run.  Scale: per iteration one broadcast-assign (map-only) and one
    k-key groupBy whose partial aggregation ships k x dim sums, so the
    driver never holds more than the k x dim centroid state."""
    init_rows = (df.orderBy(id_col).limit(k)
                 .select(vec_col).collect())
    cent = np.array([r[0] for r in init_rows], dtype=np.float64)
    if cent.shape[0] < k:
        raise ValueError(f"kmeans: need >= {k} rows, got {cent.shape[0]}")
    dim = cent.shape[1]            # from the init collect — no extra job

    sums = [F.sum(F.col(vec_col).getItem(j).cast("double")).alias(f"s{j}")
            for j in range(dim)]
    for _ in range(iters):
        agg = (_assign(df, cent, vec_col)
               .groupBy("cluster")
               .agg(F.count(F.lit(1)).alias("n"), *sums)
               .collect())                      # k rows x dim doubles
        new = cent.copy()                       # empty cluster keeps old
        for row in agg:
            new[row["cluster"]] = np.array(
                [row[f"s{j}"] for j in range(dim)]) / row["n"]
        cent = new
    return (_assign(df, cent, vec_col)
            .select(id_col, "cluster"))


def semdedup(df: DataFrame, k: int = 8, iters: int = 3,
             threshold: float = 0.44, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (Abbas et al. 2023 shape): k-means the corpus, then
    drop near-duplicates WITHIN each cluster — returns (id, cluster,
    kept) for every input row.

    The drop rule is the deterministic one-pass convention: a row is
    dropped iff SOME smaller-id row in its cluster has cosine >=
    ``threshold`` with it (independent of that row's own fate), so the
    result needs no transitive closure and a relational oracle can
    replay it.  Exact mode by construction: the within-cluster pair
    scan is one applyInPandas per cluster (a GEMM on the cluster's
    vectors).  That is the documented exact-oracle baseline, same
    contract as operators/dedup.semantic_dedup's exact mode — at
    production scale clusters bound the pair volume (n^2/k for
    balanced clusters), and the scale path for oversized clusters is
    recursing kmeans or hyperplane LSH within the cluster."""
    assigned = kmeans(df, k=k, iters=iters, vec_col=vec_col,
                      id_col=id_col)
    data = df.select(id_col, vec_col).join(assigned, id_col)
    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("cluster", T.IntegerType()),
        T.StructField("kept", T.BooleanType()),
    ])

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        v = np.array(list(pdf[vec_col].iloc[order]), dtype=np.float64)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        kept = np.ones(len(ids), dtype=bool)
        # row j drops iff max_{i<j} cos(i, j) >= threshold: chunk the
        # GEMM so memory stays (chunk x n), never n x n
        chunk = 2048
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            s = vn[lo:hi] @ vn.T            # (chunk, n)
            for r in range(hi - lo):
                j = lo + r
                if j > 0 and s[r, :j].max() >= threshold:
                    kept[j] = False
        return pd.DataFrame({
            id_col: ids,
            "cluster": np.full(len(ids), int(pdf["cluster"].iloc[0]),
                               dtype=np.int32),
            "kept": kept})

    return data.groupBy("cluster").applyInPandas(scan, out_schema)
