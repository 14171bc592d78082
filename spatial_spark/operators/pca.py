"""PCA over embedding columns — the whitening/dim-reduction stage of a
training-data pipeline (dedup in a projected space, outlier pruning,
explained-variance corpus diagnostics).

Spark-first shape: the covariance's sufficient statistics (n, Σx, Σxxᵀ)
come from ONE mapInPandas pass — each partition ships a single
(1 + dim + dim²)-value row, so the driver never sees data, only the
k-byte Gram partials (dim=64 → 33 KB per partition).  The principal
direction is a FIXED-ITERATION deterministic power iteration (init =
e₀, L2-normalize each step) — the same unrolled-procedure trick as
operators/graph.pagerank, which is what lets a SQL oracle replay the
entire computation including the iteration, without an eigensolver.
Projection is map-only under the broadcast (μ, v).

Determinism contract: the output is "the result of THIS procedure"
(8 power steps from e₀), not "the abstract top eigenvector" — so it is
reproducible and cross-engine checkable even when the eigengap is
small and 8 steps under-converge.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["covariance_stats", "power_component", "pca_project"]


def covariance_stats(df: DataFrame, vec_col: str = "embedding"):
    """(n, mean, cov): population covariance from one distributed pass
    (per-partition Gram partials; the shuffle carries dim² doubles per
    partition, never vectors)."""
    dim = len(df.select(vec_col).first()[0])
    schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("g", T.ArrayType(T.DoubleType())),
    ])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if not len(x):
                continue
            n += len(x)
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame([{"n": n, "s": s.tolist(),
                                 "g": g.reshape(-1).tolist()}])

    rows = df.select(vec_col).mapInPandas(partials, schema).collect()
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("covariance_stats: empty input")
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    g = np.sum([np.array(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def power_component(cov: np.ndarray, iters: int = 8) -> np.ndarray:
    """Deterministic power iteration: v₀ = e₀, vₜ₊₁ = Σvₜ/‖Σvₜ‖₂,
    exactly `iters` steps — the procedure the SQL oracle unrolls."""
    v = np.zeros(cov.shape[0])
    v[0] = 1.0
    for _ in range(iters):
        v = cov @ v
        v = v / np.sqrt((v * v).sum())
    return v


def pca_project(df: DataFrame, vec_col: str = "embedding",
                id_col: str = "vec_id", iters: int = 8) -> DataFrame:
    """Add `proj` — each vector's coordinate along the deterministic
    principal direction, (x−μ)·v.  One stats pass + one map-only
    projection under the broadcast (μ, v)."""
    _n, mean, cov = covariance_stats(df, vec_col)
    v = power_component(cov, iters)
    mu = mean.copy()

    @F.pandas_udf(T.DoubleType())
    def proj(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series((x - mu[None, :]) @ v)

    return df.withColumn("proj", proj(F.col(vec_col)))
