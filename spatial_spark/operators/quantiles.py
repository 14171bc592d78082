"""Deterministic mergeable quantile sketch (Munro–Paterson / MRL shape).

The corpus-statistics twin of the Bloom/CMS/HLL family in
operators/sketch.py: approximate quantiles of a 100 TB column (quality
scores, document lengths, perplexities) without a global sort.  A
pipeline picks filter thresholds ("drop the worst 20 % by quality")
from these — so the sketch must be REPRODUCIBLE: a re-run that lands
on a different threshold silently changes the corpus.

Hence no RNG anywhere (the KLL random-offset compactor is replaced by
the classic deterministic MRL rule): a buffer per level holding up to
2k values; on overflow the buffer is sorted and alternating elements
are promoted to the next level with doubled weight, the selection
parity alternating per level-compaction so neither rank direction is
systematically favored.  Total weight is conserved exactly, memory is
O(k·log(n/k)) per partition, and the whole build is one mapInPandas
pass + one small merge task — the per-partition sketches (a few k·log
rows each) are the ONLY thing shuffled, never the data.

Determinism contract: the sketch VALUES depend on the partitioning
(any parallel sketch's do); for a FIXED partitioning the result is
bit-reproducible, and merge(partials) == what the same rule produces
over the concatenated buffers — pinned exactly in tests (possible
only because the compactor is deterministic).  The rank-error bound
holds for every partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MRLSketch", "partition_sketches", "merge_sketches",
           "sketch_quantiles", "quantiles"]

_SK_SCHEMA = T.StructType([
    T.StructField("level", T.IntegerType(), False),
    T.StructField("value", T.DoubleType(), False),
])


class MRLSketch:
    """Local deterministic MRL sketch: the model the distributed path
    (and the tests) replay exactly."""

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = int(k)
        self.levels: list[list[float]] = [[]]
        self._parity: list[int] = [0]

    def _compact(self, lvl: int) -> None:
        buf = self.levels[lvl]
        if len(buf) < 2 * self.k:
            return
        buf.sort()
        take = buf[self._parity[lvl]::2]          # alternating elements
        self._parity[lvl] ^= 1
        self.levels[lvl] = []
        if lvl + 1 == len(self.levels):
            self.levels.append([])
            self._parity.append(0)
        self.levels[lvl + 1].extend(take)
        self._compact(lvl + 1)

    def update(self, value: float) -> None:
        self.levels[0].append(float(value))
        self._compact(0)

    def extend(self, values) -> None:
        for v in values:
            self.update(v)

    def merge_rows(self, rows) -> None:
        """Fold (level, value) rows of another sketch into this one, in
        (level, value) order — the canonical merge the distributed path
        uses, so merge order never depends on partition arrival order."""
        for lvl, val in sorted(rows):
            lvl = int(lvl)
            while lvl >= len(self.levels):
                self.levels.append([])
                self._parity.append(0)
            self.levels[lvl].append(float(val))
            self._compact(lvl)

    def rows(self) -> list[tuple[int, float]]:
        return [(lvl, v) for lvl, buf in enumerate(self.levels)
                for v in sorted(buf)]

    def total_weight(self) -> int:
        return sum((1 << lvl) * len(buf)
                   for lvl, buf in enumerate(self.levels))

    def quantile(self, q: float) -> float:
        items = sorted((v, lvl) for lvl, buf in enumerate(self.levels)
                       for v in buf)
        if not items:
            raise ValueError("empty sketch")
        n = self.total_weight()
        target = max(1, int(np.ceil(q * n)))
        acc = 0
        for v, lvl in items:
            acc += 1 << lvl
            if acc >= target:
                return v
        return items[-1][0]


def partition_sketches(df: DataFrame, value_col: str,
                       k: int = 256) -> DataFrame:
    """One MRL sketch per partition → (level, value) rows.  Map-only;
    the output is O(k·log(n_part/k)) rows per partition."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = MRLSketch(k)
        seen = False
        for pdf in batches:
            vals = pdf[value_col].dropna()
            if len(vals):
                seen = True
                sk.extend(vals.astype(float).tolist())
        if seen:
            rows = sk.rows()
            yield pd.DataFrame({"level": [r[0] for r in rows],
                                "value": [r[1] for r in rows]})

    return df.select(value_col).mapInPandas(run, _SK_SCHEMA)


def merge_sketches(sketch_rows: DataFrame, k: int = 256) -> DataFrame:
    """Merge partial sketches into one: all (level, value) rows flow to
    a single task (they are tiny) and fold through the same
    deterministic compactor in canonical (level, value) order."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = MRLSketch(k)
        rows = []
        for pdf in batches:
            rows.extend(zip(pdf["level"].astype(int),
                            pdf["value"].astype(float)))
        if rows:
            sk.merge_rows(rows)
            out = sk.rows()
            yield pd.DataFrame({"level": [r[0] for r in out],
                                "value": [r[1] for r in out]})

    return sketch_rows.repartition(1).mapInPandas(run, _SK_SCHEMA)


def sketch_quantiles(sketch_rows: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates from sketch rows, JVM-side: one window cumsum
    over the (tiny) sketch → (q, value).  Rank rule: the smallest value
    whose cumulative weight reaches ceil(q·N) (N = total weight), i.e.
    the exact q-th order statistic when the sketch is uncompacted."""
    w = F.expr("shiftleft(CAST(1 AS BIGINT), level)")
    ranked = (sketch_rows
              .withColumn("_w", w)
              .withColumn("_cum", F.sum("_w").over(
                  Window.orderBy("value", "level")
                  .rowsBetween(Window.unboundedPreceding, 0)))
              .withColumn("_n", F.sum("_w").over(Window.partitionBy())))
    from ..localrel import arrow_local_df
    qdf = arrow_local_df(ranked.sparkSession,
                         [(float(q),) for q in qs], "q double")
    hits = (ranked.crossJoin(F.broadcast(qdf))
            .where(F.col("_cum") >=
                   F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_n"))))
            .groupBy("q").agg(F.min("value").alias("value")))
    return hits.orderBy("q")


def quantiles(df: DataFrame, value_col: str, qs: list[float],
              k: int = 256) -> DataFrame:
    """End-to-end: partition sketches → canonical merge → (q, value)."""
    return sketch_quantiles(merge_sketches(
        partition_sketches(df, value_col, k), k), qs)
