"""Scale-adaptive parallelism for CPU-heavy per-row stages.

The driver's testdata tables are single parquet files with ONE row group
each, so every scan plans exactly one task and a narrow map chain
(lang-id, Gopher rules, shingling, minhash, token explodes, codec
decodes) runs on one core of a 32-core session until the first shuffle —
and AQE then coalesces the tiny shuffle back down, so the heavy work
never parallelizes (spark_optimization_guide.md §2.1 "not enough
partitions" and §2.2 "derive partitioning from the data and session, not
constants").

``spread`` widens such inputs to session parallelism with one
round-robin exchange, and is a strict no-op whenever the input already
has that many partitions — i.e. on any production-shaped source (a
100 TB table scans as thousands of splits), so this never adds an
exchange at scale; it only fixes the degenerate narrow-scan case.
Results are unchanged: every caller is an order-insensitive
filter/agg/join pipeline (callers with window/order semantics must keep
their own explicit ordering, as all of ours do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * multiple`` iff it
    currently has fewer partitions than that; otherwise return it
    untouched.  ``multiple`` > 1 suits stages whose per-row cost is very
    uneven (codec decodes) — more slices smooth stragglers."""
    sc = df.sparkSession.sparkContext
    target = max(int(sc.defaultParallelism) * int(multiple), 1)
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic plans; stay lazy
        return df
    if n >= target:
        return df
    return df.repartition(target)
