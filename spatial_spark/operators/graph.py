"""Distributed connected components — min-label propagation with pointer
doubling.

Shared by ``density_islands`` (DensityIslands.java:26-55 parity) and the
near-duplicate clustering step of the dedup pipeline.

Each round takes::

    label(u) <- min(label(u), label(label(u)), min_{v ~ u} label(v))

The ``label(label(u))`` hop halves pointer-chain depth every round
(pointer jumping), so convergence is O(log diameter) rounds instead of
plain propagation's O(diameter) — the property that matters at 100 TB,
where a filament component can have huge diameter.

Lineage is truncated each round with ``localCheckpoint(eager=True)``:
the loop body references the previous round's frame ~5 times, so without
truncation the LOGICAL plan grows ~4-5x per round and Catalyst analysis
time explodes exponentially (minutes by round 8 — a plan-size problem,
independent of data size).  On a real cluster prefer a reliable
checkpoint dir (``sc.setCheckpointDir`` + ``.checkpoint()``):
localCheckpoint blocks live on executors and do not survive executor
loss — acceptable for bounded-round jobs, documented here as the seam.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def min_label_components(nodes: DataFrame, edges: DataFrame,
                         max_rounds: int = 50) -> DataFrame:
    """Connected components of the undirected graph.

    `nodes`: one column ``node`` (castable to long); `edges`: ``(a_id,
    b_id)`` pairs, either direction (symmetrized here).  Returns ``(node,
    island)`` with ``island`` = min node id of the component.  The round
    bound is a safety rail; an unconverged exit warns, never silently.
    """
    edges = edges.select(F.col("a_id").cast("long").alias("a_id"),
                         F.col("b_id").cast("long").alias("b_id"))
    edges = edges.union(edges.select(F.col("b_id").alias("a_id"),
                                     F.col("a_id").alias("b_id"))).cache()

    labels = (nodes.select(F.col("node").cast("long").alias("node"))
              .withColumn("island", F.col("node"))
              .localCheckpoint(eager=True))
    changed = -1
    for _ in range(max_rounds):
        neighbor_min = (edges.join(labels, edges.b_id == labels.node)
                        .groupBy("a_id").agg(F.min("island").alias("n_island"))
                        .withColumnRenamed("a_id", "node"))
        jump = (labels.alias("l1")
                .join(labels.select(F.col("node").alias("jnode"),
                                    F.col("island").alias("j_island")),
                      F.col("l1.island") == F.col("jnode"))
                .select(F.col("l1.node").alias("node"), "j_island"))
        new_island = F.least(
            F.col("island"),
            F.coalesce(F.col("n_island"), F.col("island")),
            F.coalesce(F.col("j_island"), F.col("island")))
        # convergence check rides the checkpoint job via Observation
        # (eager localCheckpoint goes through the action pipeline, so the
        # CollectMetrics node fills during the SAME materialization) —
        # one fewer join+count job per round
        from pyspark.sql import Observation
        obs = Observation()
        new_labels = (labels
                      .join(neighbor_min, "node", "left")
                      .join(jump, "node", "left")
                      .select("node", new_island.alias("island"),
                              (new_island != F.col("island"))
                              .cast("long").alias("_chg"))
                      .observe(obs, F.sum("_chg").alias("changed"))
                      .drop("_chg")
                      .localCheckpoint(eager=True))
        try:
            changed = int(obs.get["changed"] or 0)
        except Exception:  # metrics unavailable: fall back to a count job
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"),
                             F.col("n.node") == F.col("o.node"))
                       .filter(F.col("n.island") != F.col("o.island"))
                       .count())
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        warnings.warn(
            f"min_label_components: did not converge within {max_rounds} "
            f"rounds ({changed} labels still changing) — components with "
            f"log2(diameter) > {max_rounds} are split; raise the round "
            f"budget", RuntimeWarning)
    return labels
