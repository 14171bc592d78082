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

import concurrent.futures
import warnings

from pyspark.sql import DataFrame, functions as F

#: Seconds to wait for an ``Observation`` metric before falling back to an
#: explicit count job.  ``Observation.get`` blocks indefinitely if the
#: CollectMetrics node is never reported (possible across Spark versions
#: when the action is a localCheckpoint), so the wait must be bounded — a
#: hang here would deadlock dedup_clusters / density_islands outright.
_OBSERVATION_TIMEOUT_S = 60.0


def _observation_changed(obs, fallback) -> int:
    """Read ``obs.get["changed"]`` with a bounded wait.

    The blocking property access runs on a daemon worker thread; on
    timeout or error the ``fallback`` thunk (a count job) supplies the
    answer instead.  A timed-out reader thread is abandoned (it holds no
    locks we need), which degrades to one extra Spark job per round — the
    pre-Observation behavior — rather than a hang.
    """
    ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(lambda: obs.get["changed"])
        try:
            return int(fut.result(timeout=_OBSERVATION_TIMEOUT_S) or 0)
        except Exception:  # timeout, metrics unavailable, cast failure
            return int(fallback())
    finally:
        ex.shutdown(wait=False)


def _split_active(nodes: DataFrame, edges_sym: DataFrame):
    """Split ``nodes`` into (edge-endpoint nodes, singleton nodes).

    ``edges_sym`` must already be symmetrized, so ``a_id`` alone covers
    every endpoint.  Semi/anti joins never widen rows and need no
    distinct on the edge side.  Exposed module-level so tests can pin the
    invariant that the pointer-doubling loop only ever carries endpoint
    rows — the difference between shuffling |dup-candidates| and |corpus|
    per round at 100 TB, where almost every document is a singleton.
    """
    endpoints = edges_sym.select("a_id")
    active = nodes.join(endpoints, nodes.node == endpoints.a_id,
                        "left_semi")
    singles = nodes.join(endpoints, nodes.node == endpoints.a_id,
                         "left_anti")
    return active, singles


#: Edge-count ceiling for the driver union-find short-circuit.  4M
#: symmetrized edge rows ≈ 64 MB on the driver — the same order as a
#: broadcast-join build side.  Above it, the distributed pointer-doubling
#: loop runs (the 100 TB path).
_DRIVER_UNION_FIND_EDGES = 4_000_000


def _driver_union_find(nodes_l: DataFrame, edges_one: DataFrame) -> DataFrame:
    """Small-graph short-circuit: collect the (cached, ONE-directional)
    edge list, run union-find on the driver, broadcast the
    endpoint→island mapping back, and label the corpus with ONE
    broadcast left join.  Union-find is direction-blind, so the caller
    never symmetrizes for this path (r15: the union's two branches each
    replayed the candidate-pair lineage — half the collect, one compute).

    Matches the distributed loop's semantics exactly: an edge only takes
    effect if BOTH endpoints are in ``nodes`` (the loop drops the other
    rows at its two joins), so membership is checked via a broadcast
    semi-join before union-find — the endpoint set, not the corpus, is
    what comes back to the driver.

    Two-level designs like this are the standard CC recipe at scale
    (iterate distributed until the frontier fits, then finish locally);
    here the dedup pair graph usually starts below the threshold, which
    turns the whole clustering step into a single broadcast join over the
    corpus — no iterative job overhead at all.
    """
    # Arrow collects (guide §6): pickled Row paths pay per-row cost; the
    # pair list is two long columns.
    eps = edges_one.select("a_id", "b_id").toPandas()
    endpoints = edges_one.select(F.col("a_id").alias("node")).union(
        edges_one.select(F.col("b_id").alias("node")))
    member_pdf = (nodes_l.join(F.broadcast(endpoints), "node", "left_semi")
                  .toPandas())
    member = set(member_pdf["node"].tolist())
    parent = {n: n for n in member}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(eps["a_id"].tolist(), eps["b_id"].tolist()):
        if a in member and b in member:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)  # min-label union
    mapping = [(n, find(n)) for n in member]
    spark = nodes_l.sparkSession
    if not mapping:
        return nodes_l.withColumn("island", F.col("node"))
    from ..localrel import arrow_local_df
    map_df = arrow_local_df(spark, mapping, "node long, island long")
    return (nodes_l.join(F.broadcast(map_df), "node", "left")
            .select("node", F.coalesce("island", "node").alias("island")))


def min_label_components(nodes: DataFrame, edges: DataFrame,
                         max_rounds: int = 50,
                         driver_threshold: int = _DRIVER_UNION_FIND_EDGES,
                         ) -> DataFrame:
    """Connected components of the undirected graph.

    `nodes`: one column ``node`` (castable to long); `edges`: ``(a_id,
    b_id)`` pairs, either direction (symmetrized here).  Returns ``(node,
    island)`` with ``island`` = min node id of the component.  The round
    bound is a safety rail; an unconverged exit warns, never silently.

    Nodes with no incident edge are their own island by definition, so
    they are split off before the iteration and unioned back at the end:
    the O(log diameter) join/checkpoint loop runs only on edge endpoints.
    Graphs whose edge list fits on the driver (≤ ``driver_threshold``
    symmetrized rows) skip the loop entirely via ``_driver_union_find``.
    """
    # Cache the ONE-directional edge list and count it first (r15, guide
    # §2.4/§5): symmetrizing before the cache made the union's two
    # branches each replay the candidate-pair lineage (minhash/banding/
    # verify — the expensive part) inside the count job.  Now the pairs
    # compute exactly once; the symmetrized frame, when the iterative
    # path needs it, is a cheap union over the in-memory rows.
    e0 = edges.select(F.col("a_id").cast("long").alias("a_id"),
                      F.col("b_id").cast("long").alias("b_id")).cache()

    nodes_l = nodes.select(F.col("node").cast("long").alias("node"))
    n_edges = 2 * e0.count()  # symmetrized row count, as documented
    if n_edges <= driver_threshold:
        try:
            return _driver_union_find(nodes_l, e0)
        finally:
            e0.unpersist()
    edges = e0.union(e0.select(F.col("b_id").alias("a_id"),
                               F.col("a_id").alias("b_id"))).cache()
    active, _ = _split_active(nodes_l, edges)
    labels = (active
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
        old_labels = labels

        def _count_changed():
            return (new_labels.alias("n")
                    .join(old_labels.alias("o"),
                          F.col("n.node") == F.col("o.node"))
                    .filter(F.col("n.island") != F.col("o.island"))
                    .count())

        changed = _observation_changed(obs, _count_changed)
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    e0.unpersist()
    if changed != 0:
        warnings.warn(
            f"min_label_components: did not converge within {max_rounds} "
            f"rounds ({changed} labels still changing) — components with "
            f"log2(diameter) > {max_rounds} are split; raise the round "
            f"budget", RuntimeWarning)
    # Singletons re-enter as their own islands via an anti-join against
    # the CHECKPOINTED final labels (== the edge-endpoint set), not
    # against `edges`: the edge frame is unpersisted by now and its
    # lineage is the expensive candidate-pair pipeline, which must not
    # recompute when the caller materializes the result.
    singles = nodes_l.join(labels.select("node"), "node", "left_anti")
    return labels.union(singles.withColumn("island", F.col("node")))


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             checkpoint_every: int = 4) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list; returns
    (node, rank) for every endpoint after ``iters`` power steps.

    The classic one-shuffle-per-iteration Spark shape: ranks join the
    out-degree table (broadcast-sized per node id — both shuffles key
    on the node id so AQE reuses the partitioning), contributions
    groupBy(dst) with map-side partial sums, dangling nodes (no
    out-edges) simply stop forwarding mass — the deterministic
    convention a relational oracle replays exactly:

        rank'(v) = (1 - d)/N + d * sum_{(u,v) in E} rank(u)/outdeg(u)

    ``localCheckpoint`` every ``checkpoint_every`` rounds truncates the
    iterative lineage the same way min_label_components does, so
    iters=20 does not compile a 20-deep join tree — but a short run
    (iters <= the period) stays ONE lazy plan that AQE optimizes whole,
    instead of paying a materialization job per round (r15, guide §5:
    each eager checkpoint was a full 32-partition shuffle-join job; the
    3-step gate ran 3 of them where 1 suffices).  The final frame is
    always checkpointed eagerly, so consumers that both count and
    re-read it (the gate shape) compute the power steps once."""
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    # the per-iteration loop touches three STATIC frames (edges with
    # their out-degree attached, and the node set) — persist them once
    # so every power step replays k x |E| cached rows, not the upstream
    # scan+distinct lineage; out-degree is pre-joined outside the loop
    # (it never changes), leaving ONE rank join per iteration
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_deg = e.join(outdeg, "src").persist()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(iters):
        contrib = (e_deg.join(ranks.withColumnRenamed("node", "src"),
                              "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("outdeg"))
                           .alias("share"))
                   .groupBy("node")
                   .agg(F.sum("share").alias("contrib")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(base) + F.lit(damping)
                          * F.coalesce(F.col("contrib"), F.lit(0.0)))
                         .alias("rank")))
        if i + 1 < iters and (i + 1) % max(checkpoint_every, 1) == 0:
            ranks = ranks.localCheckpoint(eager=True)
    ranks = ranks.localCheckpoint(eager=True)
    e_deg.unpersist()
    nodes.unpersist()
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-vertex triangle participation counts over an undirected
    graph → (vertex, n_triangles), vertices in ≥1 triangle.

    The node-iterator shape with DEGREE ORIENTATION (the standard
    at-scale trick): every edge orients from its (degree, id)-smaller
    endpoint to the larger, which caps each vertex's out-degree at
    O(sqrt(m)) — so the wedge self-join (the only quadratic-looking
    step) generates at most O(m^1.5) candidates on ANY graph, hot
    celebrity vertices included, instead of O(Σ deg²) for the naive
    orientation.  Three shuffles total: degree agg, wedge self-join on
    the pivot, closing-edge semi-join.

    No reference counterpart (the reference has OSM graph hops only);
    extension axis alongside min_label_components / pagerank.
    """
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (edges.select(a.alias("a"), b.alias("b"))
         .where(F.col("a") != F.col("b")).distinct())
    deg = (e.select(F.explode(F.array("a", "b")).alias("v"))
           .groupBy("v").agg(F.count(F.lit(1)).alias("d")))
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    keyed = e.join(da, "a").join(db, "b")
    # orient u -> w by (degree, id); struct comparison is lexicographic
    fwd = F.struct(F.col("da").alias("d"), F.col("a").alias("v")) \
        < F.struct(F.col("db").alias("d"), F.col("b").alias("v"))
    oriented = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(fwd, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dw"))
    l = oriented.select(F.col("u"), F.col("w").alias("x"),
                        F.col("dw").alias("dx"))
    r = oriented.select(F.col("u"), F.col("w").alias("y"),
                        F.col("dw").alias("dy"))
    wedges = (l.join(r, "u")
              .where(F.struct(F.col("dx").alias("d"), F.col("x").alias("v"))
                     < F.struct(F.col("dy").alias("d"),
                                F.col("y").alias("v"))))
    closing = oriented.select(F.col("u").alias("x"), F.col("w").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "left_semi") \
        .select("u", "x", "y")
    return (tris.select(F.explode(F.array("u", "x", "y")).alias("vertex"))
            .groupBy("vertex")
            .agg(F.count(F.lit(1)).alias("n_triangles")))


# ---------------------------------------------------------------------------
# Strongly connected components (directed)
# ---------------------------------------------------------------------------
def _driver_tarjan(nodes: list, edge_pairs: list) -> dict:
    """Iterative Tarjan SCC over a driver-side edge list (the bounded
    short-circuit twin of _driver_union_find).  Returns node -> min
    member id of its SCC."""
    adj: dict = {}
    for a, b in edge_pairs:
        adj.setdefault(a, []).append(b)
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    label: dict = {}
    counter = [0]

    for root in nodes:
        if root in index:
            continue
        # explicit call stack: (node, iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return label


def _min_reach_labels(nodes: DataFrame, edges: DataFrame,
                      max_rounds: int) -> tuple[DataFrame, bool]:
    """min-label DIRECTED reachability fixpoint: label(v) = min node id
    with a path to v along ``edges`` (including v itself).  Plain
    propagation — one edges⋈labels + groupBy(dst) per round, O(longest
    shortest-path) rounds (pointer jumping does not apply to directed
    reachability; the peel loop bounds how much of the graph is live).
    Lineage-truncated per round.

    Returns ``(labels, converged)``.  ``converged`` is False when the
    round budget ran out while labels were still changing — the labels
    are then window-local minima, NOT the fixpoint, and MUST NOT be
    used to settle SCCs (a directed ring longer than ``max_rounds``
    would make every node see only itself both ways and settle as a
    wrong singleton).  The caller mirrors the max_peels rail: warn and
    leave the peel unsettled instead of returning wrong labels."""
    labels = (nodes.withColumn("lab", F.col("node"))
              .localCheckpoint(eager=True))
    changed = 0
    for _ in range(max_rounds):
        upd = (edges.join(labels,
                          edges["src"] == labels["node"])
               .groupBy(F.col("dst").alias("node"))
               .agg(F.min("lab").alias("in_lab")))
        from pyspark.sql import Observation
        obs = Observation()
        new_lab = F.least(F.col("lab"),
                          F.coalesce(F.col("in_lab"), F.col("lab")))
        new_labels = (labels.join(upd, "node", "left")
                      .select("node", new_lab.alias("lab"),
                              (new_lab != F.col("lab"))
                              .cast("long").alias("_chg"))
                      .observe(obs, F.sum("_chg").alias("changed"))
                      .drop("_chg")
                      .localCheckpoint(eager=True))
        old = labels

        def _count():
            return (new_labels.alias("n")
                    .join(old.alias("o"), F.col("n.node") == F.col("o.node"))
                    .filter(F.col("n.lab") != F.col("o.lab")).count())

        changed = _observation_changed(obs, _count)
        labels = new_labels
        if changed == 0:
            break
    return labels, changed == 0


def strongly_connected_components(edges: DataFrame, src: str = "src",
                                  dst: str = "dst", max_peels: int = 20,
                                  max_rounds: int = 50,
                                  driver_threshold: int =
                                  _DRIVER_UNION_FIND_EDGES) -> DataFrame:
    """SCCs of a directed graph: (node, scc) with scc = min member id.

    Distributed algorithm: FW-BW min-label peeling.  Per peel, compute
    F(v) = min id reaching v (forward min-label fixpoint) and B(v) =
    min id v reaches (same on reversed edges); nodes with F(v) == B(v)
    = m are mutually reachable with m → settled with label m.  Every
    peel settles at least the SCC of the smallest live id (its id
    reaches its whole SCC both ways), so the loop terminates; chains of
    many SCCs need many peels — ``max_peels`` is the safety rail and an
    unconverged exit warns, never silently.  Between peels the live
    subgraph shrinks by settled nodes (semi-join on both endpoints).

    Graphs whose edge list fits on the driver (≤ ``driver_threshold``
    rows) short-circuit to iterative Tarjan — one pass, exact — the
    same bounded-driver pattern as connected components.  Completes the
    graph-operator suite: CC (undirected), PageRank (influence),
    triangles (cohesion), SCC (directed cycles: dependency knots,
    link-farm detection)."""
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    spark = edges.sparkSession
    n_edges = e.count()
    if n_edges <= driver_threshold:
        pairs = [(r["src"], r["dst"]) for r in e.collect()]
        node_list = sorted({a for a, _ in pairs} | {b for _, b in pairs})
        lab = _driver_tarjan(node_list, pairs)
        from ..localrel import arrow_local_df
        return arrow_local_df(spark, sorted(lab.items()),
                              "node long, scc long")

    active_nodes = nodes.localCheckpoint(eager=True)
    active_edges = e
    settled_parts = []
    for _ in range(max_peels):
        if active_nodes.limit(1).count() == 0:
            break
        fwd, fwd_ok = _min_reach_labels(active_nodes, active_edges,
                                        max_rounds)
        bwd, bwd_ok = _min_reach_labels(
            active_nodes,
            active_edges.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")),
            max_rounds)
        if not (fwd_ok and bwd_ok):
            # Truncated reachability minima can WRONGLY satisfy F==B
            # (window-local minimum on paths longer than max_rounds) —
            # settling from them would return silently split SCCs.
            # Mirror the max_peels rail: warn + leave the live subgraph
            # unsettled (warn-not-wrong).
            import warnings as _w
            remaining = active_nodes.count()
            _w.warn(
                f"strongly_connected_components: min-label fixpoint did "
                f"not converge within max_rounds={max_rounds}; leaving "
                f"{remaining} nodes unsettled — raise max_rounds for "
                f"graphs with directed paths longer than the budget",
                RuntimeWarning)
            break
        joined = (fwd.withColumnRenamed("lab", "f")
                  .join(bwd.withColumnRenamed("lab", "b"), "node"))
        settled = (joined.filter(F.col("f") == F.col("b"))
                   .select("node", F.col("f").alias("scc"))
                   .localCheckpoint(eager=True))
        settled_parts.append(settled)
        active_nodes = (active_nodes
                        .join(settled.select("node"), "node", "left_anti")
                        .localCheckpoint(eager=True))
        live = active_nodes.select(F.col("node"))
        active_edges = (active_edges
                        .join(live.withColumnRenamed("node", "src"), "src")
                        .join(live.withColumnRenamed("node", "dst"), "dst")
                        .localCheckpoint(eager=True))
    else:
        import warnings as _w
        remaining = active_nodes.count()
        if remaining:
            _w.warn(f"strongly_connected_components: {remaining} nodes "
                    f"unsettled after {max_peels} peels — raise max_peels "
                    f"for SCC-chain-deep graphs", RuntimeWarning)
    if not settled_parts:
        return spark.createDataFrame([], "node long, scc long")
    out = settled_parts[0]
    for p in settled_parts[1:]:
        out = out.union(p)
    return out
