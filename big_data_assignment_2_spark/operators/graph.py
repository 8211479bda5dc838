"""Iterative graph analytics on DataFrames (extension — not in reference).

Connected components (dedup clustering) lives in ``operators/dedup.py``;
this module holds weighted PageRank — the canonical "repeated join-agg
over the edge list" iteration, i.e. exactly the Pregel communication
pattern expressed in DataFrame operations:

    contrib(dst) = Σ_src rank(src) · weight(src→dst)/out_weight(src)
    rank'        = (1-d)/N + d · contrib         (d = damping)

Scale shape: each iteration is one equi-join of the (persisted,
pre-normalized) edge relation with the current rank relation plus one
hash-agg on dst — both shuffle on node id, map-side combinable, no
driver-side graph state.  Per-iteration ranks are ROUNDED to 6 dp, which
makes the double-summation order irrelevant and lets a SQL oracle replay
every iteration exactly (same determinism contract as the Lloyd k-means
in ``operators/similarity.py``).  Both iterations apply the
``localCheckpoint``-every-k-rounds lineage-truncation discipline of
``dedup.connected_components`` (``checkpoint_every``, default 5): below
the threshold — e.g. the gate's 3 unrolled iterations — the plan is the
pure lazy unroll the SQL oracle replays; past it the state relation is
materialized and the plan tree reset, so 20 iterations cost 20 stages,
not a 20-deep analyzed tree (checkpointing is semantically transparent —
it changes WHEN evaluation happens, never the rows).
Dangling nodes (no out-edges) leak their mass rather than redistributing
it — a documented, engine-portable simplification both sides replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, nodes: DataFrame, iters: int = 3,
             damping: float = 0.85, checkpoint_every: int = 5) -> DataFrame:
    """Weighted PageRank over ``edges`` (src, dst, w) for every node in
    ``nodes`` (node); returns (node, pagerank) after ``iters`` rounded
    iterations from the uniform start 1/N.

    N reaches the driver as one scalar (the node count); everything else
    is distributed join-agg.  Every ``checkpoint_every`` iterations the
    rank relation is ``localCheckpoint``-ed (eager) to truncate lineage —
    without it the analyzed plan grows one join-agg layer per round and
    plan processing, not execution, becomes the bottleneck past ~10
    rounds (see ``tests/test_graph.py::test_pagerank_checkpoint_depth``).
    """
    from pyspark import StorageLevel

    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = (edges.join(outw, "src")
         .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    n = nodes.count()
    base = (1.0 - damping) / n
    r = nodes.select("node", F.round(F.lit(1.0 / n), 6).alias("r"))
    for i in range(1, iters + 1):
        contrib = (e.join(r, e["src"] == r["node"])
                   .groupBy("dst")
                   .agg(F.sum(F.col("p") * F.col("r")).alias("c")))
        r = (nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
             .select("node",
                     F.round(F.lit(base)
                             + damping * F.coalesce("c", F.lit(0.0)),
                             6).alias("r")))
        if i % checkpoint_every == 0 and i < iters:
            r = r.localCheckpoint(eager=True)
    return r.select("node", F.col("r").alias("pagerank"))


def label_propagation(edges: DataFrame, nodes: DataFrame,
                      iters: int = 3, checkpoint_every: int = 5,
                      early_stop: bool = True) -> DataFrame:
    """Deterministic synchronous weighted label propagation (community
    detection) over the undirected graph induced by ``edges``
    (src, dst, w); returns (node, community) after ``iters`` rounds.

    Each round every node adopts the label with the highest total
    incident edge weight among its neighbors' PREVIOUS labels —
    ties broken by smallest label, isolated nodes keep their own — so
    the update is a pure function of the prior state and a SQL oracle
    can replay every round exactly (same contract as ``pagerank`` and
    the Lloyd k-means).  Per round: one equi-join of the persisted
    bidirectional edge relation with the label relation, one
    (node, label) hash-agg, one per-node top-1 window — all shuffled on
    node id, no driver-side graph state.

    Lineage hygiene mirrors :func:`pagerank`: every ``checkpoint_every``
    rounds the label relation is eagerly ``localCheckpoint``-ed, and the
    NEXT round is checkpointed too and compared against it; if no label
    moved between the two CONSECUTIVE states the update (a pure function
    of the prior state) has hit its fixed point and every remaining round
    would be an identity, so they are skipped (``early_stop``).
    Consecutive-state comparison matters: states k>1 rounds apart being
    equal would only prove a period-k cycle, and stopping there could
    change the answer.  The short-circuit can never change the result,
    so the unrolled SQL oracle stays exact; below ``checkpoint_every``
    rounds (the gate's 3) neither mechanism fires and the plan is the
    pure lazy unroll.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    bidir = (edges.select(F.col("src").alias("x"), F.col("dst").alias("y"),
                          "w")
             .unionAll(edges.select(F.col("dst").alias("x"),
                                    F.col("src").alias("y"), "w"))
             .filter(F.col("x") != F.col("y"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    labels = nodes.select("node", F.col("node").alias("lab"))
    prev_ckpt = None
    win = Window.partitionBy("x").orderBy(F.desc("wv"), F.asc("lab"))
    for i in range(1, iters + 1):
        votes = (bidir.join(labels, bidir["y"] == labels["node"])
                 .groupBy("x", "lab").agg(F.sum("w").alias("wv")))
        best = (votes.withColumn("rn", F.row_number().over(win))
                .filter(F.col("rn") == 1)
                .select(F.col("x").alias("node"), F.col("lab").alias("nl")))
        labels = (labels.join(best, "node", "left")
                  .select("node", F.coalesce("nl", "lab").alias("lab")))
        at_ckpt = i % checkpoint_every == 0
        after_ckpt = early_stop and prev_ckpt is not None \
            and (checkpoint_every == 1 or i % checkpoint_every == 1)
        if (at_ckpt or after_ckpt) and i < iters:
            labels = labels.localCheckpoint(eager=True)
            if after_ckpt:
                moved = (labels.alias("cur")
                         .join(prev_ckpt.alias("prv"), "node")
                         .filter(F.col("cur.lab") != F.col("prv.lab"))
                         .limit(1).count())
                if moved == 0:
                    break
            prev_ckpt = labels if at_ckpt else None
    return labels.select("node", F.col("lab").alias("community"))


def triangle_count(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over the undirected simple
    graph induced by ``edges`` (src, dst); returns (node, n_triangles)
    for every node in ``nodes``.

    Scale shape (Schank/compact-forward): orient each undirected edge
    from its lower-(degree, id) endpoint to the higher one, generate
    wedges by self-joining oriented edges on their SOURCE, and close each
    wedge against the undirected edge set.  The orientation bounds every
    node's oriented out-degree by O(sqrt(|E|)), so the wedge join — the
    only super-linear stage — produces O(|E|^1.5) rows worst-case instead
    of the O(Σ deg²) a naive neighbor self-join yields (on skewed graphs,
    the difference between feasible and not).  All equi-joins + hash
    aggs; no driver-side graph state.  The result is orientation-
    independent, so the SQL oracle replays the plain a<b<c triple join.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | \
        ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
    oriented = (und.join(da, "a").join(db, "b")
                .select(F.when(lower_first, F.col("a")).otherwise(F.col("b"))
                        .alias("u"),
                        F.when(lower_first, F.col("b")).otherwise(F.col("a"))
                        .alias("v")))
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = (o1.join(o2, "u")
              .filter(F.col("o1.v") < F.col("o2.v"))
              .select("u", F.col("o1.v").alias("x"), F.col("o2.v").alias("y")))
    tris = wedges.join(
        und, (F.least("x", "y") == F.col("a"))
        & (F.greatest("x", "y") == F.col("b"))).select("u", "x", "y")
    per_node = (tris.select(F.col("u").alias("node"))
                .unionAll(tris.select(F.col("x").alias("node")))
                .unionAll(tris.select(F.col("y").alias("node")))
                .groupBy("node").agg(F.count(F.lit(1)).alias("n")))
    return (nodes.join(per_node, "node", "left")
            .select("node", F.coalesce("n", F.lit(0)).alias("n_triangles")))


def khop_distances(edges: DataFrame, source: int, max_hops: int = 3,
                   checkpoint_every: int = 5) -> DataFrame:
    """Minimum-hop BFS from ``source`` over the directed edge list — the
    unit-weight single-source shortest-path member of the iterative
    family (Pregel frontier expansion as DataFrame operations).

    Round k joins the CURRENT FRONTIER (nodes first reached at round
    k-1, not the whole visited set) against the persisted edge relation
    and anti-joins the visited set, so per-round work is proportional to
    the frontier's out-edges — the textbook distributed BFS shape.
    Integer distances and pure set semantics make it deterministic and
    exactly replayable by an unrolled SQL oracle.  The
    ``localCheckpoint``-every-k-rounds lineage discipline of the other
    iterative operators applies past ``checkpoint_every`` rounds.

    Returns (node, dist) for every node within ``max_hops``; unreached
    nodes are absent (distance +inf is no row, not a sentinel).
    """
    from pyspark import StorageLevel

    spark = edges.sparkSession
    e = (edges.select(F.col("src").cast("int").alias("src"),
                      F.col("dst").cast("int").alias("dst"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    dist = spark.createDataFrame([(int(source), 0)], "node INT, dist INT")
    frontier = dist.select("node")
    for k in range(1, max_hops + 1):
        reached = (e.join(frontier, e["src"] == frontier["node"])
                   .select(F.col("dst").alias("node")).distinct())
        new = (reached.join(dist.select("node"), "node", "left_anti")
               .select("node", F.lit(k).alias("dist")))
        dist = dist.unionByName(new).persist(StorageLevel.MEMORY_AND_DISK)
        if k % checkpoint_every == 0:
            dist = dist.localCheckpoint(eager=True)
        frontier = new.select("node")
    return dist
