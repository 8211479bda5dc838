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
in ``operators/similarity.py``).  At real scale you would
``localCheckpoint`` the rank relation every few iterations to truncate
lineage — the same discipline ``dedup.connected_components`` applies.
Dangling nodes (no out-edges) leak their mass rather than redistributing
it — a documented, engine-portable simplification both sides replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, nodes: DataFrame, iters: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Weighted PageRank over ``edges`` (src, dst, w) for every node in
    ``nodes`` (node); returns (node, pagerank) after ``iters`` rounded
    iterations from the uniform start 1/N.

    N reaches the driver as one scalar (the node count); everything else
    is distributed join-agg.
    """
    from pyspark import StorageLevel

    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = (edges.join(outw, "src")
         .select("src", "dst", (F.col("w") / F.col("ow")).alias("p"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    n = nodes.count()
    base = (1.0 - damping) / n
    r = nodes.select("node", F.round(F.lit(1.0 / n), 6).alias("r"))
    for _ in range(iters):
        contrib = (e.join(r, e["src"] == r["node"])
                   .groupBy("dst")
                   .agg(F.sum(F.col("p") * F.col("r")).alias("c")))
        r = (nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
             .select("node",
                     F.round(F.lit(base)
                             + damping * F.coalesce("c", F.lit(0.0)),
                             6).alias("r")))
    return r.select("node", F.col("r").alias("pagerank"))
