"""PageRank: planted-structure sanity + mass conservation bounds."""

from __future__ import annotations

from big_data_assignment_2_spark.operators.graph import pagerank


def test_pagerank_star_center_wins(spark):
    """Star graph (everyone links to node 0): the center must dominate,
    leaves tie exactly; deterministic across runs."""
    edges = spark.createDataFrame(
        [(i, 0, 1) for i in range(1, 6)], "src long, dst long, w long")
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    r1 = {r["node"]: r["pagerank"]
          for r in pagerank(edges, nodes, iters=3).collect()}
    r2 = {r["node"]: r["pagerank"]
          for r in pagerank(edges, nodes, iters=3).collect()}
    assert r1 == r2
    assert r1[0] == max(r1.values())
    leaves = {r1[i] for i in range(1, 6)}
    assert len(leaves) == 1                      # exact tie
    assert r1[0] > 3 * next(iter(leaves))
    # mass: between the teleport floor and 1 (dangling node 0 leaks mass)
    total = sum(r1.values())
    assert 0.15 - 1e-6 <= total <= 1.0 + 1e-6


def test_pagerank_weight_sensitivity(spark):
    """Heavier in-edges mean higher rank: dst 1 takes a 9x weight share."""
    edges = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1)], "src long, dst long, w long")
    nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
    r = {x["node"]: x["pagerank"] for x in pagerank(edges, nodes, iters=2).collect()}
    assert r[1] > r[2] > 0
