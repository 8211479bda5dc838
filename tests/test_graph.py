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


def test_triangle_count_known_graph(spark):
    """K4 on {0,1,2,3} (every node in C(3,2)=3 triangles) + a pendant edge
    4-5 (no triangles) + an isolated node 6; direction/duplicates/self-
    loops in the input must not matter."""
    from big_data_assignment_2_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 4), (4, 4)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_count(edges, nodes).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 5: 0, 6: 0}


def test_triangle_count_matches_naive(spark):
    """Degree-ordered orientation is result-invisible: counts equal the
    naive a<b<c triple join on a pseudo-random graph."""
    import itertools

    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.graph import triangle_count

    n = 30
    pairs = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if (a * 7 + b * 13) % 5 < 2]         # deterministic ~40% density
    edges = spark.createDataFrame(pairs, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_count(edges, nodes).collect()}
    es = set(pairs)
    naive = {i: 0 for i in range(n)}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for v in (a, b, c):
                naive[v] += 1
    assert got == naive


def test_label_propagation_planted_communities(spark):
    """Two heavy cliques {0,1,2} and {3,4,5} joined by one weak bridge:
    after 3 rounds each clique converges to its min label and the bridge
    does not merge them; isolated node 6 keeps its own label."""
    from big_data_assignment_2_spark.operators.graph import label_propagation

    heavy, weak = 100, 1
    edges = []
    for grp in ((0, 1, 2), (3, 4, 5)):
        for a in grp:
            for b in grp:
                if a < b:
                    edges.append((a, b, heavy))
    edges.append((2, 3, weak))
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    got = {r["node"]: r["community"]
           for r in label_propagation(e, nodes, iters=3).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == got[5] == 3
    assert got[6] == 6
    # deterministic across runs
    again = {r["node"]: r["community"]
             for r in label_propagation(e, nodes, iters=3).collect()}
    assert got == again


def _plan_depth(df) -> int:
    """Max indentation depth of the analyzed plan tree — grows linearly
    with unrolled iterations unless lineage is truncated."""
    plan = df._jdf.queryExecution().analyzed().treeString()
    return max((len(line) - len(line.lstrip())
                for line in plan.splitlines() if line.strip()), default=0)


def test_pagerank_checkpoint_depth(spark):
    """Verdict r6 task #4: at iters=10 the checkpointed plan tree must be
    no deeper than the 5-iteration unroll (lineage truncated at round 5),
    while the uncheckpointed unroll keeps growing — and the rounded ranks
    must be bit-identical either way (checkpointing is transparent)."""
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 8, 1 + i % 3) for i in range(8)]
        + [(i, 0, 2) for i in range(1, 8)], "src long, dst long, w long")
    nodes = spark.createDataFrame([(i,) for i in range(8)], "node long")
    deep = pagerank(edges, nodes, iters=10, checkpoint_every=100)
    shallow = pagerank(edges, nodes, iters=10, checkpoint_every=5)
    five = pagerank(edges, nodes, iters=5, checkpoint_every=100)
    assert _plan_depth(shallow) <= _plan_depth(five) < _plan_depth(deep)
    assert sorted(map(tuple, shallow.collect())) \
        == sorted(map(tuple, deep.collect()))


def test_label_propagation_checkpoint_and_early_stop(spark):
    """LPA lineage discipline + fixed-point short-circuit.  The label
    relation is referenced TWICE per round (neighbor join + carry-over
    join), so an uncheckpointed unroll grows the plan tree EXPONENTIALLY
    (~2^iters nodes — iters=20 without checkpointing does not even finish
    analysis; this is precisely why the discipline exists, so the
    reference unroll here stays at 6 rounds).  On the planted two-clique
    graph labels converge in <=3 rounds, hence the 6-round pure unroll
    result IS the fixed point; iters=20 with checkpoint+early_stop must
    reach the same labels while keeping the executed plan shallow."""
    from big_data_assignment_2_spark.operators.graph import label_propagation

    heavy, weak = 100, 1
    edges = []
    for grp in ((0, 1, 2), (3, 4, 5)):
        for a in grp:
            for b in grp:
                if a < b:
                    edges.append((a, b, heavy))
    edges.append((2, 3, weak))
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    full = label_propagation(e, nodes, iters=6, checkpoint_every=100,
                             early_stop=False)
    fast = label_propagation(e, nodes, iters=20, checkpoint_every=5,
                             early_stop=True)
    assert sorted(map(tuple, fast.collect())) \
        == sorted(map(tuple, full.collect()))
    assert _plan_depth(fast) < _plan_depth(full)


def test_khop_chain_diamond_and_unreachable(spark):
    """BFS min-hop semantics on a planted graph: chain distances, the
    diamond node gets its MIN distance once, unreachable nodes are
    absent, and max_hops truncates the frontier."""
    from big_data_assignment_2_spark.operators.graph import khop_distances

    #   1 -> 2 -> 3 -> 4 (chain)
    #   1 -> 5, 2 -> 5    (diamond: 5 reachable at hop 1 and 2 -> keep 1)
    #   9 -> 1            (in-edge only: 9 unreachable FROM 1)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (2, 5), (9, 1)],
        "src int, dst int")
    got = {r["node"]: r["dist"]
           for r in khop_distances(edges, 1, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 1}
    capped = {r["node"]: r["dist"]
              for r in khop_distances(edges, 1, max_hops=2).collect()}
    assert capped == {1: 0, 2: 1, 3: 2, 5: 1}   # 4 beyond the cap
