"""Graph-analytics family: weighted PageRank over the nation→nation trade
graph (supplier nation ships to customer nation, edge weight = lineitem
count), 3 rounded iterations replayed exactly by an unrolled SQL oracle —
the second iterative algorithm under hard cross-engine verification
(alongside the Lloyd k-means in the similarity family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..hints import broadcast_if_small
from ..operators.graph import label_propagation, pagerank, triangle_count
from ..sources.io import load_table

PR_ITERS = 3
PR_DAMPING = 0.85


def q_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who sits at the center of the trade network: PageRank over nation
    trade edges.  Edge building is three broadcast-dimension equi-joins +
    one hash-agg; the iteration is operators/graph.pagerank."""
    edges = _trade_edges(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    pr = pagerank(edges, nodes, iters=PR_ITERS, damping=PR_DAMPING)
    return (pr.join(F.broadcast(nation),
                    pr["node"] == nation["n_nationkey"])
            .select(F.col("n_name").alias("nation"), "pagerank"))


def _pagerank_oracle() -> str:
    n_cte = "(SELECT count(*) FROM nation)"
    ctes = [f"""e AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2)""",
            "outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY src)",
            "ep AS (SELECT e.src, e.dst, e.w / outw.ow AS p "
            "FROM e JOIN outw USING (src))",
            "nd AS (SELECT n_nationkey AS node FROM nation)",
            f"r0 AS (SELECT node, round(1.0 / {n_cte}, 6) AS r FROM nd)"]
    for i in range(1, PR_ITERS + 1):
        ctes.append(f"""r{i} AS (
  SELECT nd.node,
         round((1 - {PR_DAMPING}) / {n_cte}
               + {PR_DAMPING} * coalesce(sum(ep.p * pr.r), 0), 6) AS r
  FROM nd LEFT JOIN ep ON ep.dst = nd.node
          LEFT JOIN r{i - 1} pr ON pr.node = ep.src
  GROUP BY nd.node)""")
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT n.n_name AS nation, r{PR_ITERS}.r AS pagerank
FROM r{PR_ITERS} JOIN nation n ON n.n_nationkey = r{PR_ITERS}.node
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (li.join(broadcast_if_small(s), li["l_suppkey"] == s["s_suppkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(broadcast_if_small(c), o["o_custkey"] == c["c_custkey"])
            .groupBy(F.col("s_nationkey").alias("src"),
                     F.col("c_nationkey").alias("dst"))
            .agg(F.count(F.lit(1)).alias("w")))


def q_triangles_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation per nation over the undirected trade graph
    (clustering structure of the trade network).  Degree-ordered
    orientation bounds the wedge join — see operators/graph.triangle_count;
    the oracle replays the orientation-independent a<b<c triple join."""
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    tc = triangle_count(_trade_edges(spark, sf_dir), nodes)
    return (tc.join(F.broadcast(nation), tc["node"] == nation["n_nationkey"])
            .select(F.col("n_name").alias("nation"), "n_triangles"))


_TRIANGLES_SQL = """
WITH e0 AS MATERIALIZED (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
-- MATERIALIZED is load-bearing: DuckDB otherwise inlines und into each
-- of the three triangle-join references, re-running the 4-table edge
-- build three times, and join reordering then degenerates the src!=dst
-- predicate into a customer x supplier NESTED-LOOP product (measured:
-- >100 GB of temp spill at the 10x scale corpus).  Materialized, the
-- tiny nation-level edge list is computed once and the triple join is
-- milliseconds at any corpus scale.
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src != dst),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
per_node AS (
  SELECT node, count(*) AS n FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri)
  GROUP BY node)
SELECT n.n_name AS nation, coalesce(p.n, 0) AS n_triangles
FROM nation n LEFT JOIN per_node p ON p.node = n.n_nationkey
"""


LPA_ITERS = 3


def q_communities_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-network communities via deterministic weighted label
    propagation (3 synchronous rounds; see operators/graph).  The oracle
    unrolls every round, so a green row proves the full iteration."""
    nation = load_table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    lp = label_propagation(_trade_edges(spark, sf_dir), nodes,
                           iters=LPA_ITERS)
    return (lp.join(F.broadcast(nation), lp["node"] == nation["n_nationkey"])
            .select(F.col("n_name").alias("nation"),
                    F.col("community").cast("int").alias("community")))


def _lpa_oracle() -> str:
    ctes = ["""e0 AS MATERIALIZED (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2)""",
            """bidir AS MATERIALIZED (
  SELECT src AS x, dst AS y, w FROM e0 WHERE src != dst
  UNION ALL SELECT dst, src, w FROM e0 WHERE src != dst)""",
            "l0 AS MATERIALIZED (SELECT n_nationkey AS node, "
            "n_nationkey AS lab FROM nation)"]
    for i in range(1, LPA_ITERS + 1):
        ctes.append(f"""v{i} AS MATERIALIZED (
  SELECT b.x AS node, l.lab, sum(b.w) AS wv
  FROM bidir b JOIN l{i - 1} l ON l.node = b.y
  GROUP BY 1, 2)""")
        ctes.append(f"""l{i} AS MATERIALIZED (
  SELECT p.node, coalesce(best.lab, p.lab) AS lab
  FROM l{i - 1} p
  LEFT JOIN (SELECT node, lab FROM (
      SELECT node, lab, row_number() OVER (
        PARTITION BY node ORDER BY wv DESC, lab ASC) AS rn
      FROM v{i}) WHERE rn = 1) best ON best.node = p.node)""")
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT n.n_name AS nation, CAST(l.lab AS INT) AS community
FROM l{LPA_ITERS} l JOIN nation n ON n.n_nationkey = l.node
"""


KHOP_SOURCE = 6    # GERMANY-ish key: picked for multi-hop structure
KHOP_FRAC = 0.6    # strong-lane cutoff: w >= 0.6 * max(w)
KHOP_HOPS = 3


def q_khop_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source min-hop BFS (unit-weight shortest paths) from
    nation KHOP_SOURCE over the STRONG trade lanes only — the dense
    trade graph has diameter ~1, so the relative weight cutoff
    (w ≥ 0.6·max) keeps the heavy lanes and produces genuine multi-hop
    structure (hops 0/1/2 at the gate scales, some nations unreached).
    max(w) reaches the driver as one scalar (the same bounded-collect
    contract as PageRank's node count); distances are exact integers —
    the unrolled SQL oracle replays every frontier round."""
    from ..operators.graph import khop_distances

    edges = _trade_edges(spark, sf_dir)
    mx = edges.agg(F.max("w")).collect()[0][0]
    strong = edges.filter(F.col("w") >= KHOP_FRAC * mx).select("src", "dst")
    d = khop_distances(strong, KHOP_SOURCE, max_hops=KHOP_HOPS)
    nation = load_table(spark, sf_dir, "nation")
    return (d.join(F.broadcast(nation),
                   d["node"] == nation["n_nationkey"])
            .select(F.col("n_name").alias("nation"), "dist"))


def _khop_oracle() -> str:
    ctes = ["""e AS MATERIALIZED (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2)""",
            f"""es AS MATERIALIZED (
  SELECT src, dst FROM e WHERE w >= {KHOP_FRAC} * (SELECT max(w) FROM e))""",
            f"d0 AS MATERIALIZED (SELECT CAST({KHOP_SOURCE} AS INTEGER) "
            f"AS node, 0 AS dist)"]
    for k in range(1, KHOP_HOPS + 1):
        ctes.append(f"""n{k} AS MATERIALIZED (
  SELECT DISTINCT es.dst AS node FROM es JOIN d{k - 1} d
  ON es.src = d.node)""")
        ctes.append(f"""d{k} AS MATERIALIZED (
  SELECT * FROM d{k - 1}
  UNION ALL
  SELECT node, {k} AS dist FROM n{k}
  WHERE node NOT IN (SELECT node FROM d{k - 1}))""")
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT n.n_name AS nation, CAST(d.dist AS INTEGER) AS dist
FROM d{KHOP_HOPS} d JOIN nation n ON n.n_nationkey = d.node
"""


QUERIES = {
    "graph_khop_trade": q_khop_trade,
    "graph_pagerank_trade": q_pagerank_trade,
    "graph_triangles_trade": q_triangles_trade,
    "graph_communities_trade": q_communities_trade,
}

ORACLES = {
    "graph_khop_trade": _khop_oracle(),
    "graph_pagerank_trade": _pagerank_oracle(),
    "graph_triangles_trade": _TRIANGLES_SQL,
    "graph_communities_trade": _lpa_oracle(),
}
