"""Graph analytics over the trade graph.

Third graph-operator family next to connected components
(``functions/hashing.py`` q_dup_clusters / q_cc_star) and PageRank
(``operators/analytics.py`` q_pagerank): triangle counting (clustering
structure) and multi-source BFS (reachability / hop distance).  The
reference repo delegates all querying to Postgres; these are the graph
shapes a Postgres user would reach for with recursive CTEs
(reference parity: the registry/FK schema in
``migrations/20251023000001_create_blocks.sql`` is the graph source
there; here the analog is the customer-nation → supplier-nation trade
edge set, the same derivation q_pagerank uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashing import _iter_session, _size_rounds_to
from ..storage import ITER_STORAGE

#: Edge derivation shared with q_pagerank: nation u → nation v when a
#: customer in u bought from a supplier in v (distinct pairs).
_EDGES_SQL = """
    SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the undirected trade graph,
    via the ordered node-iterator join: orient every undirected edge
    low→high, join e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) so each triangle is
    enumerated exactly once (a<b<c), then credit all three corners.

    Scale: with edges oriented by degree (here by id — the graph is
    dim-sized; at 100 TB you orient low-degree→high-degree), the
    two-path fan-out is bounded by out-degree of the MIDDLE node and
    the whole computation is two shuffles on edge endpoints — the
    published O(m^{3/2}) MPC triangle algorithm expressed as two
    equi-joins, no cross join and no adjacency-list materialization
    beyond the edge relation itself. The closing-edge join (e3)
    filters two-paths before they leave the join, so the shuffle
    carries two-paths only between partitions, never the quadratic
    neighborhood expansion."""
    spark = _iter_session(spark)
    edges = _trade_edges(spark, sf_dir)
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .persist(ITER_STORAGE)
    )
    # corpus-sized edge derivation materializes under the session's
    # cluster-sized shuffle confs; the triangle joins then run over
    # the BOUNDED persisted edge frame, so size their shuffles to it
    # (the r7 512-way AQE initial count re-inflated the graph family
    # ~2-3x at fixture scale without this)
    _size_rounds_to(spark, und.count())
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return (
        corners.groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy("node")
    )


def q_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance: from every nation of region 0,
    the minimum number of directed trade hops to each reachable
    nation, capped at 3 rounds — frontier-expansion BFS as iterative
    equi-joins (the DataFrame spelling of the recursive-CTE shape
    q_recursive_cte runs natively).

    Scale: each round joins the FRONTIER (only nodes first reached
    last round, not the whole visited set) against the edge relation —
    one shuffle per round on the edge key, frontier size bounded by
    node count; the visited set grows monotonically and is min-merged
    with a map-side-combinable groupBy. Fixed depth keeps the plan
    statically bounded; an open-ended BFS would localCheckpoint per
    round like q_dup_clusters."""
    spark = _iter_session(spark)
    edges = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst")).persist(ITER_STORAGE)
    _size_rounds_to(spark, edges.count())  # loop shuffles sized to the bounded graph
    nation = table(spark, sf_dir, "nation")
    sources = nation.filter(F.col("n_regionkey") == 0).select(
        F.col("n_nationkey").alias("node"), F.lit(0).alias("dist")
    )
    visited = sources
    frontier = sources
    for _ in range(3):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        frontier = nxt.join(visited.select("node"), "node", "left_anti")
        visited = (
            visited.unionByName(frontier)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return visited.orderBy("node")


SSSP_ROUNDS = 4  # fixed Bellman-Ford relaxation rounds (q_pagerank stance)
SSSP_SOURCE = 0


def q_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford, 4 fixed
    relaxation rounds from nation 0) over the trade graph with
    deterministic synthetic tolls w(u,v) = 1 + (31u + 17v) mod 97 —
    the weighted completion of the graph family (q_bfs_reach is the
    unweighted hop-count twin). Each round is ONE join (current
    distances x edges) + ONE min-aggregate + a null-skipping `least`
    merge — the relax step as relational algebra; rounds are fixed so
    both engines compute the identical K-round frontier (the
    q_pagerank fixed-iteration stance; at convergence-critical scale
    you iterate to fixpoint with the q_cc_star checkpoint pattern and
    AQE sizes each round's shuffle).

    Scale: distances table is |V| rows, the per-round shuffle carries
    |E| relaxation candidates — Bellman-Ford's honest cost; Dijkstra's
    priority queue does not distribute, which is why every bulk-
    synchronous graph engine (Pregel/GraphX/GraphFrames) ships exactly
    this algorithm."""
    spark = _iter_session(spark)
    edges = (
        _trade_edges(spark, sf_dir)
        .where(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            (1 + (F.col("src") * 31 + F.col("dst") * 17) % 97).alias("w"),
        )
        .persist(ITER_STORAGE)
    )
    _size_rounds_to(spark, edges.count())  # loop shuffles sized to the bounded graph
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
    )
    dist = nodes.select(
        "node",
        F.when(F.col("node") == SSSP_SOURCE, F.lit(0)).alias("dist"),
    )
    for _ in range(SSSP_ROUNDS):
        relaxed = (
            dist.where(F.col("dist").isNotNull())
            .join(edges, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("best"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select("node", F.least("dist", "best").alias("dist"))
        )
    return dist.orderBy("node")


def _sssp_oracle() -> str:
    """Unrolled Bellman-Ford rounds: d{r+1}(v) = least(d{r}(v),
    min over in-edges of d{r}(u) + w) — `least` skips NULLs in both
    engines, so unreached nodes stay NULL until relaxed."""
    # Every CTE is MATERIALIZED (r10): each round references d{r}
    # TWICE, and DuckDB inlines plain CTEs — the 4-join edge
    # derivation re-executed 2^rounds times took the first sf0.1 gate
    # to a 97 GB OOM kill. Materialization makes the oracle linear in
    # rounds, exactly like the Spark side's persisted edge frame.
    ctes = [
        f"e AS MATERIALIZED (SELECT src, dst, 1 + (src * 31 + dst * 17) % 97 AS w"
        f" FROM ({_EDGES_SQL}) WHERE src <> dst)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e"
        " UNION SELECT DISTINCT dst FROM e)",
        "d0 AS MATERIALIZED (SELECT node, CASE WHEN node = 0 THEN 0 END AS dist"
        " FROM nodes)",
    ]
    for r in range(SSSP_ROUNDS):
        ctes.append(
            f"""d{r + 1} AS MATERIALIZED (
              SELECT n.node,
                     least(n.dist,
                           (SELECT min(d.dist + e.w) FROM d{r} d
                            JOIN e ON d.node = e.src AND e.dst = n.node
                            WHERE d.dist IS NOT NULL)) AS dist
              FROM d{r} n
            )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, dist FROM d{SSSP_ROUNDS} ORDER BY node"
    )


ORACLE: dict[str, str] = {
    "q_shortest_path": _sssp_oracle(),
    "q_triangle_count": f"""
        WITH e AS MATERIALIZED ({_EDGES_SQL}),
        und AS (
          SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM e WHERE src <> dst
        ),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e1.v = e2.u
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        corners AS (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri
        )
        SELECT node, count(*) AS n_triangles
        FROM corners GROUP BY node ORDER BY node
    """,
    "q_bfs_reach": f"""
        WITH RECURSIVE e AS MATERIALIZED ({_EDGES_SQL}),
        walk(node, dist) AS (
          SELECT n_nationkey, 0 FROM nation WHERE n_regionkey = 0
          UNION ALL
          SELECT e.dst, w.dist + 1
          FROM walk w JOIN e ON w.node = e.src
          WHERE w.dist < 3 AND e.src <> e.dst
        )
        SELECT node, min(dist) AS dist FROM walk GROUP BY node ORDER BY node
    """,
}
