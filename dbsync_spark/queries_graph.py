"""Declared queries for the iterative graph operators (functions/graph.py).

q_pagerank is the headline: an ITERATIVE algorithm that still fully
hash-matches a DuckDB oracle, because the recurrence is scaled-integer
with floor division (order-independent sums) and the oracle unrolls the
same fixed iteration count into a CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbsync_spark.functions import graph as gr
from dbsync_spark.queries import _register
from dbsync_spark.sources.tables import read_table

_N_ITERS = 8

_TRADE_EDGES_CTE = """edges AS (
  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
)"""


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation trade graph: an edge supplier-nation -> customer-nation for
    every pair that traded at least once. Dimension joins broadcast; the
    lineitem-orders join is the only shuffle and AQE plans it."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"),
                F.col("c_nationkey").alias("dst"))
        .distinct()
    )


_BFS_SOURCES_CTE = """sources AS (
  SELECT n_nationkey AS node FROM nation WHERE n_regionkey = 0
)"""

_BFS_ITERS = 4


@_register(
    "q_bfs_paths",
    gr.bfs_oracle_sql(_TRADE_EDGES_CTE, _BFS_SOURCES_CTE,
                      n_iters=_BFS_ITERS),
)
def q_bfs_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-depth BFS shortest paths over the nation trade graph, seeded
    from region 0's nations: how many hops of trading relationships
    separate every nation from the seed region (NULL = unreachable within
    4 hops). The iterative frontier join is the distributed Pregel BFS
    step; integer distances keep it hash-matchable against the unrolled
    CTE oracle (see functions/graph.py::bfs_distances)."""
    nation = read_table(spark, sf_dir, "nation")
    seeds = (nation.where(F.col("n_regionkey") == 0)
             .select(F.col("n_nationkey").alias("node")))
    return gr.bfs_distances(trade_edges(spark, sf_dir), seeds,
                            n_iters=_BFS_ITERS)


@_register(
    "q_triangle_count",
    gr.triangle_oracle_sql(_TRADE_EDGES_CTE),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation triangle participation counts over the (undirected)
    trade graph — the clustering/cohesion primitive for interaction
    graphs. The Spark plan is the degree-ordered two-join enumeration
    (wedge fan-out bounded by oriented out-degree, so it survives
    power-law hubs at scale); exact integer counts hash-match the
    id-ordered oracle enumeration."""
    return gr.triangle_counts(trade_edges(spark, sf_dir))


@_register(
    "q_pagerank",
    gr.pagerank_oracle_sql(_TRADE_EDGES_CTE, n_iters=_N_ITERS),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation trade graph (8 iterations, damping 0.85,
    scaled-integer exact). Each iteration = one shuffle join + one
    aggregate with lineage truncated — the pattern holds for a
    billion-edge graph; here the graph is small but the plan is the
    at-scale plan."""
    return gr.pagerank(trade_edges(spark, sf_dir), n_iters=_N_ITERS)


_SPARSE_EDGES_CTE = """edges AS (
  SELECT DISTINCT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= 48
)"""

_KCORE_K = 4
_KCORE_ROUNDS = 4


def sparse_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite customer-supplier interaction graph restricted to
    high-quantity line items: node ids are disambiguated by parity
    (2*custkey vs 2*suppkey+1 — integer arithmetic both engines repeat
    exactly). One shuffle join + distinct; the quantity filter is pushed
    to the lineitem scan."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    return (
        li.where(F.col("l_quantity") >= 48)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
        .distinct()
    )


@_register(
    "q_kcore",
    gr.kcore_oracle_sql(_SPARSE_EDGES_CTE, k=_KCORE_K,
                        n_rounds=_KCORE_ROUNDS),
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition (k=4) of the high-quantity customer-supplier
    graph: iterative peel until only nodes with >= 4 surviving trading
    partners remain — the graph-density primitive for finding the
    stable trading core (and, on interaction graphs generally, spam/bot
    filtering and community seeding). Fixed 4-round peel (fixpoint depth
    is 2 on this graph — tests assert convergence); integer degrees
    hash-match the unrolled CTE oracle (functions/graph.py::kcore)."""
    return gr.kcore(sparse_trade_edges(spark, sf_dir), k=_KCORE_K,
                    n_rounds=_KCORE_ROUNDS)
