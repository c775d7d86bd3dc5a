"""Graph-analytics queries (PageRank, degree histogram) with DuckDB
oracles, over the supplier↔customer transaction graph.

The graph: an undirected edge between supplier S and customer C whenever
some order line ships S's part to C (distinct pairs from
lineitem ⋈ orders) — symmetrized into two directed edges so every node
has out-degree ≥ 1 (see graph.pagerank's dangling-node note). Node ids
pack both partitions into one BIGINT key space: supplier → 2·suppkey,
customer → 2·custkey + 1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import graph as G

PR_ITERS = 3
PR_TOPK = 20


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _sc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .join(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("l_suppkey") * 2).alias("s"),
            (F.col("o_custkey") * 2 + 1).alias("c"),
        )
        .distinct()
    )
    return pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionAll(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )


_SC_EDGES_SQL = """
WITH sc AS (
  SELECT DISTINCT l.l_suppkey * 2 AS s, o.o_custkey * 2 + 1 AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT s AS src, c AS dst FROM sc
UNION ALL
SELECT c AS src, s AS dst FROM sc
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most central nodes after PR_ITERS exact-integer PageRank
    iterations. Rank stage is TakeOrdered (per-partition top-K)."""
    ranks = G.pagerank(_sc_edges(spark, sf_dir), iterations=PR_ITERS)
    return ranks.orderBy(F.desc("rank_micro"), F.asc("node")).limit(PR_TOPK)


SQL_PAGERANK = (
    G.pagerank_sql(
        "SELECT src, dst FROM ("
        + _SC_EDGES_SQL
        + ") _sym_",
        iterations=PR_ITERS,
    )
    + f"\nORDER BY rank_micro DESC, node LIMIT {PR_TOPK}"
)


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer partition: how many customers
    bought from exactly d distinct suppliers. Two uniform shuffles."""
    edges = _sc_edges(spark, sf_dir)
    deg = (
        edges.filter(F.col("src") % 2 == 1)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_customers"))


SQL_DEGREE_HIST = f"""
WITH edges AS ({_SC_EDGES_SQL}),
deg AS (SELECT src, count(*) AS degree FROM edges WHERE src % 2 = 1 GROUP BY 1)
SELECT degree, count(*) AS n_customers FROM deg GROUP BY 1
"""


TRI_MIN_SUPPORT = 2  # ≥3 leaves the sf0.01 graph triangle-free (weak oracle)


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (u < v) part–part edges: pairs co-purchased in ≥
    TRI_MIN_SUPPORT orders (the supplier↔customer graph is bipartite and
    triangle-free, so triangles need this one-mode projection). The
    self-join keys on the order id — fan-out bounded by lines-per-order²,
    never part×part."""
    lines = (
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a, b = lines.alias("a"), lines.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("_s"))
        .filter(F.col("_s") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )


_COPURCHASE_EDGES_SQL = f"""
SELECT u, v FROM (
  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS s
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
) _p WHERE s >= {TRI_MIN_SUPPORT}
"""


def q_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph. Uses
    degree-ordered orientation (graph.triangle_census) so the wedge join's
    per-key fan-out is O(√m) even under power-law degrees — the pattern
    that survives 100 TB."""
    return G.triangle_census(_copurchase_edges(spark, sf_dir)).select(
        F.col("node").alias("partkey"), "n_triangles"
    )


SQL_TRIANGLES = f"""
WITH per_node AS ({G.triangle_census_sql(_COPURCHASE_EDGES_SQL)})
SELECT node AS partkey, n_triangles FROM per_node
"""


QUERIES = {
    "graph_pagerank_topk": q_pagerank,
    "graph_triangle_census": q_triangle_census,
}
ORACLES = {
    "graph_pagerank_topk": SQL_PAGERANK,
    "graph_triangle_census": SQL_TRIANGLES,
}
# Battery consolidation (VERDICT r6 #7): the degree histogram is the triangle
# census's own first stage; still oracle-verified at pytest level.
RETIRED_QUERIES = {"graph_degree_histogram": q_degree_histogram}
RETIRED_ORACLES = {"graph_degree_histogram": SQL_DEGREE_HIST}
