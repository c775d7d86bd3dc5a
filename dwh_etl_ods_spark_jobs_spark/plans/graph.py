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


QUERIES = {
    "graph_pagerank_topk": q_pagerank,
    "graph_degree_histogram": q_degree_histogram,
}
ORACLES = {
    "graph_pagerank_topk": SQL_PAGERANK,
    "graph_degree_histogram": SQL_DEGREE_HIST,
}
