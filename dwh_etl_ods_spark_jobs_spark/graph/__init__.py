"""Distributed graph analytics on DataFrame edge lists.

Extends the engine beyond the reference's relational surface (and beyond
``dedup.connected_components``) with the other staple iterative graph
primitive, PageRank — useful on entity graphs a warehouse already holds
(supplier↔customer, doc-similarity, user-interaction).

Design: the whole computation is EXACT BIGINT arithmetic — ranks are
integer micro-units, per-edge contributions use integer division, and the
damping step is ``BASE + (85 · Σcontrib) div 100`` — so iteration order,
partitioning, and aggregation order cannot perturb a single bit, and a
DuckDB rendering of the same unrolled iterations hash-matches exactly
(the repo's standing float discipline, cf. ``curation.bigram_lm_score``).

Scale: each iteration is one equi-join (ranks ⋈ edges on src — both
shuffle-partitioned on the same uniform key, so AQE reuses the layout)
plus one map-side-combinable sum keyed by dst. Fixed iteration counts
keep the lineage shallow; for deep iteration reuse the localCheckpoint
pattern from ``dedup.connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PR_MICRO", "PR_DAMP_PCT", "pagerank"]

PR_MICRO = 1_000_000          # rank scale: 1.0 == 1e6 micro-units
PR_DAMP_PCT = 85              # damping 0.85 as an integer percentage


def pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Exact-integer PageRank over a directed edge list ``(src, dst)``.

    Every node must have out-degree ≥ 1 (symmetrize the edge list for
    undirected graphs — that also removes dangling-mass redistribution,
    which this implementation deliberately omits). Self-loops and
    duplicate edges are honored as given; pre-``distinct()`` if unwanted.

    Per-node rank starts at ``PR_MICRO`` (the "rank 1.0 per node"
    formulation, so ranks need no global normalization pass); each
    iteration sets ``rank = (100-d)% · 1e6 + d% · Σ_src(rank_src div
    outdeg_src)`` in pure BIGINT ops. Returns ``(node, rank_micro)``.
    """
    base = (PR_MICRO * (100 - PR_DAMP_PCT)) // 100
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    # Degree-annotated edges feed every iteration: pre-join ONCE and
    # localCheckpoint (the dedup.connected_components lineage discipline)
    # so neither the edge derivation nor the degree join is replayed per
    # round — one join + one aggregation per iteration remain, which is
    # PageRank's floor (sf0.1 medians hover 3–4 s either way — the edge
    # derivation itself, shared with graph_degree_histogram, dominates;
    # the checkpoint's value is asymptotic: without it each extra
    # iteration replays the full lineitem⋈orders build).
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=False)
    # The node universe is the out-degree-bearing src set. Ranks must be
    # rebuilt over ALL nodes every round via a LEFT join: a node with no
    # inbound edges still holds rank `base` and keeps CONTRIBUTING its
    # outgoing mass — an inner join on contrib would silently drop it
    # (and, next round, its neighbors' inbound mass) from the computation.
    # nodes joins back every iteration (the rank rebuild); its deg subtree
    # shares the grouping exchange via ReuseExchange, so checkpointing it
    # separately measured no better (A/B'd at sf0.1) — keep the plan lean.
    nodes = deg.select(F.col("src").alias("node"))
    ranks = nodes.withColumn("rank_micro", F.lit(PR_MICRO).cast("long"))
    for _ in range(iterations):
        contrib = (
            edges_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_sc"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({PR_DAMP_PCT} * coalesce(_sc, CAST(0 AS BIGINT))) div 100")
            ).cast("long").alias("rank_micro"),
        )
    return ranks


def pagerank_sql(edges_cte: str, iterations: int = 3) -> str:
    """DuckDB rendering: the same iterations unrolled as chained CTEs from
    the same constants — bit-identical to :func:`pagerank`.

    ``edges_cte`` must be a CTE body selecting columns (src, dst).
    """
    base = (PR_MICRO * (100 - PR_DAMP_PCT)) // 100
    parts = [
        f"edges AS ({edges_cte})",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1)",
        f"r0 AS (SELECT src AS node, CAST({PR_MICRO} AS BIGINT) AS rank_micro FROM deg)",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS ("
            f"SELECT n.node, CAST({base} + ({PR_DAMP_PCT} * coalesce(c.sc, 0)) // 100 AS BIGINT) AS rank_micro "
            f"FROM (SELECT src AS node FROM deg) n "
            f"LEFT JOIN (SELECT e.dst AS node, sum(r.rank_micro // d.deg) AS sc "
            f"FROM edges e JOIN deg d USING (src) JOIN r{i} r ON r.node = e.src "
            f"GROUP BY e.dst) c USING (node))"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank_micro FROM r{iterations}"
