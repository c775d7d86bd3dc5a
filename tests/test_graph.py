"""Graph analytics: exact-integer PageRank vs a driver-side reference
recurrence, partitioning invariance, symmetric-graph conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwh_etl_ods_spark_jobs_spark import graph as G


def _pagerank_py(edges: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    base = (G.PR_MICRO * (100 - G.PR_DAMP_PCT)) // 100
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: G.PR_MICRO for n in deg}
    for _ in range(iterations):
        acc: dict[int, int] = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + ranks[s] // deg[s]
        # every out-degree-bearing node keeps a rank (in-degree 0 -> base)
        ranks = {n: base + (G.PR_DAMP_PCT * acc.get(n, 0)) // 100 for n in deg}
    return ranks


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_matches_reference_recurrence(spark):
    # star + chain, symmetrized: 0-1, 0-2, 0-3, 3-4
    und = [(0, 1), (0, 2), (0, 3), (3, 4)]
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    for iters in (1, 3):
        got = {
            r.node: r.rank_micro
            for r in G.pagerank(_edges_df(spark, edges), iterations=iters).collect()
        }
        assert got == _pagerank_py(edges, iters)
    # the hub must outrank every leaf
    r3 = _pagerank_py(edges, 3)
    assert max(r3, key=r3.get) == 0


def test_pagerank_partitioning_invariant(spark):
    edges = [(i % 7, (i * 3) % 7) for i in range(40)] + [((i * 3) % 7, i % 7) for i in range(40)]
    df = _edges_df(spark, edges)
    a = {r.node: r.rank_micro for r in G.pagerank(df, 2).collect()}
    b = {r.node: r.rank_micro for r in G.pagerank(df.repartition(13), 2).collect()}
    assert a == b


def test_pagerank_regular_graph_stays_uniform(spark):
    # a 4-cycle (symmetrized): every node deg 2, ranks must stay equal
    und = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges = und + [(b, a) for a, b in und]
    got = {r.node: r.rank_micro for r in G.pagerank(_edges_df(spark, edges), 3).collect()}
    assert len(set(got.values())) == 1
    # and equal to the scalar recurrence's value (the integer fixed point
    # of base + 85% * 1e6 is approached but truncation keeps it exact)
    assert got == _pagerank_py(edges, 3)


def test_pagerank_directed_keeps_source_only_nodes(spark):
    """A node with out-edges but NO in-edges must stay in the rank frame
    at the base rank AND keep contributing its mass every iteration —
    an inner join on contributions would silently drop it after round 1."""
    edges = [(0, 1), (1, 0), (2, 0)]  # node 2: out-degree 1, in-degree 0
    got = {r.node: r.rank_micro for r in G.pagerank(_edges_df(spark, edges), 3).collect()}
    ref = _pagerank_py(edges, 3)
    assert set(got) == {0, 1, 2}
    assert got == ref
    base = (G.PR_MICRO * (100 - G.PR_DAMP_PCT)) // 100
    assert got[2] == base            # no inbound mass, never dropped
    # node 0 receives node 2's contribution in EVERY round: strictly more
    # than it would get from node 1 alone
    only_cycle = _pagerank_py([(0, 1), (1, 0)], 3)
    assert got[0] > only_cycle[0]


def _und_df(spark, edges):
    return spark.createDataFrame(edges, "u long, v long")


def _triangles_py(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Brute-force reference: count triangles per node over an undirected
    (u < v) edge list."""
    es = set(edges)
    nodes = sorted({n for e in edges for n in e})
    cnt: dict[int, int] = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c <= b:
                    continue
                if (a, c) in es and (b, c) in es:
                    for n in (a, b, c):
                        cnt[n] = cnt.get(n, 0) + 1
    return cnt


def test_triangle_census_k4_plus_pendant(spark):
    # K4 (4 triangles, each node in 3) + pendant edge 3-9 (no triangle)
    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)]
    got = {
        r.node: r.n_triangles
        for r in G.triangle_census(_und_df(spark, und)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # 9 absent: zero triangles


def test_triangle_census_matches_bruteforce_and_is_partition_invariant(spark):
    # pseudo-random-ish but deterministic graph incl. a high-degree hub
    und = sorted({
        (min(a, b), max(a, b))
        for a, b in (((i * 7) % 23, (i * i + 3) % 23) for i in range(160))
        if a != b
    } | {(0, n) for n in range(1, 23)})  # node 0: hub touching everyone
    df = _und_df(spark, und)
    ref = _triangles_py(und)
    got = {r.node: r.n_triangles for r in G.triangle_census(df).collect()}
    assert got == ref
    rep = {
        r.node: r.n_triangles
        for r in G.triangle_census(df.repartition(11)).collect()
    }
    assert rep == ref


def test_triangle_census_triangle_free_graph_is_empty(spark):
    # bipartite graphs have no odd cycles: evens <-> odds only
    und = [(2 * i, 2 * j + 1) for i in range(4) for j in range(4)]
    und = [(min(a, b), max(a, b)) for a, b in und]
    assert G.triangle_census(_und_df(spark, und)).count() == 0


def test_pagerank_deep_iteration_checkpointed(spark):
    """20-iteration PageRank (VERDICT r6 #6): values identical to the
    driver-side recurrence AND the plan stays bounded — periodic
    localCheckpoint truncates lineage, so the final frame's exchange count
    reflects only the iterations since the last checkpoint, not all 20."""
    und = [(0, 1), (0, 2), (0, 3), (3, 4), (1, 2)]
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    df = _edges_df(spark, edges)

    deep = G.pagerank(df, iterations=20, checkpoint_every=5)
    got = {r.node: r.rank_micro for r in deep.collect()}
    assert got == _pagerank_py(edges, 20)

    def exchanges(frame) -> int:
        return frame._jdf.queryExecution().optimizedPlan().toString().count(
            "Join"
        )

    # lineage bound: the checkpointed 20-iteration plan must be no deeper
    # than an UNcheckpointed 5-iteration plan + 1 (the LogicalRDD source),
    # and strictly shallower than the uncheckpointed 20-iteration chain.
    flat = exchanges(deep)
    five = exchanges(G.pagerank(df, iterations=5, checkpoint_every=0))
    full = exchanges(G.pagerank(df, iterations=20, checkpoint_every=0))
    assert flat <= five + 1, (flat, five)
    assert full > 3 * flat, (full, flat)

    # checkpoint cadence does not perturb a single bit
    a = sorted(G.pagerank(df, 7, checkpoint_every=2).collect())
    b = sorted(G.pagerank(df, 7, checkpoint_every=0).collect())
    assert a == b


def test_negative_edges_deterministic_and_disjoint_from_real(spark):
    from dwh_etl_ods_spark_jobs_spark.graph import negative_edge_samples

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12)], "s long, d long"
    )
    a = negative_edge_samples(edges, "s", "d", 4, "x").collect()
    b = negative_edge_samples(edges, "s", "d", 4, "x").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # same seed == same
    real = {(1, 10), (1, 11), (2, 10), (3, 12)}
    for r in a:
        assert (r.s, r.d) not in real  # never a true edge
        assert r.d in {10, 11, 12}     # drawn from the dst domain
        assert r.s != r.d
    c = negative_edge_samples(edges, "s", "d", 4, "y").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))  # new seed, new draws


def test_negative_edges_null_dst_excluded_and_engines_agree(spark):
    """A NULL destination must not enter the draw domain: Spark indexes
    NULLS FIRST, DuckDB's row_number NULLS LAST — one NULL would shift
    every index and desynchronize the seeded draws between the engines
    (ADVICE r8)."""
    import duckdb
    import pandas as pd

    from dwh_etl_ods_spark_jobs_spark.graph import (
        negative_edge_samples,
        negative_edge_samples_sql,
    )

    pdf = pd.DataFrame(
        {"s": [1, 1, 2, 3, 4], "d": [10.0, 11.0, 10.0, 12.0, None]}
    )
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12), (4, None)], "s long, d long"
    )
    got = sorted(
        (r.s, r.d, r.draw)
        for r in negative_edge_samples(edges, "s", "d", 3, "nx").collect()
    )
    con = duckdb.connect()
    con.register("edges_src", pdf)
    duck = sorted(
        (r[0], int(r[1]), r[2])
        for r in con.execute(
            negative_edge_samples_sql(
                "SELECT s, CAST(d AS BIGINT) AS d FROM edges_src",
                "s", "d", 3, "nx",
            )
        ).fetchall()
    )
    assert got == duck
    assert all(d is not None for _, d, _ in got)  # no NULL negatives drawn


def test_k_core_peels_cascade(spark):
    """Classic cascade: a triangle is a 2-core; a pendant chain hanging
    off it peels away node-by-node (removing the tip drops its parent to
    degree 1, and so on) — single-round degree filtering would miss the
    cascade."""
    from dwh_etl_ods_spark_jobs_spark.graph import k_core

    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {r.node: r.degree for r in k_core(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}   # chain 4-5-6 fully cascaded away
    assert k_core(edges, k=3).count() == 0  # no 3-core anywhere


def test_k_core_sql_matches_spark(spark):
    """Unrolled-CTE oracle == iterative Spark peel on a graph whose peel
    takes several rounds."""
    import duckdb

    from dwh_etl_ods_spark_jobs_spark.graph import k_core, k_core_sql

    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)]
    sym = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = sorted(
        (r.node, r.degree) for r in k_core(edges, k=2).collect()
    )
    vals = ", ".join(f"({a}, {b})" for a, b in sym)
    sql = k_core_sql(f"SELECT * FROM (VALUES {vals}) v(src, dst)", k=2, iters=10)
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want and got == [(1, 2), (2, 2), (3, 2)]


def test_label_propagation_checkpoint_cadence_identical(spark):
    """r14 optimization: shallow LPA unrolls run checkpoint-free
    (checkpoint_every=5 > rounds); the cadence knob must not perturb a
    single label, and deep rounds with a tight cadence must equal the
    checkpoint-free unroll bit-for-bit."""
    und = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    df = _edges_df(spark, edges).select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    base = sorted(map(tuple, G.label_propagation(df, rounds=6, checkpoint_every=0).collect()))
    tight = sorted(map(tuple, G.label_propagation(df, rounds=6, checkpoint_every=2).collect()))
    deflt = sorted(map(tuple, G.label_propagation(df, rounds=6).collect()))
    assert tight == base
    assert deflt == base


def test_bfs_hops_checkpoint_cadence_identical(spark):
    """r14 optimization: the per-hop frontier/settled checkpoints are now
    cadence-gated; any cadence must produce the exact same hop census."""
    chain = [(i, i + 1) for i in range(8)]
    edges = [(a, b) for a, b in chain] + [(b, a) for a, b in chain]
    df = _edges_df(spark, edges).select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    src = df.sparkSession.createDataFrame([(0,)], "node long")
    base = sorted(map(tuple, G.bfs_hops(df, src, max_hops=7, checkpoint_every=0).collect()))
    tight = sorted(map(tuple, G.bfs_hops(df, src, max_hops=7, checkpoint_every=2).collect()))
    deflt = sorted(map(tuple, G.bfs_hops(df, src, max_hops=7).collect()))
    assert tight == base
    assert deflt == base
    assert {r[1] for r in base} == {0, 1, 2, 3, 4, 5, 6, 7}
