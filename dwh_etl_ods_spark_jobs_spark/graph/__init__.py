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

__all__ = [
    "PR_MICRO",
    "PR_DAMP_PCT",
    "pagerank",
    "triangle_census",
    "triangle_census_sql",
    "negative_edge_samples",
    "negative_edge_samples_sql",
]

PR_MICRO = 1_000_000          # rank scale: 1.0 == 1e6 micro-units
PR_DAMP_PCT = 85              # damping 0.85 as an integer percentage


def pagerank(
    edges: DataFrame, iterations: int = 3, checkpoint_every: int = 5
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list ``(src, dst)``.

    Every node must have out-degree ≥ 1 (symmetrize the edge list for
    undirected graphs — that also removes dangling-mass redistribution,
    which this implementation deliberately omits). Self-loops and
    duplicate edges are honored as given; pre-``distinct()`` if unwanted.

    Per-node rank starts at ``PR_MICRO`` (the "rank 1.0 per node"
    formulation, so ranks need no global normalization pass); each
    iteration sets ``rank = (100-d)% · 1e6 + d% · Σ_src(rank_src div
    outdeg_src)`` in pure BIGINT ops. Returns ``(node, rank_micro)``.

    ``checkpoint_every`` bounds the lineage at arbitrary depth: every N
    iterations the ranks frame is localCheckpointed (the
    ``dedup.connected_components`` discipline), so a 20+-iteration run
    keeps a flat per-iteration plan instead of re-deriving the whole
    unrolled chain at each reference. Values below 1 disable the periodic
    checkpoint (fixed shallow unrolls don't need it).
    """
    base = (PR_MICRO * (100 - PR_DAMP_PCT)) // 100
    # NOTE (r14, measured): a raw-edge localCheckpoint here (the
    # triangle_census discipline) A/B'd FLAT-to-1.05x at sf0.1 — AQE
    # shuffle reuse already dedups the edge build across the deg /
    # edges_deg / nodes branches, and the extra materialization pass
    # costs what the replay saves (tools/ab_gredges_r14.json).
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
    # The node universe is the out-degree-bearing src set. A node with no
    # inbound edges still holds rank `base` (after round 1) and keeps
    # CONTRIBUTING its outgoing mass, so it must not drop out of the
    # computation. r14 optimization: instead of rebuilding the full rank
    # frame over ALL nodes EVERY round (a nodes-LEFT-join per iteration),
    # the loop carries only the contribution-sum frame `sc` and folds the
    # rebuild arithmetic into the NEXT round's edge join as
    # ``coalesce(base + damp·sc div 100, base)`` — exactly the value the
    # rebuilt rank frame held, so every bit is unchanged, but each
    # iteration is one join + one exchange lighter (2 shuffles/round — the
    # rank realignment src-ward and the dst-keyed mass fold — which is
    # PageRank's floor). The full node frame joins back ONCE at the end.
    # Round 1 is cheaper still: every rank is the constant PR_MICRO, so
    # the first mass fold needs no rank join at all.
    nodes = deg.select(F.col("src").alias("node"))
    if iterations <= 0:
        return nodes.withColumn("rank_micro", F.lit(PR_MICRO).cast("long"))
    sc = None  # (node, _sc) after i rounds; None = uniform PR_MICRO start
    for i in range(iterations):
        if sc is None:
            joined = edges_deg.withColumn(
                "rank_micro", F.lit(PR_MICRO).cast("long")
            )
        else:
            joined = edges_deg.join(
                sc.withColumnRenamed("node", "src"), "src", "left"
            ).withColumn(
                "rank_micro",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_PCT} * coalesce(_sc, CAST(0 AS BIGINT))) div 100"
                    )
                ).cast("long"),
            )
        sc = (
            joined.select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_sc"))
        )
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            sc = sc.localCheckpoint(eager=False)
    return nodes.join(sc, "node", "left").select(
        "node",
        (
            F.lit(base)
            + F.expr(f"({PR_DAMP_PCT} * coalesce(_sc, CAST(0 AS BIGINT))) div 100")
        ).cast("long").alias("rank_micro"),
    )


def triangle_census(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED edge list
    ``(u, v)`` with ``u < v`` and no duplicates.

    Algorithm: degree-ordered orientation (the standard skew bound for
    distributed triangle counting — cf. Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW'11). Each edge is
    oriented from its lower-(degree, id) endpoint to the higher one, which
    caps every node's OUT-degree at O(√m) regardless of how skewed the raw
    degree distribution is. The wedge self-join on ``src`` therefore has
    bounded per-key fan-out (no hot-key explosion on celebrity nodes), and
    the closing step is a plain two-column equi-join of the wedge set
    against the oriented edges — every shuffle keys on uniform node ids.
    Each triangle is found exactly once (its lowest-ordered vertex is the
    wedge apex).

    The order key packs ``(degree, node)`` into one BIGINT
    (``degree·2³² + node``) so orientation and wedge ordering compare a
    single column; node ids must fit in 32 bits.

    Returns ``(node, n_triangles)`` for nodes in ≥1 triangle.
    """
    # The edge list is referenced 3× below (degree count + both endpoint
    # joins) and the oriented frame 3× more (both wedge arms + the closing
    # join): localCheckpoint each once (the connected_components lineage
    # discipline) so an expensive caller-side edge derivation runs ONCE,
    # not nine times — without it the sf0.01 plan carries 184 exchanges.
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    ek = (
        edges.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("_d", "_du")
        .join(deg.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("_d", "_dv")
        .select(
            "u",
            "v",
            (F.col("_du") * F.lit(4294967296) + F.col("u")).alias("_ku"),
            (F.col("_dv") * F.lit(4294967296) + F.col("v")).alias("_kv"),
        )
    )
    oriented = ek.select(
        F.when(F.col("_ku") < F.col("_kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("_ku") < F.col("_kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.greatest("_ku", "_kv").alias("_kdst"),
    ).localCheckpoint(eager=False)
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    # Wedge (a→b, a→c) with k(b) < k(c); the b–c edge, if present, is
    # oriented b→c (k(b) < k(c)), so closing is an equi-join on (src, dst).
    wedges = (
        w1.join(w2, (F.col("w1.src") == F.col("w2.src")) & (F.col("w1._kdst") < F.col("w2._kdst")))
        .select(
            F.col("w1.src").alias("a"),
            F.col("w1.dst").alias("b"),
            F.col("w2.dst").alias("c"),
        )
    )
    closer = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closer, ["b", "c"])
    return (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def triangle_census_sql(edges_cte: str) -> str:
    """DuckDB rendering of :func:`triangle_census` — identical orientation
    key and join order. ``edges_cte`` selects columns (u, v), u < v."""
    return f"""
WITH tedges AS ({edges_cte}),
tdeg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM tedges UNION ALL SELECT v FROM tedges)
  GROUP BY 1
),
tek AS (
  SELECT e.u, e.v,
         du.d * 4294967296 + e.u AS ku,
         dv.d * 4294967296 + e.v AS kv
  FROM tedges e
  JOIN tdeg du ON du.node = e.u
  JOIN tdeg dv ON dv.node = e.v
),
toriented AS (
  SELECT CASE WHEN ku < kv THEN u ELSE v END AS src,
         CASE WHEN ku < kv THEN v ELSE u END AS dst,
         greatest(ku, kv) AS kdst
  FROM tek
),
ttri AS (
  SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
  FROM toriented w1
  JOIN toriented w2 ON w1.src = w2.src AND w1.kdst < w2.kdst
  JOIN toriented e ON e.src = w1.dst AND e.dst = w2.dst
)
SELECT node, count(*) AS n_triangles
FROM (SELECT a AS node FROM ttri UNION ALL SELECT b FROM ttri
      UNION ALL SELECT c FROM ttri)
GROUP BY 1
"""


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


def negative_edge_samples(
    edges: DataFrame, src_col: str, dst_col: str, k: int, seed: str
) -> DataFrame:
    """Deterministic negative sampling for link-prediction / contrastive
    graph training: for every source node, up to ``k`` candidate
    destinations drawn pseudo-randomly (seed-keyed md5, NEVER ``rand()``)
    from the graph's destination domain, minus true edges and self-loops::

        (src, dst, draw)    draw = 0..k-1 (surviving draws only)

    Re-run with the same seed → bit-identical negatives (training
    resumability); change the seed → fresh draws. Some draws collide with
    real edges or self-loops and are dropped — standard practice is to
    over-draw (k ≈ 2× the needed negatives). Scale: the destination
    domain gets a dense index via the distributed ``global_rank`` (no
    single-partition sort); draws are scan-side md5 expressions; the
    resolve is one equi-join on the index and the filter one null-safe
    anti-join on (src, dst) — uniform keys throughout.
    """
    from dwh_etl_ods_spark_jobs_spark.operators.rank import global_rank
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    # NOTE (r14, measured): checkpointing `edges` here to share the three
    # branch reads (destination domain, source set, true-edge anti-join)
    # A/B'd 1.22x SLOWER at sf0.1 — the battery's 2-column distinct is
    # cheaper to replay under AQE shuffle reuse than the extra
    # materialization pass costs (tools/ab_gredges_r14.json).
    dsts = (
        edges.select(F.col(dst_col).alias("_dst"))
        # NULL is excluded from the draw domain on BOTH engines: Spark's
        # ASC sort is NULLS FIRST while DuckDB's row_number default is
        # NULLS LAST — one NULL dst would shift every index and
        # desynchronize the seeded draws (ADVICE r8); a NULL negative
        # edge is meaningless anyway.
        .filter(F.col("_dst").isNotNull())
        .distinct()
        .transform(global_rank(["_dst"], out_col="_idx", with_total="_n"))
        .localCheckpoint(eager=False)  # indexed domain used twice (n + join)
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    n_dom = dsts.groupBy().agg(F.max("_n").alias("_n_dom")).withColumn("_one", one)
    draws = (
        edges.select(F.col(src_col).alias("_src"))
        .distinct()
        .select("_src", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("draw"))
        .withColumn("_one", one)
        .join(F.broadcast(n_dom), "_one")
        .select(
            "_src",
            "draw",
            F.pmod(
                md5_long(
                    F.concat_ws(":", F.lit(seed), F.col("_src").cast("string"),
                                F.col("draw").cast("string"))
                ),
                F.col("_n_dom"),
            ).alias("_idx"),
        )
    )
    cands = draws.join(dsts.select("_idx", "_dst"), "_idx").filter(
        ~F.col("_dst").eqNullSafe(F.col("_src"))
    )
    true_edges = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).distinct()
    return cands.join(true_edges, ["_src", "_dst"], "left_anti").select(
        F.col("_src").alias(src_col),
        F.col("_dst").alias(dst_col),
        F.col("draw").cast("int").alias("draw"),
    )


def negative_edge_samples_sql(
    edges_cte: str, src_col: str, dst_col: str, k: int, seed: str
) -> str:
    """DuckDB rendering of :func:`negative_edge_samples` (row_number dense
    index over the unique destination domain == global_rank's)."""
    from dwh_etl_ods_spark_jobs_spark.text import md5_long_sql

    h = md5_long_sql(f"concat_ws(':', '{seed}', CAST(s.src AS VARCHAR), CAST(d.draw AS VARCHAR))")
    return f"""
WITH edges AS ({edges_cte}),
dsts AS (
  -- NULL dst excluded on both engines (index-order desync otherwise)
  SELECT dst, row_number() OVER (ORDER BY dst) - 1 AS idx
  FROM (SELECT DISTINCT {dst_col} AS dst FROM edges WHERE {dst_col} IS NOT NULL)
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_dom FROM dsts),
srcs AS (SELECT DISTINCT {src_col} AS src FROM edges),
draws AS (
  SELECT s.src, d.draw, {h} % nd.n_dom AS idx
  FROM srcs s, (SELECT unnest(range({k})) AS draw) d, nd
),
cands AS (
  SELECT dr.src, dsts.dst, dr.draw
  FROM draws dr JOIN dsts ON dr.idx = dsts.idx
  WHERE dsts.dst IS DISTINCT FROM dr.src
)
SELECT c.src AS {src_col}, c.dst AS {dst_col}, CAST(c.draw AS INT) AS draw
FROM cands c
WHERE NOT EXISTS (
  SELECT 1 FROM edges e
  WHERE e.{src_col} = c.src AND e.{dst_col} = c.dst
)
"""


def k_core(edges: DataFrame, k: int, max_iters: int = 50) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983): delete
    every node of degree < ``k``, recompute degrees, repeat to fixpoint.
    The surviving subgraph is the maximal one where every node keeps ≥ k
    neighbors — the standard "dense kernel" extractor for community
    seeding and spam/bot-ring detection. Input: SYMMETRIZED directed
    edges (src, dst) — each undirected edge appears in both directions,
    as :func:`pagerank` expects. Returns ``(node, degree)`` of the k-core
    (degree = within-core degree ≥ k), empty frame when no core survives.

    Scale discipline (same physiology as :func:`pagerank` /
    connected-components peeling):

    - each round = ONE map-side-combinable degree count + two anti-joins
      against the (typically tiny) dropped-node set (src gate, dst gate;
      AQE broadcasts it when small, keeps the shuffle when an adversarial
      peel drops O(V) nodes) — no windows, no collects;
    - lineage truncates every round via ``localCheckpoint`` (iterative
      plans otherwise double in depth per round);
    - convergence = the dropped-node count reaching zero — one
      distributed count per round (the count also drives the checkpoint
      materialization, so it is not an extra pass);
    - rounds are data-bounded: each non-final round deletes ≥1 node, so
      iterations ≤ peel depth ≪ |V| in practice (``max_iters`` is a
      runaway backstop, not a tuning knob).
    """
    # r14 (measured 0.87x, outputs identical): peel by ANTI-joining the
    # DROPPED node set instead of semi-joining the kept one. In the
    # peeling regime the kept set is nearly the whole graph (it can never
    # broadcast) while the per-round drop set is tiny, so AQE converts
    # both anti-joins to broadcasts and the edge frame is never
    # re-shuffled by the gates (un-hinted on purpose: an adversarial
    # first peel can drop O(V) nodes, and then the planner must keep the
    # shuffle). keep == NOT drop for every endpoint because the input is
    # symmetrized (every dst also occurs as src — the documented
    # contract); convergence becomes drop.count() == 0, which also skips
    # the old final no-op rebuild round. drop > 0 always removes >= 1
    # edge (each dropped src owns >= 1 row), so termination is unchanged.
    cur = edges.select("src", "dst").localCheckpoint(eager=False)
    for _ in range(max_iters):
        drop = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") < k)
            .select("src")
            .localCheckpoint(eager=False)  # counted, then both gates read it
        )
        if drop.count() == 0:
            break
        cur = (
            cur.join(drop, "src", "left_anti")
            .join(drop.withColumnRenamed("src", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    return cur.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )


def k_core_sql(edges_cte: str, k: int, iters: int = 20) -> str:
    """DuckDB rendering of :func:`k_core` as ``iters`` UNROLLED peel
    rounds (standard SQL forbids aggregation over a recursive CTE term,
    so the loop is generated instead). Peeling is monotone and idempotent
    at the fixpoint — extra rounds are no-ops — so any ``iters`` ≥ the
    true peel depth yields the exact k-core; the Spark side iterates to
    the detected fixpoint and the parity test would catch an under-unroll
    as a row mismatch."""
    # AS MATERIALIZED: each round references the previous one 3x (degree
    # filter + both semi-gates); inlined CTEs would expand 3^iters scans
    # (observed: fd exhaustion at 12 rounds) — materialization keeps the
    # oracle linear in iters, exactly like Spark's localCheckpoint.
    ctes = [f"e0 AS MATERIALIZED ({edges_cte})"]
    for i in range(1, iters + 1):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT src AS node FROM e{i - 1} "
            f"GROUP BY src HAVING count(*) >= {k})"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i - 1} e "
            f"JOIN k{i} a ON a.node = e.src "
            f"JOIN k{i} b ON b.node = e.dst)"
        )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT src AS node, CAST(count(*) AS BIGINT) AS degree "
        f"FROM e{iters} GROUP BY src"
    )


def label_propagation(
    edges: DataFrame, rounds: int = 3, checkpoint_every: int = 5
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) community
    detection, made DETERMINISTIC: every node starts with its own id as
    label; each round every node adopts the most frequent label among
    its neighbors with ties broken to the SMALLEST label (classic LPA
    breaks ties randomly — useless for a reproducible pipeline); a
    fixed ``rounds`` count keeps both engines on the same synchronous
    schedule (asynchronous/converged LPA is schedule-dependent by
    construction). Isolated nodes keep their own label. Input:
    symmetrized ``(src, dst)`` edges, as :func:`pagerank` / :func:`k_core`
    expect. Returns ``(node, label)``.

    Scale: per round, ONE equi-join (neighbor labels), one map-side-
    combinable (node, label) count, and one argmax fold via
    ``max(struct(count, -label))`` — no per-node window, no collect.
    ``checkpoint_every`` bounds lineage at arbitrary depth (the
    :func:`pagerank` discipline): every N rounds the label frame is
    localCheckpointed. Shallow fixed unrolls (the battery's 2-3 rounds)
    run checkpoint-free — each per-round checkpoint costs a full
    planning/codegen pass plus, under AQE, eager materialization of the
    subtree's shuffle stages, and the r14 A/B measured the per-round
    checkpoints at 1.7x the checkpoint-free unroll at sf0.1 with
    byte-identical labels (the label lineage is 3 shallow ops per round
    on top of the checkpointed edge frame, so plan growth stays linear
    over a handful of rounds).
    """
    # The edge frame is scanned once PER ROUND for the neighbor join:
    # localCheckpoint it once (the triangle_census discipline) so an
    # expensive caller-side edge derivation — the battery's is a join +
    # distinct + symmetrizing union — runs once, not per round.
    edges = edges.localCheckpoint(eager=False)
    if rounds <= 0:
        return (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .withColumn("label", F.col("node").cast("long"))
        )
    # r14 optimization (guide §2.4 — remove joins/shuffles outright): the
    # symmetrized-input contract means EVERY node in the graph has >= 1
    # out-edge, so the per-round "labels LEFT JOIN new + coalesce" rebuild
    # was dead weight — `new` already labels every node (the coalesce arm
    # could only fire for a node with no neighbors, which cannot exist
    # here; isolated nodes appear in no edge and are out of scope by the
    # docstring). Carrying `new` directly drops one join per round and
    # the nodes union+distinct entirely. Round 1 is cheaper still: the
    # seed label of dst IS dst, so the first neighbor-label join
    # collapses to a projection of the edge list. Bit-identical labels on
    # every valid input (pinned by the LPA property test's symmetric
    # graphs and the cadence-identity test).
    labels = None
    for i in range(rounds):
        if labels is None:
            nbr_labels = edges.select(
                F.col("src").alias("node"), F.col("dst").cast("long").alias("label")
            )
        else:
            nbr_labels = edges.join(labels, edges["dst"] == labels["node"]).select(
                edges["src"].alias("node"), "label"
            )
        nbr = nbr_labels.groupBy("node", "label").agg(F.count(F.lit(1)).alias("_c"))
        # argmax by (count desc, label asc): max(struct(c, -label))
        labels = (
            nbr.groupBy("node")
            .agg(F.max(F.struct(F.col("_c"), (-F.col("label")).alias("_nl"))).alias("_m"))
            .select("node", (-F.col("_m._nl")).cast("long").alias("label"))
        )
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            labels = labels.localCheckpoint(eager=False)
    return labels


def label_propagation_sql(edges_cte: str, rounds: int = 3) -> str:
    """DuckDB rendering of :func:`label_propagation` — the same fixed
    synchronous rounds UNROLLED as materialized CTEs (the k_core_sql
    idiom: each round reads the previous one twice)."""
    ctes = [
        f"e0 AS MATERIALIZED ({edges_cte})",
        "lp0 AS MATERIALIZED (SELECT node, CAST(node AS BIGINT) AS label "
        "FROM (SELECT src AS node FROM e0 UNION SELECT dst FROM e0))",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"c{i} AS MATERIALIZED ("
            f"SELECT e.src AS node, l.label, count(*) AS c "
            f"FROM e0 e JOIN lp{i - 1} l ON e.dst = l.node GROUP BY 1, 2)"
        )
        ctes.append(
            f"n{i} AS MATERIALIZED ("
            f"SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER ("
            f"PARTITION BY node ORDER BY c DESC, label ASC) AS rn FROM c{i}"
            f") WHERE rn = 1)"
        )
        ctes.append(
            f"lp{i} AS MATERIALIZED ("
            f"SELECT l.node, CAST(coalesce(n.label, l.label) AS BIGINT) AS label "
            f"FROM lp{i - 1} l LEFT JOIN n{i} n USING (node))"
        )
    body = ",\n".join(ctes)
    return f"WITH {body}\nSELECT node, label FROM lp{rounds}"


def bfs_hops(
    edges: DataFrame, sources: DataFrame, max_hops: int = 4,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Multi-source BFS: exact minimum hop distance (≤ ``max_hops``)
    from ANY source node, the frontier-expansion formulation::

        (node, hops)

    Distance-0 rows are the sources themselves; unreached nodes are
    absent (left to the caller — an unreached census is one anti-join).
    Input: symmetrized ``(src, dst)`` edges (as the other iterative ops
    expect) and a 1-column ``(node)`` sources frame.

    Scale: per hop, ONE equi-join of the CURRENT FRONTIER against the
    edge list (frontier-sized, not graph-sized), one anti-join to drop
    already-settled nodes, one distinct. The edge frame is
    localCheckpointed ONCE (it is referenced every hop — an expensive
    caller-side derivation must not replay per hop); the frontier/settled
    frames checkpoint only every ``checkpoint_every`` hops (settled is
    referenced twice per hop, so unchecked lineage doubles per hop —
    the bound keeps plan growth ≤ 2^checkpoint_every per segment while a
    shallow battery unroll runs checkpoint-free: the r14 A/B measured the
    per-hop checkpoints at 1.45x the checkpoint-free 3-hop unroll at
    sf0.1, byte-identical hop census — each checkpoint costs a full
    planning/codegen pass plus eager materialization of the subtree's
    shuffle stages under AQE). A fixed hop budget bounds the rounds
    exactly like k_core's peel budget — BFS beyond a few hops on a
    power-law graph is the whole graph anyway.
    """
    edges = edges.localCheckpoint(eager=False)
    settled = (
        sources.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
    )
    frontier = settled.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(settled.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
        )
        ckpt = checkpoint_every > 0 and h % checkpoint_every == 0 and h < max_hops
        if ckpt:
            nxt = nxt.localCheckpoint(eager=False)
        settled = settled.unionByName(nxt)
        if ckpt:
            settled = settled.localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return settled


def bfs_hops_sql(edges_cte: str, sources_cte: str, max_hops: int = 4) -> str:
    """DuckDB rendering of :func:`bfs_hops` — the same frontier rounds
    UNROLLED as materialized CTEs (the label_propagation_sql idiom; a
    recursive CTE would re-derive reached nodes per iteration instead of
    anti-joining the settled set)."""
    ctes = [
        f"e0 AS MATERIALIZED ({edges_cte})",
        f"s0 AS MATERIALIZED (SELECT DISTINCT CAST(node AS BIGINT) AS node,"
        f" CAST(0 AS BIGINT) AS hops FROM ({sources_cte}))",
        "f0 AS MATERIALIZED (SELECT node FROM s0)",
    ]
    for h in range(1, max_hops + 1):
        ctes.append(
            f"n{h} AS MATERIALIZED ("
            f"SELECT DISTINCT CAST(e.dst AS BIGINT) AS node,"
            f" CAST({h} AS BIGINT) AS hops "
            f"FROM e0 e JOIN f{h - 1} f ON e.src = f.node "
            f"WHERE NOT EXISTS (SELECT 1 FROM s{h - 1} s WHERE s.node = e.dst))"
        )
        ctes.append(
            f"s{h} AS MATERIALIZED ("
            f"SELECT node, hops FROM s{h - 1} UNION ALL "
            f"SELECT node, hops FROM n{h})"
        )
        ctes.append(f"f{h} AS MATERIALIZED (SELECT node FROM n{h})")
    body = ",\n".join(ctes)
    return f"WITH {body}\nSELECT node, hops FROM s{max_hops}"


def copurchase_projection(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    top_k: int = 50,
    max_basket: int | None = None,
) -> DataFrame:
    """Bipartite basket→item co-occurrence projection: the weighted
    item-item edge list behind "bought/viewed together" and
    co-engagement graphs::

        (item_a, item_b, support, lift_ppm)   item_a < item_b,
                                               support ≥ min_support

    ``lift_ppm = support·n_baskets·10⁶ div (cnt_a·cnt_b)`` — the
    association strength relative to independence (10⁶ = independent;
    co-occurrence of two universally-bought items is support without
    signal, which raw support alone cannot see).  Exact integers.

    One equi self-join on the basket key — fan-out is C(basket_size, 2),
    so the operator is for NATURALLY BOUNDED baskets (orders, sessions,
    documents×entities; the synthetic orders top out at 17 items).  For
    heavy-tailed baskets pass ``max_basket``: each basket is cut to its
    first ``m`` items (deterministic item order) BEFORE the pair join,
    so one pathological basket (a bot session with 10⁵ items) costs
    C(m, 2) pairs, not C(10⁵, 2) — the in-operator hot-key cap the
    shingle posting joins use.  The cut defines the effective basket:
    item counts, n_baskets, and lift all see the capped contents, so
    the output stays internally consistent.  The per-basket cut itself
    is a row_number window partitioned by basket — linear in basket
    size, never quadratic.  The top-k cut (by support) is
    orderBy+limit = TakeOrderedAndProject (partitions ship local top-k
    only); lift annotates AFTER the cut, so the item-count joins touch
    ≤ 2·top_k rows on the pair side.  Output edges feed the existing
    graph operators (k-core, label propagation, PageRank) directly.
    """
    base = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_item")
    ).distinct()
    if max_basket is not None:
        from pyspark.sql import Window

        cut = Window.partitionBy("_b").orderBy("_item")
        base = (
            base.withColumn("_rn", F.row_number().over(cut))
            .filter(F.col("_rn") <= max_basket)
            .drop("_rn")
        )
    base = base.localCheckpoint(eager=False)  # pairs + counts + anchor
    a = base.select("_b", F.col("_item").alias("item_a"))
    b = base.select("_b", F.col("_item").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
        .orderBy(F.desc("support"), "item_a", "item_b")
        .limit(top_k)
    )
    counts = base.groupBy("_item").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    n_baskets = base.select("_b").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_nb")
    )
    return (
        pairs.join(
            counts.withColumnRenamed("_item", "item_a").withColumnRenamed(
                "_cnt", "_ca"
            ),
            "item_a",
        )
        .join(
            counts.withColumnRenamed("_item", "item_b").withColumnRenamed(
                "_cnt", "_cb"
            ),
            "item_b",
        )
        .join(F.broadcast(n_baskets))
        .withColumn(
            "lift_ppm",
            F.expr("CAST(support * _nb * 1000000 div (_ca * _cb) AS BIGINT)"),
        )
        .select("item_a", "item_b", "support", "lift_ppm")
        .orderBy(F.desc("support"), "item_a", "item_b")
    )


def copurchase_projection_sql(
    table_expr: str,
    basket_expr: str,
    item_expr: str,
    min_support: int = 2,
    top_k: int = 50,
    max_basket: int | None = None,
) -> str:
    """DuckDB rendering of :func:`copurchase_projection` (same optional
    per-basket first-m cut)."""
    if max_basket is None:
        base_cte = (
            f"SELECT DISTINCT {basket_expr} AS b, {item_expr} AS item"
            f" FROM {table_expr}"
        )
    else:
        base_cte = f"""
  SELECT b, item FROM (
    SELECT b, item, row_number() OVER (PARTITION BY b ORDER BY item) AS rn
    FROM (SELECT DISTINCT {basket_expr} AS b, {item_expr} AS item
          FROM {table_expr})
  ) WHERE rn <= {max_basket}
"""
    return f"""
WITH base AS (
  {base_cte}
),
pairs AS (
  SELECT a.item AS item_a, c.item AS item_b,
         CAST(count(*) AS BIGINT) AS support
  FROM base a JOIN base c ON a.b = c.b AND a.item < c.item
  GROUP BY 1, 2
  HAVING count(*) >= {min_support}
  ORDER BY support DESC, item_a, item_b
  LIMIT {top_k}
),
counts AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1),
nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM base)
SELECT p.item_a, p.item_b, p.support,
       CAST(p.support * nb.n_baskets * 1000000
            // (ca.cnt * cb.cnt) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN counts ca ON ca.item = p.item_a
JOIN counts cb ON cb.item = p.item_b
CROSS JOIN nb
ORDER BY support DESC, item_a, item_b
"""


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Exact-integer PERSONALIZED PageRank: the restart mass returns to
    the ``seeds`` set instead of spreading uniformly, so ranks measure
    proximity/influence RELATIVE TO the seed cohort — the standard
    recommendation / related-entities primitive (random walk with
    restart).  Same contract as :func:`pagerank` (every node needs
    out-degree ≥ 1; ``seeds`` is a 1-column ``node`` frame, members
    outside the node universe are ignored)::

        (node, rank_micro)    seeds start at 10⁶, others at 0

    Per iteration: ``rank = is_seed·(100−d)%·10⁶ + d%·Σ_src(rank_src
    div outdeg_src)`` — the one-line change from uniform PageRank, so
    the physiology (degree-annotated checkpointed edges, LEFT-join rank
    rebuild over all nodes, periodic lineage truncation) carries over
    verbatim.  The seed flag rides the nodes frame, computed once.
    """
    base = (PR_MICRO * (100 - PR_DAMP_PCT)) // 100
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    # The seed flag rides the degree-annotated edge frame (computed once,
    # inside the same checkpoint): the r14 carried-contribution rewrite
    # (see :func:`pagerank`) folds the per-round rank rebuild into the
    # next round's edge join as ``is_seed·base + damp·coalesce(sc,0) div
    # 100`` — bit-identical values, one join + one exchange fewer per
    # iteration; the node frame joins back ONCE at the end.
    seed_flag = seeds.select(F.col("node")).distinct().withColumn(
        "_is_seed", F.lit(1)
    )
    edges_deg = (
        edges.join(deg, "src")
        .join(seed_flag.withColumnRenamed("node", "src"), "src", "left")
        .withColumn("_is_seed", F.coalesce(F.col("_is_seed"), F.lit(0)))
        .localCheckpoint(eager=False)
    )
    nodes = (
        deg.select(F.col("src").alias("node"))
        .join(seed_flag, "node", "left")
        .select(
            "node", F.coalesce(F.col("_is_seed"), F.lit(0)).alias("_is_seed")
        )
    )
    if iterations <= 0:
        return nodes.select(
            "node",
            (F.col("_is_seed") * F.lit(PR_MICRO)).cast("long").alias("rank_micro"),
        )
    sc = None  # (node, _sc) after i rounds; None = seed-mass start
    for i in range(iterations):
        if sc is None:
            joined = edges_deg.withColumn(
                "rank_micro",
                (F.col("_is_seed") * F.lit(PR_MICRO)).cast("long"),
            )
        else:
            joined = edges_deg.join(
                sc.withColumnRenamed("node", "src"), "src", "left"
            ).withColumn(
                "rank_micro",
                (
                    F.col("_is_seed") * F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_PCT} * coalesce(_sc, CAST(0 AS BIGINT))) div 100"
                    )
                ).cast("long"),
            )
        sc = (
            joined.select(
                F.col("dst").alias("node"),
                F.expr("rank_micro div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_sc"))
        )
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            sc = sc.localCheckpoint(eager=False)
    return nodes.join(sc, "node", "left").select(
        "node",
        (
            F.col("_is_seed") * F.lit(base)
            + F.expr(
                f"({PR_DAMP_PCT} * coalesce(_sc, CAST(0 AS BIGINT))) div 100"
            )
        ).cast("long").alias("rank_micro"),
    )


def personalized_pagerank_sql(
    edges_cte: str, seeds_cte: str, iterations: int = 3
) -> str:
    """DuckDB rendering of :func:`personalized_pagerank` — the same
    iterations unrolled as chained CTEs (the :func:`pagerank_sql`
    idiom).  ``seeds_cte`` selects a ``node`` column."""
    base = (PR_MICRO * (100 - PR_DAMP_PCT)) // 100
    parts = [
        f"edges AS ({edges_cte})",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1)",
        f"seeds AS (SELECT DISTINCT node FROM ({seeds_cte}))",
        "nodes AS (SELECT d.src AS node,"
        " CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed"
        " FROM deg d LEFT JOIN seeds s ON s.node = d.src)",
        f"r0 AS (SELECT node, CAST(is_seed * {PR_MICRO} AS BIGINT)"
        " AS rank_micro FROM nodes)",
    ]
    for i in range(iterations):
        parts.append(
            f"r{i + 1} AS ("
            f"SELECT n.node, CAST(n.is_seed * {base}"
            f" + ({PR_DAMP_PCT} * coalesce(c.sc, 0)) // 100 AS BIGINT)"
            " AS rank_micro "
            "FROM nodes n "
            f"LEFT JOIN (SELECT e.dst AS node, sum(r.rank_micro // d.deg) AS sc "
            f"FROM edges e JOIN deg d USING (src) JOIN r{i} r ON r.node = e.src "
            "GROUP BY e.dst) c USING (node))"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, rank_micro FROM r{iterations}"
    )


# --- Adamic-Adar link prediction ----------------------------------------------


def adamic_adar_topk(
    edges: DataFrame,
    top_k: int = 50,
    max_center_degree: int = 64,
) -> DataFrame:
    """Adamic-Adar link prediction over an UNDIRECTED edge list ``(u, v)``
    with ``u < v`` and no duplicates: the top-k NON-adjacent pairs by
    ``AA(u, w) = Σ_{v ∈ N(u) ∩ N(w)} 1/ln(deg(v))`` — the classic
    common-neighbor recommender ("people/items you may know"), rare
    mutual friends weighted above celebrity hubs::

        (node_a, node_b, common_neighbors, aa_micro)   node_a < node_b

    Weights are integer micro-units ``round(10⁶/ln(deg_v))`` fixed per
    center (single IEEE ln on an exact integer count, rounded BEFORE
    the sum — the PMI discipline), so AA sums are exact integers.

    DOMAIN SEMANTICS (both engines): wedge centers need ``2 ≤ deg ≤
    max_center_degree``. deg=1 centers have no wedge; centers hotter
    than the cap leave the scoring domain ENTIRELY — each would emit
    C(deg, 2) wedges for the LOWEST per-neighbor weight in the graph
    (1/ln(deg) → 0), the same cost/signal trade the hot-shingle and
    df_max caps make. The cap bounds the wedge self-join's per-key
    fan-out at C(cap, 2).

    Scale: degree count + capped per-center wedge join + one pair
    aggregation (map-side combinable) + edge anti-join + TakeOrdered
    top-k. No uncapped key anywhere.
    """
    edges = edges.localCheckpoint(eager=False)  # degrees + adj + anti-join
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    centers = deg.filter(
        (F.col("_d") >= 2) & (F.col("_d") <= max_center_degree)
    ).withColumn(
        "_w",
        F.round(F.lit(1000000.0) / F.log(F.col("_d").cast("double")))
        .cast("long"),
    )
    adj = (
        edges.select(F.col("u").alias("_c"), F.col("v").alias("_n"))
        .unionAll(edges.select(F.col("v").alias("_c"), F.col("u").alias("_n")))
        .join(
            centers.select(F.col("node").alias("_c"), "_w"), "_c"
        )
        .localCheckpoint(eager=False)  # both wedge arms
    )
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    pairs = (
        a1.join(a2, (F.col("a1._c") == F.col("a2._c")) & (F.col("a1._n") < F.col("a2._n")))
        .groupBy(
            F.col("a1._n").alias("node_a"), F.col("a2._n").alias("node_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum(F.col("a1._w")).cast("long").alias("aa_micro"),
        )
    )
    non_adjacent = pairs.join(
        edges.select(
            F.col("u").alias("node_a"), F.col("v").alias("node_b")
        ),
        ["node_a", "node_b"],
        "left_anti",
    )
    return non_adjacent.orderBy(
        F.desc("aa_micro"), "node_a", "node_b"
    ).limit(top_k).select("node_a", "node_b", "common_neighbors", "aa_micro")


def adamic_adar_topk_sql(
    edges_cte: str, top_k: int = 50, max_center_degree: int = 64
) -> str:
    """DuckDB rendering of :func:`adamic_adar_topk` — same center
    domain, same rounded micro weights. ``edges_cte`` must select
    ``(u, v)`` with ``u < v``, deduplicated."""
    return f"""
WITH e AS ({edges_cte}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY 1
),
centers AS (
  SELECT node, CAST(round(1000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w
  FROM deg WHERE d >= 2 AND d <= {max_center_degree}
),
adj AS (
  SELECT c._n AS n, c._c AS ctr, centers.w FROM (
    SELECT u AS _c, v AS _n FROM e UNION ALL SELECT v, u FROM e
  ) c JOIN centers ON centers.node = c._c
),
pairs AS (
  SELECT a1.n AS node_a, a2.n AS node_b,
         CAST(count(*) AS BIGINT) AS common_neighbors,
         CAST(sum(a1.w) AS BIGINT) AS aa_micro
  FROM adj a1 JOIN adj a2 ON a1.ctr = a2.ctr AND a1.n < a2.n
  GROUP BY 1, 2
)
SELECT p.node_a, p.node_b, p.common_neighbors, p.aa_micro
FROM pairs p
WHERE NOT EXISTS (
  SELECT 1 FROM e WHERE e.u = p.node_a AND e.v = p.node_b
)
ORDER BY aa_micro DESC, node_a, node_b
LIMIT {top_k}
"""


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree-assortativity coefficient of an UNDIRECTED simple graph
    ``(u, v)``, ``u < v`` — Newman's r (PRL 89, 208701 (2002)): the
    Pearson correlation of endpoint degrees over directed edge stubs.
    One row::

        (n_edges, n_nodes, r_ppm)

    Positive r = hubs attach to hubs (social cores); negative =
    hub-and-spoke (infrastructure, retail bipartite projections) — the
    one-number summary of whether a celebrity-key mitigation (salting,
    degree caps) will be load-bearing on this graph.

    Each undirected edge contributes both stubs (du, dv) and (dv, du),
    so the moment sums fold in ONE pass over edges: M = 2m, Σx = Σ(du+dv),
    Σxx = Σ(du²+dv²), Σxy = 2·Σ(du·dv) — exact decimal(38,0) integers,
    then the closed Pearson form as a FIXED IEEE sequence rounded to
    ppm (the bivariate_stats discipline; x and y marginals coincide so
    only two variance numerators appear). Degenerate guard: a regular
    graph (zero degree variance) → r undefined → explicit NULL, both
    engines.

    Scale: degree count + two degree joins (the triangle_census
    physiology, uniform node keys) + one map-side-combinable moment
    fold — no window, no self-join.
    """
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    ek = (
        edges.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("_d", "_du")
        .join(deg.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("_d", "_dv")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("_nn"))
    moms = ek.agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum(F.col("_du") + F.col("_dv")).cast("decimal(38,0)").alias("_sx"),
        F.sum(
            dec(F.col("_du")) * dec(F.col("_du"))
            + dec(F.col("_dv")) * dec(F.col("_dv"))
        ).alias("_sxx"),
        F.sum(F.lit(2).cast("decimal(38,0)") * dec(F.col("_du")) * dec(F.col("_dv")))
        .alias("_sxy"),
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    j = moms.withColumn("_one", one).join(
        F.broadcast(n_nodes.withColumn("_one", one)), "_one"
    )
    big_m = F.lit(2).cast("decimal(38,0)") * dec(F.col("_m"))
    cov_num = (big_m * F.col("_sxy") - F.col("_sx") * F.col("_sx")).cast("double")
    var_num = (big_m * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    return j.select(
        F.col("_m").alias("n_edges"),
        F.col("_nn").alias("n_nodes"),
        F.when(
            var_num > F.lit(0.0),
            F.round(cov_num / var_num * F.lit(1000000.0)).cast("long"),
        ).alias("r_ppm"),
    )


def degree_assortativity_sql(edges_cte: str) -> str:
    """DuckDB rendering of :func:`degree_assortativity` — HUGEINT moment
    sums, the same closed form and ppm rounding."""
    return f"""
WITH edges AS ({edges_cte}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
),
ek AS (
  SELECT du.d AS dd_u, dv.d AS dd_v
  FROM edges e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
),
moms AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(dd_u + dd_v) AS HUGEINT) AS sx,
         sum(CAST(dd_u AS HUGEINT) * dd_u + CAST(dd_v AS HUGEINT) * dd_v) AS sxx,
         sum(2 * CAST(dd_u AS HUGEINT) * dd_v) AS sxy
  FROM ek
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
SELECT m AS n_edges, n_nodes,
       CASE WHEN CAST(2 * CAST(m AS HUGEINT) * sxx - sx * sx AS DOUBLE) > 0.0
       THEN CAST(round(CAST(2 * CAST(m AS HUGEINT) * sxy - sx * sx AS DOUBLE)
                       / CAST(2 * CAST(m AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                       * 1000000.0) AS BIGINT) END AS r_ppm
FROM moms, nn
"""


def community_modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman-Girvan modularity of a community assignment over an
    UNDIRECTED simple graph ``(u, v)``, ``u < v`` — the quality score
    that tells you whether a label_propagation / CC partition actually
    found structure (Q ≈ 0: no better than random; ≥ ~0.3: real
    communities)::

        (label, n_nodes, intra_edges, degree_sum, modularity_ppm)

    ``labels`` is ``(node, label)`` (label_propagation's output shape).
    ``Q = Σ_c (L_c/m − (D_c/2m)²)`` folds EXACTLY as
    ``(4m·ΣL_c − ΣD_c²) / (4m²)`` on decimal(38,0) integers with ONE
    final IEEE division rounded to ppm — the same value on every row
    (the density_ratio convention: per-community diagnostics + the
    one-number readout in a single frame). Unlabeled endpoints
    contribute degree to no community and intra-edges only if BOTH
    endpoints share a label (standard partial-cover semantics — the
    caller labels every node for classic Q). Empty edge set → NULL.

    Scale: one degree count + two label joins on uniform node keys
    (the triangle_census physiology) + bounded per-community folds +
    one constant-key broadcast of the two scalars. No window.
    """
    edges = edges.localCheckpoint(eager=False)  # degree + both end joins
    labels = labels.select(
        F.col("node").alias("_n"), F.col("label").alias("label")
    ).localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("u").alias("_n"))
        .unionAll(edges.select(F.col("v").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    comm = (
        deg.join(labels, "_n")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("_d").cast("long").alias("degree_sum"),
        )
    )
    eu = edges.join(
        labels.select(F.col("_n").alias("u"), F.col("label").alias("_lu")), "u"
    )
    ev = eu.join(
        labels.select(F.col("_n").alias("v"), F.col("label").alias("_lv")), "v"
    )
    intra = (
        ev.where(F.col("_lu") == F.col("_lv"))
        .groupBy(F.col("_lu").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra_edges"))
    )
    # NOTE (r14, measured): checkpointing `per` (bounded, read by the
    # scalar fold AND the final select) A/B'd 1.11x SLOWER — the label
    # joins replay over already-checkpointed inputs and AQE reuse covers
    # the shared stages; the pin's materialization job costs more
    # (tools/ab_permod_njp_r14.json).
    per = comm.join(intra, "label", "left").withColumn(
        "intra_edges", F.coalesce(F.col("intra_edges"), F.lit(0)).cast("long")
    )
    one = F.pmod(F.hash(F.lit(1)), F.lit(1))
    m_tot = edges.agg(F.count(F.lit(1)).cast("long").alias("_m")).withColumn(
        "_one", one
    )
    sums = per.agg(
        F.sum("intra_edges").cast("long").alias("_sl"),
        F.sum(dec(F.col("degree_sum")) * dec(F.col("degree_sum"))).alias("_sd2"),
    ).withColumn("_one", one)
    q = (
        m_tot.join(F.broadcast(sums), "_one")
        .select(
            "_one",
            F.when(
                F.col("_m") > 0,
                F.round(
                    (
                        F.lit(4).cast("decimal(38,0)")
                        * dec(F.col("_m"))
                        * dec(F.col("_sl"))
                        - F.col("_sd2")
                    ).cast("double")
                    / (
                        F.lit(4.0)
                        * F.col("_m").cast("double")
                        * F.col("_m").cast("double")
                    )
                    * F.lit(1000000.0)
                ).cast("long"),
            ).alias("modularity_ppm"),
        )
    )
    return (
        per.withColumn("_one", one)
        .join(F.broadcast(q), "_one")
        .select(
            "label", "n_nodes", "intra_edges", "degree_sum", "modularity_ppm"
        )
    )


def community_modularity_sql(edges_cte: str, labels_cte: str) -> str:
    """DuckDB rendering of :func:`community_modularity` — HUGEINT
    folds, the same single rounded division."""
    return f"""
WITH edges AS ({edges_cte}),
lab AS ({labels_cte}),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY n
),
comm AS (
  SELECT l.label, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg.d) AS BIGINT) AS degree_sum
  FROM deg JOIN lab l ON deg.n = l.node GROUP BY l.label
),
intra AS (
  SELECT lu.label, CAST(count(*) AS BIGINT) AS intra_edges
  FROM edges e
  JOIN lab lu ON e.u = lu.node
  JOIN lab lv ON e.v = lv.node
  WHERE lu.label = lv.label
  GROUP BY lu.label
),
per AS (
  SELECT c.label, c.n_nodes, coalesce(i.intra_edges, 0) AS intra_edges,
         c.degree_sum
  FROM comm c LEFT JOIN intra i ON c.label = i.label
),
mt AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
sums AS (
  SELECT CAST(sum(intra_edges) AS BIGINT) AS sl,
         sum(CAST(degree_sum AS HUGEINT) * degree_sum) AS sd2
  FROM per
),
q AS (
  SELECT CASE WHEN m > 0 THEN
    CAST(round(CAST(4 * CAST(m AS HUGEINT) * sl - sd2 AS DOUBLE)
               / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
               * 1000000.0) AS BIGINT) END AS modularity_ppm
  FROM mt, sums
)
SELECT label, n_nodes, intra_edges, degree_sum, modularity_ppm
FROM per, q
"""
