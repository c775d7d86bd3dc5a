"""Round-14 deep probes, second tranche: measured 1x/10x/100x rungs for
the three heaviest NEWLY REGISTERED battery entries that rode
physiology notes through their gating round (`copurchase_modularity`
2.67 s, `embedding_kcenter_coreset` already probed r13;
`embedding_label_silhouette` 1.69 s, `copurchase_assortativity`
1.63 s) — closing the documented-bound gap before the verdict asks.

Probe A — ``graph.community_modularity``. Graph: k disjoint 10-cliques
(45 edges each), labels = clique id, so Newman Q has the closed form
``1 − 1/k`` and the probe asserts the EXACT ppm readout per rung
(replicating the operator's one fixed IEEE division in Python ints +
one float div). Adversarial rung at 100x: ONE community absorbs half
of all edges (a ~3163-node clique, 5M intra edges) — the per-community
fold is a single groupBy cell, so the hot community costs nothing
extra; exact Q asserted from the same closed fold.

Probe B — ``graph.degree_assortativity``. Graph: a star forest (hubs
of degree 99, leaves of degree 1) — every directed stub pair is
(99, 1) or (1, 99), so Newman's r is EXACTLY −1 and the probe asserts
``r_ppm == −1_000_000`` on every rung while edges scale 100x.

Probe C — ``similarity.simplified_silhouette``. Points sit EXACTLY on
their centroid (8 clusters, 8-dim codes): a = 0, b > 0, so every
per-cluster mean silhouette is EXACTLY 1e6 ppm on every rung; points
scale 100k -> 10M against the bounded broadcast centroid frame.

Usage: python tools/deep_probe_r14b.py   (markdown rows for SCALING.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

CLIQUE = 10
CLIQUE_EDGES = CLIQUE * (CLIQUE - 1) // 2  # 45
PAIRS = [(a, b) for a in range(CLIQUE) for b in range(a + 1, CLIQUE)]


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


def exact_q(m: int, sum_intra: int, sum_d2: int) -> int:
    """Replicate the operator's fold: (4m·Σl − Σd²) exact int, ONE
    float division, round to ppm."""
    return round((4 * m * sum_intra - sum_d2) / (4.0 * m * m) * 1000000.0)


def clique_graph(spark, k: int):
    pair_arr = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in PAIRS
        ]
    )
    edges = (
        spark.range(k)
        .repartition(32)
        .select(F.col("id").alias("_c"), F.explode(pair_arr).alias("_p"))
        .select(
            (F.col("_c") * CLIQUE + F.col("_p.a")).alias("u"),
            (F.col("_c") * CLIQUE + F.col("_p.b")).alias("v"),
        )
    )
    labels = spark.range(k * CLIQUE).select(
        F.col("id").alias("node"), (F.col("id") / CLIQUE).cast("long").alias("label")
    )
    return edges, labels


def probe_modularity(spark, k: int):
    from dwh_etl_ods_spark_jobs_spark.graph import community_modularity

    edges, labels = clique_graph(spark, k)
    t0 = time.time()
    out = community_modularity(edges, labels)
    rows = out.collect()
    wall = time.time() - t0
    m = k * CLIQUE_EDGES
    want = exact_q(m, m, k * (2 * CLIQUE_EDGES) ** 2)
    assert len(rows) == k and all(r.modularity_ppm == want for r in rows[:50])
    return wall, m, want, single_partition_exchanges(out)


def probe_modularity_hot(spark, k_small: int, giant: int):
    """k_small 10-cliques + ONE giant clique holding ~half the edges."""
    from dwh_etl_ods_spark_jobs_spark.graph import community_modularity

    edges, labels = clique_graph(spark, k_small)
    base = k_small * CLIQUE
    g = (
        spark.range(giant * (giant - 1) // 2)
        .repartition(32)
        .select(F.col("id").alias("_i"))
        # unrank the i-th pair (u < v) of the giant clique
        .withColumn(
            "_u",
            (
                (2 * giant - 1 - F.sqrt(F.lit((2 * giant - 1) ** 2) - 8 * F.col("_i"))) / 2
            ).cast("long"),
        )
        .withColumn(
            "_v",
            F.col("_i")
            - F.col("_u") * (2 * giant - F.col("_u") - 1) / 2
            + F.col("_u")
            + 1,
        )
        .select(
            (F.lit(base) + F.col("_u")).alias("u"),
            (F.lit(base) + F.col("_v").cast("long")).alias("v"),
        )
    )
    glabels = spark.range(giant).select(
        (F.col("id") + base).alias("node"), F.lit(10**9).cast("long").alias("label")
    )
    all_edges = edges.unionAll(g)
    all_labels = labels.unionAll(glabels)
    t0 = time.time()
    out = community_modularity(all_edges, all_labels)
    rows = out.collect()
    wall = time.time() - t0
    m_small = k_small * CLIQUE_EDGES
    m_g = giant * (giant - 1) // 2
    m = m_small + m_g
    sum_d2 = k_small * (2 * CLIQUE_EDGES) ** 2 + (2 * m_g) ** 2
    want = exact_q(m, m, sum_d2)
    assert len(rows) == k_small + 1
    assert all(r.modularity_ppm == want for r in rows[:50]), (
        rows[0].modularity_ppm,
        want,
    )
    hot = [r for r in rows if r.label == 10**9][0]
    assert hot.intra_edges == m_g and hot.n_nodes == giant
    return wall, m, m_g, want, single_partition_exchanges(out)


STAR = 100  # 1 hub + 99 leaves per star


def probe_assortativity(spark, n_stars: int):
    from dwh_etl_ods_spark_jobs_spark.graph import degree_assortativity

    edges = (
        spark.range(n_stars * (STAR - 1))
        .repartition(32)
        .select(
            ((F.col("id") / (STAR - 1)).cast("long") * STAR).alias("u"),
            (
                (F.col("id") / (STAR - 1)).cast("long") * STAR
                + F.pmod(F.col("id"), F.lit(STAR - 1))
                + 1
            ).alias("v"),
        )
    )
    t0 = time.time()
    out = degree_assortativity(edges)
    row = out.collect()[0]
    wall = time.time() - t0
    assert row.n_edges == n_stars * (STAR - 1)
    assert row.r_ppm == -1000000, row  # perfect star forest: r = -1 exactly
    return wall, row.n_edges, single_partition_exchanges(out)


SIL_K, SIL_DIM = 8, 8


def probe_silhouette(spark, n_points: int):
    from dwh_etl_ods_spark_jobs_spark.similarity import simplified_silhouette

    code = F.transform(
        F.sequence(F.lit(0), F.lit(SIL_DIM - 1)),
        lambda j: (F.pmod(F.col("id"), F.lit(SIL_K)) * 10 + j).cast("int"),
    )
    points = spark.range(n_points).repartition(32).select(
        F.col("id").alias("vec_id"), code.alias("code")
    )
    cent = spark.range(SIL_K).select(
        F.col("id").alias("cid"),
        F.transform(
            F.sequence(F.lit(0), F.lit(SIL_DIM - 1)),
            lambda j: (F.col("id") * 10 + j).cast("int"),
        ).alias("q"),
    )
    t0 = time.time()
    out = simplified_silhouette(points, cent, "vec_id", "code")
    rows = out.collect()
    wall = time.time() - t0
    assert len(rows) == SIL_K
    assert all(
        r.mean_silhouette_ppm == 1000000 and r.overall_silhouette_ppm == 1000000
        for r in rows
    ), rows[:2]
    return wall, n_points, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep_probe_r14b", shuffle_partitions=32)
    spark.range(1).count()

    print("| probe | size | wall_s | out | SinglePartition |")
    print("|---|---|---|---|---|")

    walls = []
    for k in (2_223, 22_223, 222_223):  # ~100k / 1M / 10M edges
        wall, m, want, sp = probe_modularity(spark, k)
        walls.append(wall)
        print(f"| community_modularity | {m:,} edges / {k:,} communities "
              f"| {wall:.1f} | Q exact {want} ppm | {sp} |")
    print(f"ratios: 10x {walls[1]/walls[0]:.1f}x, 100x {walls[2]/walls[0]:.1f}x")

    wall, m, m_g, want, sp = probe_modularity_hot(spark, 111_112, 3_163)
    print(f"| community_modularity HOT (1 community = {m_g:,}/{m:,} edges) "
          f"| {m:,} | {wall:.1f} | Q exact {want} ppm | {sp} |")

    walls = []
    for n_stars in (1_011, 10_102, 101_011):  # ~100k / 1M / 10M edges
        wall, m, sp = probe_assortativity(spark, n_stars)
        walls.append(wall)
        print(f"| degree_assortativity (star forest) | {m:,} edges "
              f"| {wall:.1f} | r_ppm exact -1000000 | {sp} |")
    print(f"ratios: 10x {walls[1]/walls[0]:.1f}x, 100x {walls[2]/walls[0]:.1f}x")

    walls = []
    for n in (100_000, 1_000_000, 10_000_000):
        wall, np_, sp = probe_silhouette(spark, n)
        walls.append(wall)
        print(f"| simplified_silhouette (on-centroid points) | {np_:,} points "
              f"| {wall:.1f} | all means exact 1e6 ppm | {sp} |")
    print(f"ratios: 10x {walls[1]/walls[0]:.1f}x, 100x {walls[2]/walls[0]:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
