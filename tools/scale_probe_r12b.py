"""Round-12 adversarial-shape probes (VERDICT r11 #6) for the two r16
second-tranche operators that previously rode physiology notes without
a measured row:

1. ``graph.community_modularity`` under a HUB-COMMUNITY shape: one
   community absorbs HALF of all nodes (the failure mode of a
   label-propagation run that collapsed) while the rest spread over
   ~1k small communities. The heavy label is a single reduce key — but
   both per-community folds (count, degree sum; intra-edge count) are
   map-side-combinable aggregates, so the skew never concentrates rows
   in one task; the wall should track the edge scan.
2. ``similarity.simplified_silhouette`` under a ONE-GIANT-CLUSTER
   shape: every point sits nearest the SAME centroid (k = 16 centroids,
   all mass on cid 0). The per-point rank window partitions on the
   point id (uniform keys, k-row frames) and the per-cluster mean is a
   map-side-combinable fold, so cluster imbalance must not matter.

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one (both ops carry exactly ONE by
design — the constant-key scalar broadcast / the global overall-mean
fold — and it must stay constant).

Usage: python tools/scale_probe_r12b.py  (markdown block for SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


def probe_modularity_hub_community(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.graph import community_modularity

    n_nodes = n // 4
    # edges: hash-scattered simple graph over n_nodes vertices
    edges = spark.range(n).select(
        F.pmod(F.col("id") * 2654435761, F.lit(n_nodes)).alias("u"),
        F.pmod(F.col("id") * 7919 + 13, F.lit(n_nodes)).alias("v"),
    ).where(F.col("u") < F.col("v")).distinct()
    # labels: HALF the nodes collapse into community 0, rest spread ~1k
    labels = spark.range(n_nodes).select(
        F.col("id").alias("node"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(1000)) + 1)
        .alias("label"),
    )
    t0 = time.time()
    out = community_modularity(edges, labels)
    n_rows = out.count()
    wall = time.time() - t0
    return wall, n_rows, single_partition_exchanges(out)


def probe_silhouette_giant_cluster(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.similarity import simplified_silhouette

    # every point within radius 2 of centroid 0; 15 decoys far away
    pts = spark.range(n).select(
        F.col("id").alias("id"),
        F.array(
            *[
                F.pmod(F.col("id") * F.lit(97 + i), F.lit(5)).cast("int")
                for i in range(8)
            ]
        ).alias("q"),
    )
    cen = spark.range(16).select(
        F.col("id").cast("long").alias("cid"),
        F.array(
            *[
                F.when(F.col("id") == 0, F.lit(2))
                .otherwise((F.col("id") * 1000 + i * 37).cast("int"))
                .cast("int")
                for i in range(8)
            ]
        ).alias("q"),
    )
    t0 = time.time()
    out = simplified_silhouette(pts, cen, "id", "q")
    rows = out.collect()
    wall = time.time() - t0
    # the giant cluster really is giant: cid 0 holds every point
    assert any(r.cid == 0 and r.n_points == n for r in rows), rows[:3]
    return wall, len(rows), single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale_probe_r12b", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    print("| probe | n | wall_s | out_rows | SinglePartition |")
    print("|---|---|---|---|---|")
    results = {}
    for name, fn in [
        ("modularity_hub_community", probe_modularity_hub_community),
        ("silhouette_giant_cluster", probe_silhouette_giant_cluster),
    ]:
        walls = []
        sps = []
        for n in (1_000_000, 10_000_000):
            wall, rows, sp = fn(spark, n)
            walls.append(wall)
            sps.append(sp)
            print(f"| {name} | {n:,} | {wall:.1f} | {rows:,} | {sp} |")
        results[name] = (walls, sps)
        assert sps[1] <= sps[0], (
            f"{name}: scale-up INTRODUCED a SinglePartition exchange "
            f"({sps[0]} -> {sps[1]})"
        )
    for name, (walls, _) in results.items():
        print(f"{name}: 10x wall ratio {walls[1] / walls[0]:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
