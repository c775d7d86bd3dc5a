"""Round-7 scale probes (VERDICT r6 #5): measured 1x/10x evidence that

1. ``graph.triangle_census`` survives power-law degree skew — the
   degree-ordered orientation bounds wedge fan-out, so wall time grows
   ~linearly in EDGES even when max degree grows 10x (a naive wedge join
   would grow quadratically in max degree on the hub);
2. ``sketches.hdr_histogram`` keeps its shuffle bounded — reduce-side
   rows stay <= groups x ~2k buckets while input rows grow 10x.

Usage: python tools/scale_probe_r7.py  (prints a markdown-ready table;
numbers land in SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark import graph as G  # noqa: E402
from dwh_etl_ods_spark_jobs_spark import sketches as SK  # noqa: E402
from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402


def skewed_edges(spark, n_edges: int, n_hubs: int = 10):
    """Deterministic power-law-ish undirected edge list: ~half the edges
    attach leaves to one of ``n_hubs`` celebrity hubs (max degree ~
    n_edges/2/n_hubs), the rest form a sparse leaf-leaf mesh that closes
    triangles through the hubs. md5-derived endpoints, no rand()."""
    e = spark.range(n_edges).select(
        F.col("id"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    n_leaves = n_edges // 4
    hub = e.filter(F.col("id") % 2 == 0).select(
        (F.lit(1_000_000) + F.pmod(F.col("h"), F.lit(n_hubs))).alias("a"),
        F.pmod(F.expr("h div 64"), F.lit(n_leaves)).alias("b"),
    )
    mesh = e.filter(F.col("id") % 2 == 1).select(
        F.pmod(F.col("h"), F.lit(n_leaves)).alias("a"),
        F.pmod(F.expr("h div 64"), F.lit(n_leaves)).alias("b"),
    )
    both = hub.unionAll(mesh).filter(F.col("a") != F.col("b"))
    return both.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()


def probe_triangles(spark) -> list[str]:
    rows = []
    for scale, n_edges in (("1x", 60_000), ("10x", 600_000)):
        edges = skewed_edges(spark, n_edges).localCheckpoint()  # isolate op cost
        m = edges.count()
        dmax = (
            edges.select(F.col("u").alias("n"))
            .unionAll(edges.select(F.col("v").alias("n")))
            .groupBy("n").count().agg(F.max("count")).collect()[0][0]
        )
        t0 = time.time()
        out = G.triangle_census(edges)
        n_tri = out.agg(F.sum("n_triangles")).collect()[0][0] or 0
        dt = time.time() - t0
        rows.append(
            f"| triangle_census {scale} | {m:,} edges, max degree {dmax:,} "
            f"| {dt:.1f} s | {n_tri:,} triangle-participations |"
        )
    return rows


def probe_hdr(spark) -> list[str]:
    rows = []
    for scale, n in (("1x", 1_000_000), ("10x", 10_000_000)):
        df = spark.range(n).select(
            F.pmod(F.col("id"), F.lit(8)).alias("g"),
            # long-tailed values spanning ~11 octaves
            (
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
                ).cast("long")
                % F.when(F.col("id") % 97 == 0, 2_000_000).otherwise(1_000)
            ).alias("v"),
        )
        t0 = time.time()
        hist = df.transform(SK.hdr_histogram(["g"], "v"))
        shuffle_rows = hist.count()  # reduce-side cardinality == sketch size
        dt = time.time() - t0
        rows.append(
            f"| hdr_histogram {scale} | {n:,} rows, 8 groups | {dt:.1f} s "
            f"| {shuffle_rows:,} (group,bucket) rows |"
        )
    return rows


def main() -> int:
    spark = get_spark("scale-probe-r7")
    print("| probe | input | wall | output/state |")
    print("|---|---|---|---|")
    for line in probe_triangles(spark) + probe_hdr(spark):
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
