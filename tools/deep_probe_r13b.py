"""Round-13 deep probe #2: the ``semantic_dedup_clusters`` physiology
(hyperplane-LSH bucketing -> exact-cosine verify -> connected
components -> cluster census) at 1x/10x/100x vector volume — the last
of the r12 verdict's "heaviest audited-but-never-rung-probed" battery
entries, PLUS a measured test of the operator's documented scale knob.

The honest-cost hypothesis under test: with the signature width FIXED
at the battery's 16 planes, bucket occupancy grows linearly in the
corpus, so same-bucket candidate pairs grow ~n²/2¹⁶ and the verify
stage must go superlinear at the 1M rung (~7.6M candidate cosines vs
~76k at 100k). The MITIGATION under test: ``n_planes`` is an operator
parameter — raising it to 24 at the 1M rung multiplies the bucket
domain by 256 and must pull the verify volume (and wall) back to the
10x-rung regime. This is the same depth-vs-volume choice the Merkle
probe recorded for ``n_buckets`` (SCALING.md r12 #2): the knob must
scale with log2(corpus), and the probe MEASURES that it works instead
of asserting it.

Corpus: vectors pair up (2k, 2k+1) with vec(2k+1) = 1.01·vec(2k) —
cosine exactly 1 and hyperplane signatures identical up to IEEE
boundary flips: sign(dot(1.01·v, p)) == sign(dot(v, p)) unless the
plane margin sits within rounding distance of zero, where the two
differently-associated summations can round to opposite signs — the
standard LSH boundary-margin effect, and this probe MEASURES its rate
(first observed live at the 1M rung: exactly 1 pair in 500,000 split
into two singleton clusters, 2 ppm). Components are xxhash64-derived
in [-1, 1] at dim 32: random cross-pair cosine tails are
(1-c²)^14.5-thin, so P(cos >= 0.95) ~ 2e-15 and the census is n/2
size-2 clusters minus the (counted, asserted-bounded) boundary
splits.

Usage: python tools/deep_probe_r13b.py   (markdown rows for SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

DIM = 32
THRESHOLD = 0.95  # the battery's SEMANTIC_COS


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


def synth_vectors(spark, n_vecs: int):
    base = F.col("id") - F.pmod(F.col("id"), F.lit(2))
    scale = F.when(F.pmod(F.col("id"), F.lit(2)) == 0, F.lit(1.0)).otherwise(
        F.lit(1.01)
    )
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(base, j), F.lit(2001)) - F.lit(1000.0))
            / F.lit(1000.0)
        )
        * scale,
    )
    return (
        spark.range(n_vecs)
        .repartition(32)
        .select(F.col("id").alias("vec_id"), comp.alias("v"))
    )


def probe_semantic_dedup(spark, n_vecs: int, n_planes: int):
    from dwh_etl_ods_spark_jobs_spark import dedup as D

    emb = synth_vectors(spark, n_vecs)
    t0 = time.time()
    pairs = D.embedding_neardup_pairs(
        emb, "v", "vec_id", threshold=THRESHOLD, dim=DIM, n_planes=n_planes
    )
    labels = D.connected_components(
        pairs, emb.select(F.col("vec_id").alias("id"))
    )
    census = labels.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    out = census.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
    rows = {r["cluster_size"]: r["n_clusters"] for r in out.collect()}
    wall = time.time() - t0
    return wall, rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep_probe_r13b", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    print("| probe | vectors | planes | wall_s | census | SinglePartition |")
    print("|---|---|---|---|---|---|")
    walls, sps = [], []
    for n, planes in (
        (10_000, 16),
        (100_000, 16),
        (1_000_000, 16),
        (1_000_000, 24),  # the mitigation rung
    ):
        wall, census, sp = probe_semantic_dedup(spark, n, planes)
        walls.append(wall)
        sps.append(sp)
        singletons = census.get(1, 0)
        print(
            f"| semantic_dedup | {n:,} | {planes} | {wall:.1f} "
            f"| {census} | {sp} |"
        )
        # boundary-margin budget: <= 10 ppm of vectors may split (IEEE
        # sign flips on near-zero plane margins); everything else must
        # be an intact size-2 cluster — no false merges, no lost docs
        assert set(census) <= {1, 2}, (n, planes, census)
        assert singletons <= max(4, n // 100_000), (n, planes, census)
        assert census.get(2, 0) == (n - singletons) // 2, (n, planes, census)
    assert max(sps) == min(sps), f"SinglePartition drifted: {sps}"
    print(
        f"ratios at 16 planes: 10x {walls[1] / walls[0]:.1f}x, "
        f"100x {walls[2] / walls[0]:.1f}x; "
        f"1M rung 24-vs-16 planes {walls[3] / walls[2]:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
