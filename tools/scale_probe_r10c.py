"""Third-wave round-10 scale probes: 1x/10x evidence for the remaining
r10-staged operators with non-trivial shuffles, before gate registration.

1. ``graph.label_propagation`` — fixed synchronous rounds: per round one
   equi-join + one (node, label) count + one argmax fold, lineage
   localCheckpointed; wall should scale ~linearly in edges.
2. ``operators/rank.grouped_weighted_quantile`` — 5 giant groups: the
   grouped range decomposition must hold the wall flat like
   grouped_global_rank does.
3. ``operators/rank.quantile_normalize`` — n rows mapped onto a 100k-row
   reference: two rank decompositions + one uniform index equi-join.
4. ``similarity.kmeans_step_quantized`` — 10 centroids over n vectors:
   centroid pass is an (label, pos)-grained map-side sum; assignment is a
   constant-key broadcast of the 10-row codebook.

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one.

Usage: python tools/scale_probe_r10c.py  (markdown block for SCALING.md).
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


def probe_label_prop(spark, n_edges: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.graph import label_propagation

    # preferential-ish multigraph: node i links to i//2 and a hash bucket,
    # symmetrized — communities emerge around low ids
    half = n_edges // 4
    base = spark.range(half).select(
        F.col("id").alias("src"),
        (F.col("id") / 2).cast("long").alias("dst"),
    ).unionAll(
        spark.range(half).select(
            F.col("id").alias("src"),
            F.pmod(F.col("id") * 2654435761, F.lit(half // 50 + 1)).alias("dst"),
        )
    )
    edges = base.unionAll(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    t0 = time.time()
    out = label_propagation(edges, rounds=3)
    n = out.count()
    return time.time() - t0, n, single_partition_exchanges(out)


def probe_grouped_wq(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        grouped_weighted_quantile,
    )

    df = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(5)).cast("string").alias("g"),
        F.pmod(F.col("id") * 2654435761, F.lit(1000000)).alias("v"),
        F.col("id").alias("k"),
        (F.pmod(F.col("id") * 31, F.lit(97)) + 1).alias("w"),
    )
    t0 = time.time()
    out = df.transform(
        grouped_weighted_quantile(["g"], ["v", "k"], "w",
                                  [(1, 4), (1, 2), (3, 4)])
    )
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_quantile_normalize(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import quantile_normalize

    base = spark.range(n).select(
        F.col("id"),
        F.pmod(F.col("id") * 2654435761, F.lit(10000000)).alias("v"),
    )
    ref = spark.range(100_000).select(
        F.col("id").alias("rid"),
        F.pmod(F.col("id") * 40503 + 7, F.lit(5000000)).alias("rv"),
    )
    t0 = time.time()
    out = base.transform(
        quantile_normalize(["v", "id"], ref, ["rv", "rid"], out_col="norm")
    )
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_kmeans_step(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.similarity import kmeans_step_quantized
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    dim = 8
    vec = F.array(
        *[
            (
                F.pmod(
                    md5_long(F.concat(F.col("id").cast("string"), F.lit(f";{j}"))),
                    F.lit(2001),
                ).cast("double")
                - F.lit(1000.0)
            )
            / F.lit(1000.0)
            for j in range(dim)
        ]
    )
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        vec.alias("v"),
        F.pmod(F.col("id"), F.lit(10)).cast("int").alias("label"),
    )
    t0 = time.time()
    out = kmeans_step_quantized(df, "vec_id", "v", "label", dim=dim)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r10c", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("label_propagation 3 rounds", probe_label_prop, 1_000_000),
        ("grouped_weighted_quantile (5 groups)", probe_grouped_wq, 1_000_000),
        ("quantile_normalize (100k ref)", probe_quantile_normalize, 1_000_000),
        ("kmeans_step_quantized (10 centroids)", probe_kmeans_step, 100_000),
    ):
        w1, n1, sp1 = fn(spark, one)
        w10, n10, sp10 = fn(spark, one * 10)
        assert sp10 <= sp1, (
            f"{name}: 10x INTRODUCED SinglePartition exchanges ({sp1}->{sp10})"
        )
        rows.append((name, one, w1, n1, w10, n10, w10 / w1, sp1, sp10))
    print("| probe | 1x input | 1x wall | 1x out | 10x wall | 10x out "
          "| ratio | SinglePartition 1x->10x |")
    print("|---|---|---|---|---|---|---|---|")
    for name, one, w1, n1, w10, n10, r, sp1, sp10 in rows:
        print(
            f"| {name} | {one:,} | {w1:.1f} s | {n1:,} | {w10:.1f} s "
            f"| {n10:,} | {r:.1f}x | {sp1} -> {sp10} |"
        )


if __name__ == "__main__":
    main()
