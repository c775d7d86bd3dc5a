"""Fourth-wave round-10 scale probes (VERDICT r9 #3): 1x/10x evidence for
the six r10-staged operators registered in r10 that did not yet carry a
probe row. All six are documented-bounded; this records the measurement
and the no-new-SinglePartition assert.

1. ``similarity.reciprocal_rank_fusion`` — N bounded rank lists fused by
   an id equi-join union + one grouped sum.
2. ``sketches.hdr_ks_drift`` — two HDR histogram folds + a ≤~2k-bucket
   full-outer join + bounded CDF window.
3. ``operators/quality.l_diversity_census`` — two grouped passes
   (class distinct-count, then census by diversity).
4. cluster-aware split physiology — ``dedup.connected_components`` over a
   pair graph + hash-bucket split census (the staged query's shape with
   the minhash candidate stage factored out — that stage carries its own
   r10 probes).
5. ``dedup.blocking_quality_eval`` — two pair-set normalizations + one
   semi-join + scalar fold.
6. ``operators/stats.mutual_information`` x3 features unioned — the
   feature_mi_ranking shape.

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one.

Usage: python tools/scale_probe_r10d.py  (markdown block for SCALING.md).
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


def probe_rrf(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.similarity import reciprocal_rank_fusion

    a = spark.range(n).select(
        F.col("id").alias("doc"),
        (F.pmod(F.col("id") * 2654435761, F.lit(n)) + 1).alias("rank"),
    )
    b = spark.range(n).select(
        F.col("id").alias("doc"),
        (F.pmod(F.col("id") * 40503 + 7, F.lit(n)) + 1).alias("rank"),
    )
    t0 = time.time()
    out = reciprocal_rank_fusion([a, b], "doc", "rank")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_ks(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.sketches import hdr_ks_drift

    old = spark.range(n).select(
        F.pmod(F.col("id") * 2654435761, F.lit(9_000_000)).alias("v")
    )
    new = spark.range(n).select(
        (F.pmod(F.col("id") * 40503, F.lit(900_000)) + 5_000_000).alias("v")
    )
    t0 = time.time()
    out = hdr_ks_drift(old, new, "v")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_l_diversity(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        l_diversity_census,
    )

    df = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(n // 100 + 1)).alias("zip"),
        F.pmod(F.col("id") * 31, F.lit(3)).alias("age_band"),
        F.pmod(F.col("id") * 2654435761, F.lit(20)).cast("string").alias("dx"),
    )
    t0 = time.time()
    out = l_diversity_census(df, ["zip", "age_band"], "dx", l_min=3)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_cluster_split(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import connected_components
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    # chain segments of ~4 nodes: id -> id+1 except at segment boundaries
    pairs = (
        spark.range(n - 1)
        .filter(F.pmod(F.col("id"), F.lit(4)) != 3)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    nodes = spark.range(n).select(F.col("id"))
    t0 = time.time()
    cc = connected_components(pairs, nodes)
    bucket = F.pmod(md5_long(F.col("canonical_id").cast("string")), F.lit(10))
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket < 9, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    out = cc.withColumn("split", split).groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum")
    )
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_blocking_quality(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import blocking_quality_eval

    cand = spark.range(n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1 + F.pmod(F.col("id"), F.lit(3))).alias("id_b")
    )
    truth = spark.range(n).filter(F.pmod(F.col("id"), F.lit(2)) == 0).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    t0 = time.time()
    out = blocking_quality_eval(cand, truth, n_records=2 * n)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_feature_mi(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import mutual_information

    df = spark.range(n).select(
        F.pmod(F.col("id") * 31, F.lit(24)).alias("f1"),
        F.pmod(F.col("id") * 7, F.lit(7)).alias("f2"),
        F.pmod(F.col("id") * 2654435761, F.lit(12)).alias("f3"),
        F.pmod(F.col("id"), F.lit(5)).cast("string").alias("y"),
    )
    t0 = time.time()
    parts = [
        mutual_information(df.select(F.col(f).alias("_f"), "y"), "_f", "y")
        .select(F.lit(f).alias("feature"), "n_rows", "n_cells", "mi_micro")
        for f in ("f1", "f2", "f3")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r10d", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("reciprocal_rank_fusion (2 lists)", probe_rrf, 1_000_000),
        ("hdr_ks_drift", probe_ks, 1_000_000),
        ("l_diversity_census", probe_l_diversity, 1_000_000),
        ("cluster_split (CC + bucket census)", probe_cluster_split, 300_000),
        ("blocking_quality_eval", probe_blocking_quality, 1_000_000),
        ("feature_mi_ranking (3 features)", probe_feature_mi, 1_000_000),
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
