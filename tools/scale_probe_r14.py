"""Round-14 staged-wave scale probes: 1x/10x evidence for the r14
operators with non-trivial shuffles, BEFORE gate registration.

1. ``operators/stats.gini_concentration`` — FIVE huge groups (the
   grouped_global_rank adversarial shape: each group ~n/5 rows, so a
   per-group window sort would funnel through 5 tasks).
2. ``graph.adamic_adar_topk`` — hub-heavy graph (one node adjacent to
   ~n/20 others, organic ring elsewhere): the center-degree cap must
   keep the wedge join bounded while the hub exists.
3. ``curation.ngram_novelty_census`` — posting membership join, new
   corpus and reference both scale.
4. ``operators/stats.theil_sen_trend`` — LONG series (10-year daily):
   raw events scale 10x over a fixed 3,650-day span; the C(days,2)
   pair frame stays constant so wall must track the rollup scan.

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one.

Usage: python tools/scale_probe_r14.py  (markdown block for SCALING.md).
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


def probe_gini(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import gini_concentration

    df = spark.range(n).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.pmod(F.col("id") * 2654435761, F.lit(100_000)).alias("x"),
        F.col("id"),
    )
    t0 = time.time()
    out = gini_concentration(df, ["g"], "x", ["id"])
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_adamic_adar(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.graph import adamic_adar_topk

    m = n // 20  # hub degree ~ n/20 at 1x, n/2 nodes total
    ring = spark.range(n // 2 - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    hub = spark.range(1, m).select(
        F.lit(0).cast("long").alias("u"), (F.col("id") * 2).alias("v")
    )
    edges = ring.unionAll(hub).distinct().filter(F.col("u") < F.col("v"))
    t0 = time.time()
    out = adamic_adar_topk(edges, top_k=50, max_center_degree=64)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_novelty(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.curation import ngram_novelty_census

    words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{k}_"), (F.pmod(F.col("id") * (7919 + k), F.lit(5000))).cast("string"))
            for k in range(12)
        ],
    )
    new = spark.range(n).select(F.col("id").alias("doc_id"), words.alias("text"))
    ref = spark.range(n, 2 * n).select(
        F.col("id").alias("doc_id"), words.alias("text")
    )
    t0 = time.time()
    out = ngram_novelty_census(new, ref, "text", "doc_id")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_theil_sen(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import theil_sen_trend

    ev = spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.pmod(F.col("id") * 104729, F.lit(3650)).alias("day"),
        F.pmod(F.col("id") * 7919, F.lit(10_000)).alias("cents"),
    )
    daily = ev.groupBy("g", "day").agg(F.sum("cents").cast("long").alias("rev"))
    t0 = time.time()
    out = theil_sen_trend(daily, ["g"], "day", "rev")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r14", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("gini_concentration (5 huge groups)", probe_gini, 1_000_000),
        ("adamic_adar_topk (n/20-degree hub, cap 64)", probe_adamic_adar, 1_000_000),
        ("ngram_novelty_census (new+ref both scale)", probe_novelty, 100_000),
        ("theil_sen_trend (10-yr daily, raw events scale)", probe_theil_sen, 1_000_000),
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
