"""Round-11 staged-wave scale probes: 1x/10x evidence for the r11
operators with non-trivial shuffles, BEFORE gate registration (the
lifecycle rule every staged wave follows).

1. ``operators/eval_metrics.auc_mann_whitney`` — groupBy(score) + range
   decomposition over the distinct-score frame.
2. ``dedup.weighted_jaccard_pairs`` — df-banded posting self-join.
3. ``operators/timeseries.nearest_event_join`` — tagged union + one
   per-key ordered window.
4. ``similarity.pair_distance_histogram`` — hash-bucket bounded
   self-join + HDR fold.
5. ``operators/stats.poisson_bootstrap_ci`` — B-replicate explode with
   map-side partial sums.
6. ``graph.bfs_hops`` — frontier-expansion rounds.

(ohlc_agg / fd_violations / hll_error_eval / calibration_bins are plain
grouped aggregations or compositions of already-probed physiologies —
quantile_bin's range decomposition carries calibration.)

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one.

Usage: python tools/scale_probe_r11.py  (markdown block for SCALING.md).
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


def probe_auc(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        auc_mann_whitney,
    )

    df = spark.range(n).select(
        F.pmod(F.col("id") * 2654435761, F.lit(1_000_000)).alias("s"),
        F.pmod(F.col("id") * 13, F.lit(3)).cast("long").alias("y3"),
    ).select("s", (F.col("y3") == 0).cast("long").alias("y"))
    t0 = time.time()
    out = auc_mann_whitney(df, "s", "y")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_weighted_jaccard(spark, n_docs: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import weighted_jaccard_pairs
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    # vocab ∝ n (the real-corpus regime — a fixed vocab makes every df
    # grow linearly and the posting join quadratic, which no banded join
    # can survive and no real corpus exhibits; same convention as the
    # r10 containment probe)
    vocab = max(n_docs // 40, 1)
    words = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"w{j}_"),
                F.pmod(
                    md5_long(F.concat(F.col("id").cast("string"), F.lit(f":{j}"))),
                    F.lit(vocab),
                ).cast("string"),
            )
            for j in range(12)
        ],
    )
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"), words.alias("text"))
    t0 = time.time()
    out = weighted_jaccard_pairs(docs, "text", "doc_id", threshold_ppm=200_000)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_nearest(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        nearest_event_join,
    )

    ev = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(n // 50 + 1)).alias("u"),
        (F.col("id") * 17).alias("ts"),
        F.col("id").alias("eid"),
        F.pmod(F.col("id") * 7, F.lit(4)).alias("tp"),
    )
    needles = ev.filter(F.col("tp") == 0).select("u", "ts", F.col("eid").alias("id"))
    hay = ev.filter(F.col("tp") != 0).select("u", "ts", F.col("eid").alias("id"))
    t0 = time.time()
    out = nearest_event_join(needles, hay, ["u"], "ts", "id", tolerance=1000)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_pair_dist(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.similarity import pair_distance_histogram
    from dwh_etl_ods_spark_jobs_spark.text import md5_long

    dim = 16
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
    df = spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("v"))
    t0 = time.time()
    out = pair_distance_histogram(df, "vec_id", "v")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_bootstrap(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import poisson_bootstrap_ci

    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.col("id") * 2654435761, F.lit(100_000)).alias("v"),
    )
    t0 = time.time()
    out = poisson_bootstrap_ci(df, "id", "v")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_bfs(spark, n_edges: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.graph import bfs_hops

    base = spark.range(n_edges // 2).select(
        F.col("id").alias("src"),
        (F.col("id") / 2).cast("long").alias("dst"),
    )
    edges = base.unionAll(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sources = spark.range(10).select(F.col("id").alias("node"))
    t0 = time.time()
    out = bfs_hops(edges, sources, max_hops=3)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r11", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("auc_mann_whitney", probe_auc, 1_000_000),
        ("weighted_jaccard_pairs", probe_weighted_jaccard, 20_000),
        ("nearest_event_join", probe_nearest, 1_000_000),
        ("pair_distance_histogram (16-dim)", probe_pair_dist, 100_000),
        ("poisson_bootstrap_ci (B=40)", probe_bootstrap, 1_000_000),
        ("bfs_hops (3 hops)", probe_bfs, 1_000_000),
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
