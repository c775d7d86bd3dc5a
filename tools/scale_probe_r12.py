"""Round-12 staged-wave scale probes: 1x/10x evidence for the r12
operators with non-trivial shuffles, BEFORE gate registration (the
lifecycle rule every staged wave follows).

1. ``dedup.edit1_linkage_census`` — FastSS deletion-neighborhood posting
   self-join over distinct names (+ levenshtein verify).
2. ``sketches.countmin_join_size`` — DEPTH-way fan-out to the fixed
   sketch grid on both sides + per-key-count equi-join for the exact arm.
3. ``operators/eval_metrics.ndcg_rerank`` — per-query bounded windows;
   probed against MANY queries (the axis that grows in production).
4. ``operators/stats.corr_matrix`` — one-pass moment scan (k=4 columns,
   6 pairs); included as the sanity anchor that a pure scan stays 10x.

(pr_threshold_sweep rides quantile_bin's already-probed range
decomposition; zipf_alpha rides grouped global_rank; dup_ngram_ppm is a
per-row expression; quantile_coverage_eval rides grouped_weighted_
quantile + a broadcast band join; cohens_kappa is one grouped count —
all documented-bounded physiologies probed in earlier rounds.)

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one.

Usage: python tools/scale_probe_r12.py  (markdown block for SCALING.md).
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


def probe_edit1(spark, n: int) -> tuple[float, int, int]:
    """Pseudo-word names: 3 hashed syllables from a vocab that scales
    with n (fixed vocab would densify the neighborhood superlinearly —
    the same probe fix the r10 containment and r11 weighted-Jaccard
    probes needed)."""
    from dwh_etl_ods_spark_jobs_spark.dedup import edit1_linkage_census

    syl = max(64, int(n ** 0.5) // 8)
    name = F.concat_ws(
        "",
        *[
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"s{j}:"),
                        F.pmod(F.col("id") * (2654435761 + j), F.lit(syl)).cast(
                            "string"
                        ),
                    )
                ),
                1,
                4,
            )
            for j in range(3)
        ],
    )
    df = spark.range(n).select(name.alias("name"))
    t0 = time.time()
    out = edit1_linkage_census(df, "name")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_cms_join_size(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.sketches import countmin_join_size

    left = spark.range(n).select(
        F.pmod(F.col("id") * 2654435761, F.lit(n // 10 + 1)).alias("k")
    )
    right = spark.range(n // 2).select(
        F.pmod(F.col("id") * 40503 + 7, F.lit(n // 10 + 1)).alias("k")
    )
    t0 = time.time()
    out = countmin_join_size(left, right, "k")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_ndcg(spark, n_queries: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import ndcg_rerank

    runs = (
        spark.range(n_queries * 10)
        .select(
            (F.col("id") % n_queries).alias("query"),
            F.col("id").alias("doc"),
            F.pmod(F.col("id") * 2654435761, F.lit(1_000_000)).alias("score"),
            F.pmod(F.col("id") * 13, F.lit(4)).alias("rel"),
        )
    )
    t0 = time.time()
    out = ndcg_rerank(runs, "query", "doc", "score", "rel", k=10)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_corr_matrix(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.stats import corr_matrix

    df = spark.range(n).select(
        F.pmod(F.col("id") * 7, F.lit(1000)).alias("a"),
        F.pmod(F.col("id") * 11, F.lit(1000)).alias("b"),
        F.pmod(F.col("id") * 13, F.lit(1000)).alias("c"),
        F.pmod(F.col("id") * 17, F.lit(1000)).alias("d"),
    )
    t0 = time.time()
    out = corr_matrix(df, ["a", "b", "c", "d"])
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r12", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("edit1_linkage_census", probe_edit1, 100_000),
        ("countmin_join_size", probe_cms_join_size, 1_000_000),
        ("ndcg_rerank (10/query)", probe_ndcg, 100_000),
        ("corr_matrix (k=4)", probe_corr_matrix, 1_000_000),
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
