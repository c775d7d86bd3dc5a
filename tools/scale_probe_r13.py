"""Round-13 staged-wave scale probes: 1x/10x evidence for the r13
operators with non-trivial shuffles, BEFORE gate registration.

1. ``operators/rank.salted_grouped_topk`` — skew-safe two-phase top-k,
   probed with FIVE hot groups (each ~n/5 rows — the adversarial shape).
2. ``operators/reconcile.merkle_range_diff`` — per-bucket digest folds +
   row diff restricted to differing buckets, probed at sparse drift
   (~0.1% of rows) — the regime the pre-filter exists for.
3. ``operators/timeseries.growth_accounting`` — two user-keyed grouped
   passes + bounded day-frame window.

(rendezvous_assign/churn is a pure per-row expression + scalar fold;
ucb_arm_scores is one grouped pass + one-row anchors — scan-shaped,
not probed separately.)

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one.

Usage: python tools/scale_probe_r13.py  (markdown block for SCALING.md).
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


def probe_salted_topk(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.rank import (
        salted_grouped_topk,
    )

    df = spark.range(n).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.pmod(F.col("id") * 2654435761, F.lit(1_000_000_000)).alias("v"),
        F.col("id"),
    )
    t0 = time.time()
    out = salted_grouped_topk(df, ["g"], "v", "id", 10)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_merkle_diff(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        merkle_range_diff,
    )

    old = spark.range(n).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id") * 7919, F.lit(100_000)).alias("a"),
        F.pmod(F.col("id") * 104729, F.lit(100_000)).alias("b"),
    )
    new = old.filter(F.col("k") % 1999 != 0).withColumn(
        "a", F.when(F.col("k") % 1009 == 0, F.col("a") + 1).otherwise(F.col("a"))
    )
    # buckets scale with n so expected diffs-per-bucket stays constant —
    # the sparse regime the pre-filter exists for (a fixed bucket count
    # at 10x drift volume would put a diff in EVERY bucket and reread
    # the whole table in the detail phase)
    t0 = time.time()
    out = merkle_range_diff(old, new, "k", ["a", "b"], n_buckets=n // 250)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_growth(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        growth_accounting,
    )

    df = spark.range(n).select(
        F.pmod(F.col("id") * 2654435761, F.lit(n // 20 + 1)).alias("u"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.pmod(F.col("id") * 13, F.lit(90)).cast("int")).alias("day"),
    )
    t0 = time.time()
    out = growth_accounting(df, "u", "day")
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r13", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("salted_grouped_topk (5 hot groups)", probe_salted_topk, 1_000_000),
        ("merkle_range_diff (0.1% drift)", probe_merkle_diff, 1_000_000),
        ("growth_accounting (90 days)", probe_growth, 1_000_000),
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
