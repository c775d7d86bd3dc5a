"""Deep scale probes (1x / 10x / 100x) for two load-bearing
physiologies — two decades of input growth in one table, extending the
standard 1x/10x evidence where a 10x step alone can hide a superlinear
knee:

1. ``operators/incremental.anti_join_new`` — THE reference workload
   shape (null-safe LEFT ANTI incremental detector, composite key, 5%
   genuinely-new rows): source AND target both scale; wall must track
   the shuffle volume linearly.
2. ``operators/quality.t_closeness_census`` — the r15 count-grid
   physiology: raw rows collapse to a (classes x V) grid (classes
   ~ n/100, V = 10 fixed), so the post-grid work scales with the grid,
   not the rows.

Prints the wall/output/SinglePartition table for SCALING.md; fails
loudly if scale-up INTRODUCES a SinglePartition exchange.

Usage: python tools/deep_probe_r11.py   (~4 min; the 100x rows are
200M source + 200M target keys for the anti join, 100M rows for the
census).
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


def probe_anti_join(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.incremental import (
        anti_join_new,
    )

    # composite (patient, visit-day) style key; 5% of source keys are new
    target = spark.range(n).select(
        (F.col("id") % (n // 7)).alias("pk"),
        (F.col("id") % 365).alias("day"),
    )
    source = spark.range(n).select(
        F.when(F.col("id") % 20 == 0, F.col("id") + 10 * n)
        .otherwise(F.col("id") % (n // 7))
        .alias("pk"),
        (F.col("id") % 365).alias("day"),
    )
    t0 = time.time()
    out = anti_join_new(target, ["pk", "day"])(source)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_t_closeness(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.quality import (
        t_closeness_census,
    )

    rows = spark.range(n).select(
        (F.col("id") % (n // 100)).alias("qa"),  # ~100 rows per class
        F.pmod(F.col("id") * 7919, F.lit(3)).alias("qb"),
        F.pmod(F.col("id") * 104729, F.lit(10)).alias("sens"),
    )
    t0 = time.time()
    out = t_closeness_census(rows, ["qa", "qb"], "sens", 200_000)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep-probe-r11", shuffle_partitions=64)
    spark.range(1).count()  # JVM warm-up
    probes = (
        ("anti_join_new (composite key, 5% new, both sides scale)",
         probe_anti_join, 2_000_000),
        ("t_closeness_census (100-row classes, V=10)",
         probe_t_closeness, 1_000_000),
    )
    print("| probe | scale | input | wall | out rows | wall ratio "
          "| SinglePartition |")
    print("|---|---|---|---|---|---|---|")
    for name, fn, one in probes:
        prev_w, base_sp = None, None
        for mult, label in ((1, "1x"), (10, "10x"), (100, "100x")):
            w, nr, sp = fn(spark, one * mult)
            if base_sp is None:
                base_sp = sp
            assert sp <= base_sp, (
                f"{name}@{label}: SinglePartition introduced "
                f"({base_sp}->{sp})"
            )
            ratio = "" if prev_w is None else f"{w / prev_w:.1f}x"
            print(
                f"| {name} | {label} | {one * mult:,} | {w:.1f} s "
                f"| {nr:,} | {ratio} | {sp} |"
            )
            prev_w = w


if __name__ == "__main__":
    main()
