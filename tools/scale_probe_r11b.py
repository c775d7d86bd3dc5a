"""Round-11 adversarial-shape probes (VERDICT r10 #7) for the two r13
addendum operators that previously rode documented bounds without a
measured row:

1. ``graph.copurchase_projection`` under a HEAVY-TAILED basket: 10% of
   all rows land in ONE bot basket (100k+ distinct items at 10x) while
   the rest spread over small organic baskets. Probed WITH the r11
   ``max_basket`` cap (VERDICT r10 #4) — the pathological basket
   contributes C(max_basket, 2) pairs, not C(100k, 2), so wall scales
   with the ORGANIC volume.
2. ``operators/timeseries.acf_lags`` fed by the daily-revenue rollup
   over a LONG series (10-year daily span): raw events scale 10x while
   the day frame stays 3,650 rows — the probe shows the documented
   bounded-frame contract holds (the unpartitioned lag window only ever
   sees the rollup, so its single partition is constant-size and the
   wall tracks the rollup scan).

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one (acf_lags carries exactly ONE
by design — over the bounded day frame — and it must stay at one).

Usage: python tools/scale_probe_r11b.py  (markdown block for SCALING.md).
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


def probe_copurchase_skewed(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.graph import copurchase_projection

    # 10% of rows -> basket 0 (the bot session: ~n/10 distinct items);
    # 90% -> organic baskets of ~9 rows each over a 50k-item vocabulary.
    df = spark.range(n).select(
        F.when(F.col("id") % 10 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(n // 10 + 1)) + 1)
        .alias("basket"),
        F.when(F.col("id") % 10 == 0, F.col("id"))  # bot items all distinct
        .otherwise(F.pmod(F.col("id") * 7919, F.lit(50_000)))
        .alias("item"),
    )
    t0 = time.time()
    out = copurchase_projection(
        df, "basket", "item", min_support=2, top_k=50, max_basket=20
    )
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_daily_acf_long_series(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import acf_lags

    # n raw events over a FIXED 10-year daily span; the rollup the
    # caller owns bounds the unpartitioned lag window at 3,650 rows
    # regardless of n.
    ev = spark.range(n).select(
        F.pmod(F.col("id") * 104729, F.lit(3650)).alias("day"),
        F.pmod(F.col("id") * 7919, F.lit(10_000)).alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").cast("long").alias("rev"))
    t0 = time.time()
    out = acf_lags(daily, "day", "rev", max_lag=7)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r11b", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("copurchase_projection (10% bot basket, max_basket=20)",
         probe_copurchase_skewed, 1_000_000),
        ("acf_lags (10-yr daily rollup, raw events scale)",
         probe_daily_acf_long_series, 1_000_000),
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
