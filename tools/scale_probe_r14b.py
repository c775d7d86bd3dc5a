"""r14-wave addendum probe: markov_removal_attribution at 1x/10x raw
transition volume with a FIXED channel alphabet — the claim under test
is that session volume only touches the transition-count fold while the
value iteration runs on the bounded (channels+3)² frame, so wall must
track the one scan, not the iteration count.

(srm_check and weighted_reservoir_sample are scan-shaped: one grouped
count pass / a scan-side key + the already-probed salted_grouped_topk —
no separate probe, noted in SCALING.md.)

Usage: python tools/scale_probe_r14b.py
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


def probe_markov(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.timeseries import (
        markov_removal_attribution,
    )

    chans = 12
    ch = lambda c: F.concat(F.lit("c"), c.cast("string"))  # noqa: E731
    # synthetic journeys as raw transitions: START->ci, ci->cj, cj->C/N
    a = F.pmod(F.col("id") * 7919, F.lit(chans))
    b = F.pmod(F.col("id") * 104729, F.lit(chans))
    t1 = spark.range(n).select(F.lit("_START_").alias("src"), ch(a).alias("dst"))
    t2 = spark.range(n).select(ch(a).alias("src"), ch(b).alias("dst"))
    t3 = spark.range(n).select(
        ch(b).alias("src"),
        F.when(F.col("id") % 3 == 0, F.lit("_CONV_"))
        .otherwise(F.lit("_NULL_"))
        .alias("dst"),
    )
    trans = t1.unionByName(t2).unionByName(t3)
    t0 = time.time()
    out = markov_removal_attribution(trans, iterations=15)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r14b", shuffle_partitions=32)
    spark.range(1).count()
    rows = []
    for name, fn, one in (
        ("markov_removal_attribution (12 channels, 15 iters)",
         probe_markov, 1_000_000),
    ):
        w1, n1, sp1 = fn(spark, one)
        w10, n10, sp10 = fn(spark, one * 10)
        assert sp10 <= sp1, f"{name}: 10x INTRODUCED SinglePartition"
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
