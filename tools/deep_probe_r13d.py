"""Round-13 deep probe #4: the last two staged operators with
non-trivial shuffle physiology get their 100x rung BEFORE the r14-round
registration — completing the pre-registration deep-probe ledger for
the whole staged backlog (probe #3 covered the spatial grid join).

1. ``similarity.kcenter_greedy_select`` (the `embedding_kcenter_coreset`
   physiology) at 100k/1M/10M codes, k=5, dim 16: each round is ONE
   scan + broadcast of the chosen set, so total work is O(k·n) distance
   folds and wall must track n — the 1x/10x r15 probe rode this claim,
   the 100x rung retires it.
2. ``dedup.fellegi_sunter_scores`` (the `customer_linkage_scores`
   physiology) at 100k/1M/10M records under CONSTANT block size (~100
   rows/block, blocks scale with n): candidate pairs (~50·n) and wall
   must track n; the u-probability frequency tables stay one broadcast
   row per field regardless of volume.

Both assert the SinglePartition count does not grow with scale (the
kcenter argmax anchor is a constant-size reduction by design — its
count must stay FLAT, not zero; the FS plan must stay at 0).

Usage: python tools/deep_probe_r13d.py   (markdown rows for SCALING.md).
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


def probe_kcenter(spark, n: int):
    from dwh_etl_ods_spark_jobs_spark.similarity import kcenter_greedy_select

    codes = F.expr(
        "transform(sequence(1, 16), j -> CAST(pmod(id * (j * 7919 + 17), 255)"
        " - 127 AS INT))"
    )
    pts = spark.range(n).repartition(32).select(F.col("id"), codes.alias("q"))
    t0 = time.time()
    out = kcenter_greedy_select(pts, "id", "q", 5)
    n_rows = out.count()
    wall = time.time() - t0
    return wall, n_rows, single_partition_exchanges(out)


def probe_fellegi(spark, n: int):
    from dwh_etl_ods_spark_jobs_spark.dedup import fellegi_sunter_scores

    recs = spark.range(n).repartition(32).select(
        F.col("id"),
        (F.col("id") % (n // 100)).alias("blk"),  # ~100 rows per block
        F.pmod(F.col("id") * 7919, F.lit(5)).cast("string").alias("seg"),
        F.pmod(F.col("id") * 104729, F.lit(40)).alias("band"),
    )
    t0 = time.time()
    out = fellegi_sunter_scores(
        recs, "id", "blk", [("seg", "seg"), ("band", "band")]
    )
    # census instead of materializing ~50*n pairs to the driver
    n_pairs = out.agg(F.count(F.lit(1)).cast("long").alias("n")).collect()[0][
        "n"
    ]
    wall = time.time() - t0
    return wall, n_pairs, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep_probe_r13d", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up

    for label, fn, check_pairs in (
        ("kcenter_k5_dim16", probe_kcenter, False),
        ("fellegi_sunter_block100", probe_fellegi, True),
    ):
        print(f"| probe | rows | wall_s | out | SinglePartition |")
        print("|---|---|---|---|---|")
        walls, sps, rates = [], [], []
        for n in (100_000, 1_000_000, 10_000_000):
            wall, rows, sp = fn(spark, n)
            walls.append(wall)
            sps.append(sp)
            rates.append(rows / n)
            print(f"| {label} | {n:,} | {wall:.1f} | {rows:,} | {sp} |")
        assert max(sps) == min(sps), f"{label}: SinglePartition grew: {sps}"
        if check_pairs:
            # constant block size => pairs-per-record is constant
            assert max(rates) <= 1.1 * min(rates), (label, rates)
        print(f"{label} ratios: 10x {walls[1] / walls[0]:.1f}x, "
              f"100x {walls[2] / walls[0]:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
