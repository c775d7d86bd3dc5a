"""Round-12 deep probe #2: ``operators.reconcile.merkle_range_diff``
at 1x/10x/100x table volume under SPARSE drift (the reconciliation
regime the operator exists for): exactly 1,000 changed + 500 added keys
regardless of volume, 256 buckets.

Claim under test: each side folds to n_buckets (count, xor-digest) rows
— a map-side-combinable scan — and the row-level full-outer join runs
ONLY over the differing buckets, so the wall tracks the digest scan
~linearly and never re-pays the full-table shuffle that snapshot_diff
would.

Usage: python tools/deep_probe_r12b.py  (markdown block for SCALING.md).
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


# md5 scatters keys uniformly, so drift must be SMALL in absolute terms
# for the bucket pre-filter to bite: ~12 touched keys cover <= ~15 of the
# 256 buckets. (A first run with 1,000 changed keys hit ALL 256 buckets
# — the documented degradation: scattered drift defeats the pre-filter
# and the row diff pays the full-table join, still linear, never worse
# than snapshot_diff. Both shapes are recorded in SCALING.md.)
N_CHANGED = 10
N_ADDED = 2


def probe(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.reconcile import (
        merkle_range_diff,
    )

    old = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).cast("long").alias("v"),
    )
    # new: same keys with the first N_CHANGED values bumped, plus
    # N_ADDED brand-new keys — drift size fixed as volume scales
    new = spark.range(n + N_ADDED).select(
        F.col("id").alias("k"),
        (
            (F.col("id") % 997)
            + F.when(F.col("id") < N_CHANGED, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("v"),
    )
    t0 = time.time()
    out = merkle_range_diff(old, new, "k", ["v"], n_buckets=256)
    rows = out.collect()
    wall = time.time() - t0
    n_changed = sum(r.n_changed for r in rows)
    n_added = sum(r.n_added for r in rows)
    assert n_changed == N_CHANGED and n_added == N_ADDED, (n_changed, n_added)
    assert len(rows) < 32  # the pre-filter actually pruned
    return wall, len(rows), single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep_probe_r12b", shuffle_partitions=32)
    spark.range(1).count()
    print("| rows/side | wall_s | differing_buckets | SinglePartition |")
    print("|---|---|---|---|")
    walls = []
    sps = []
    for n in (1_000_000, 10_000_000, 100_000_000):
        wall, buckets, sp = probe(spark, n)
        walls.append(wall)
        sps.append(sp)
        print(f"| {n:,} | {wall:.1f} | {buckets} | {sp} |")
    assert max(sps) <= sps[0], f"scale-up INTRODUCED SinglePartition: {sps}"
    print(
        f"ratios: 10x {walls[1] / walls[0]:.1f}x, "
        f"100x {walls[2] / walls[0]:.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
