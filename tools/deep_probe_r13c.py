"""Round-13 deep probe #3: the staged-r15 spatial grid-radius join at
1x/10x/100x BEFORE its r14-round gate registration — extending the
deep-probe discipline (measured rungs + SinglePartition asserts +
an adversarial shape) to the heaviest staged entry, the way the
PPR/Merkle/prefix-filter/semantic-dedup ledger entries did for the
registered battery.

Constant-density scaling (the honest contract from
tools/scale_probe_r15.py): points 100k -> 1M -> 10M over a world whose
side grows with sqrt(n), so mean cell occupancy is FIXED (~50) and
both the pair output and the wall must track n, never n².

Adversarial rung: the scraper-bot shape — 10M points of which 1M
geocode into ONE cell (every bot reports (7, 11)). With
``max_per_cell=1000`` the hot cell leaves the pair domain entirely
(STATED SEMANTICS: zero pairs from it, excluded-cell census for the
caller), so the wall must stay in the clean-10M regime instead of
paying C(1M, 2) ~ 5e11 pairs. The probe asserts the organic points'
pair output is unaffected in magnitude and the plan stays
SinglePartition-free.

Usage: python tools/deep_probe_r13c.py   (markdown rows for SCALING.md).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

RADIUS = 100
PER_CELL = 50  # target mean occupancy at every scale


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


def synth_points(spark, n: int, hot: int = 0):
    """n organic points uniform over a sqrt(n)-scaled world (constant
    density), plus `hot` bot points all at one coordinate."""
    side = int(math.isqrt(n // PER_CELL) + 1) * RADIUS
    organic = spark.range(n).select(
        F.col("id").alias("pid"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(side)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(side)).alias("y"),
    )
    if hot:
        bots = spark.range(n, n + hot).select(
            F.col("id").alias("pid"),
            F.lit(7).cast("long").alias("x"),
            F.lit(11).cast("long").alias("y"),
        )
        organic = organic.unionByName(bots)
    return organic.repartition(32)


def probe(spark, n: int, hot: int = 0, cap: int | None = None):
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs,
    )

    pts = synth_points(spark, n, hot=hot)
    t0 = time.time()
    out = grid_radius_pairs(pts, "pid", "x", "y", RADIUS, max_per_cell=cap)
    n_pairs = out.count()
    wall = time.time() - t0
    return wall, n_pairs, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep_probe_r13c", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    print("| probe | points | hot | cap | wall_s | pairs | SinglePartition |")
    print("|---|---|---|---|---|---|---|")
    walls, sps, pair_rates = [], [], []
    for n in (100_000, 1_000_000, 10_000_000):
        wall, n_pairs, sp = probe(spark, n)
        walls.append(wall)
        sps.append(sp)
        pair_rates.append(n_pairs / n)
        print(f"| grid_radius_pairs | {n:,} | 0 | - | {wall:.1f} "
              f"| {n_pairs:,} | {sp} |")
    assert max(sps) == min(sps), f"SinglePartition drifted: {sps}"
    # constant density => pairs-per-point is a constant of the geometry;
    # the rungs must agree within sampling noise, or the scaling is
    # secretly quadratic
    assert max(pair_rates) <= 1.25 * min(pair_rates), pair_rates
    print(f"ratios: 10x {walls[1] / walls[0]:.1f}x, "
          f"100x {walls[2] / walls[0]:.1f}x; "
          f"pairs/point {', '.join(f'{r:.2f}' for r in pair_rates)}")

    # adversarial: 1M bots in ONE cell, capped out of the domain
    wall_adv, pairs_adv, sp_adv = probe(
        spark, 10_000_000, hot=1_000_000, cap=1000
    )
    print(f"| grid_radius_pairs | 10,000,000 | 1,000,000 | 1000 "
          f"| {wall_adv:.1f} | {pairs_adv:,} | {sp_adv} |")
    assert sp_adv == sps[0], (sp_adv, sps)
    # the hot cell contributes ZERO pairs; organic output magnitude holds
    # (the bots' cell may also evict a handful of organic co-residents —
    # bounded by one cell's occupancy)
    clean_10m_pairs = pair_rates[2] * 10_000_000
    assert abs(pairs_adv - clean_10m_pairs) <= 2 * PER_CELL * PER_CELL, (
        pairs_adv, clean_10m_pairs
    )
    # the cap must keep the adversarial wall in the clean-10M regime,
    # not the C(1M,2) regime
    assert wall_adv <= 3.0 * walls[2], (wall_adv, walls[2])
    print(f"adversarial vs clean 10M wall: {wall_adv / walls[2]:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
