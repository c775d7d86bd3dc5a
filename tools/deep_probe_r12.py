"""Round-12 deep probe (the r11 deep-probe discipline: 1x/10x/100x
rungs, not just 10x) for the heaviest newly registered r13-wave
operator:

``graph.personalized_pagerank`` over a synthetic directed graph with a
skewed (hub-heavy) degree distribution: edges scale 1M -> 10M -> 100M
while iterations stay at the battery's 3. The physiology claim under
test: per iteration exactly ONE rank equi-join + one map-side-combinable
contribution sum over the checkpointed degree-annotated edge list, so
wall should track the edge volume ~linearly and the plan must hold
Exchange SinglePartition at 0 on every rung (ranks never funnel through
one task).

Hub shape: node ids draw from a quadratic-collision map, so a handful
of nodes carry ~sqrt(n) of the edges — the skew a real
supplier/customer graph shows. Seeds are every 128th node (the battery
query's cohort rule).

Usage: python tools/deep_probe_r12.py   (markdown block for SCALING.md).
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


def probe_ppr(spark, n_edges: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.graph import personalized_pagerank

    n_nodes = max(1000, n_edges // 8)
    # quadratic-residue src map -> the node universe SCALES with the
    # edge count (~n_nodes/2 distinct src) while collision multiplicity
    # varies, giving hub-heavy out-degrees; dst scattered uniformly
    edges = spark.range(n_edges).select(
        F.pmod(F.col("id") * F.col("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.col("id") * 2654435761 + 7, F.lit(n_nodes)).alias("dst"),
    )
    seeds = (
        edges.select(F.col("src").alias("node"))
        .where(F.col("node") % 128 == 0)
        .distinct()
    )
    t0 = time.time()
    out = personalized_pagerank(edges, seeds, iterations=3)
    n_rows = out.count()
    wall = time.time() - t0
    return wall, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("deep_probe_r12", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    print("| probe | edges | wall_s | rank_rows | SinglePartition |")
    print("|---|---|---|---|---|")
    walls = []
    sps = []
    for n in (1_000_000, 10_000_000, 100_000_000):
        wall, rows, sp = probe_ppr(spark, n)
        walls.append(wall)
        sps.append(sp)
        print(f"| ppr_hub_3iter | {n:,} | {wall:.1f} | {rows:,} | {sp} |")
    assert max(sps) == min(sps), f"SinglePartition drifted: {sps}"
    print(
        f"ratios: 10x {walls[1] / walls[0]:.1f}x, "
        f"100x {walls[2] / walls[0]:.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
