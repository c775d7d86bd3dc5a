"""Round-15 staged-wave scale probes: 1x/10x evidence for the r15
operators with non-trivial shuffles, BEFORE gate registration.

1. ``operators/spatial.grid_radius_pairs`` — CONSTANT-DENSITY scaling:
   points 10x over a sqrt(10)-wider world, so cell occupancy (and the
   per-cell pair work) stays fixed; wall and output must track n, not
   n². The dense-cell adversarial shape is NOT probed: its output is
   quadratic by definition (module docstring states the cell-sizing
   contract).
2. ``similarity.kcenter_greedy_select`` — k broadcast rounds over n
   codes: wall must track n (O(k·n) distance evaluations), never n².
3. ``dedup.fellegi_sunter_scores`` — CONSTANT-BLOCK-SIZE scaling:
   rows 10x over 10x more blocks (~100 rows/block), so candidate pairs
   scale linearly; the weight frame stays one broadcast row.
4. ``operators/quality.t_closeness_census`` — classes scale with n
   (~100 rows/class), V fixed at 10: the class x value grid is linear
   in classes; the ONE expected SinglePartition is the bounded V-row
   global value frame (constant 1x -> 10x).

Prints each plan's Exchange SinglePartition count at both scales and
fails loudly if scale-up INTRODUCES one.

Usage: python tools/scale_probe_r15.py  (markdown block for SCALING.md).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402


def single_partition_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange SinglePartition")


RADIUS = 100
PER_CELL = 50  # target mean points per grid cell at every scale


def probe_grid_pairs(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.spatial import (
        grid_radius_pairs,
    )

    world = int(RADIUS * math.sqrt(n / PER_CELL))  # keeps density fixed
    pts = spark.range(n).select(
        F.col("id"),
        F.pmod(F.col("id") * 2654435761, F.lit(world)).alias("x"),
        F.pmod(F.col("id") * 104729, F.lit(world)).alias("y"),
    )
    t0 = time.time()
    out = grid_radius_pairs(pts, "id", "x", "y", RADIUS)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_kcenter(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.similarity import kcenter_greedy_select

    codes = F.expr(
        "transform(sequence(1, 16), j -> CAST(pmod(id * (j * 7919 + 17), 255)"
        " - 127 AS INT))"
    )
    pts = spark.range(n).select(F.col("id"), codes.alias("q"))
    t0 = time.time()
    out = kcenter_greedy_select(pts, "id", "q", 5)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_fellegi(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import fellegi_sunter_scores

    recs = spark.range(n).select(
        F.col("id"),
        (F.col("id") % (n // 100)).alias("blk"),  # ~100 rows per block
        F.pmod(F.col("id") * 7919, F.lit(5)).cast("string").alias("seg"),
        F.pmod(F.col("id") * 104729, F.lit(40)).alias("band"),
    )
    t0 = time.time()
    out = fellegi_sunter_scores(
        recs, "id", "blk", [("seg", "seg"), ("band", "band")]
    )
    # pairs are linear in n at fixed block size; censusing keeps the
    # count cheap without materializing the pair list to the driver
    n_rows = out.groupBy("n_agree").count().count()
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
    spark = get_spark("scale-probe-r15", shuffle_partitions=32)
    spark.range(1).count()  # JVM warm-up
    rows = []
    for name, fn, one in (
        ("grid_radius_pairs (constant density, world ~ sqrt(n))",
         probe_grid_pairs, 1_000_000),
        ("kcenter_greedy_select (k=5, dim 16)", probe_kcenter, 100_000),
        ("fellegi_sunter_scores (100-row blocks, 2 fields)",
         probe_fellegi, 200_000),
        ("t_closeness_census (100-row classes, V=10)",
         probe_t_closeness, 1_000_000),
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
