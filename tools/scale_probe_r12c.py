"""Round-12 adversarial probe for the newly registered FastSS
edit-distance-1 linkage (``dedup.edit1_linkage_census``): the scale
claim is that the deletion-neighborhood posting join runs over DISTINCT
names with multiplicities, so RECORD volume is irrelevant — a million
copies of one name cost one posting row — and the honest cost scales
with the distinct-name domain only.

Three rungs:
  1. 1M records over a FIXED 50k-name vocabulary (near-dup structure:
     half the vocabulary is a 1-char mutation of the other half);
  2. 10M records over the SAME 50k names  -> wall must stay ~flat
     (the record-collapse path absorbs the 10x);
  3. 10M records over 500k distinct names -> wall tracks the DISTINCT
     domain (the honest posting-join cost), still no SinglePartition.

Usage: python tools/scale_probe_r12c.py  (markdown block for SCALING.md).
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


def probe(spark, n_records: int, n_names: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.dedup import edit1_linkage_census

    half = n_names // 2
    # base names: "n<base36ish>"; mutated twin flips the last char, so
    # every base name has exactly one edit-distance-1 partner
    base_id = F.pmod(F.col("id") * 2654435761, F.lit(half))
    is_mut = (F.col("id") % 2 == 1).cast("int")
    df = spark.range(n_records).select(
        F.concat(
            F.lit("n"),
            F.lpad(F.conv(base_id.cast("string"), 10, 36), 6, "0"),
            F.when(is_mut == 1, F.lit("x")).otherwise(F.lit("y")),
        ).alias("name")
    )
    t0 = time.time()
    out = edit1_linkage_census(df, "name")
    row = out.collect()[0]
    wall = time.time() - t0
    # the census emits ONE row through constant-size scalar folds; what
    # matters is that scale-up does not ADD single-partition exchanges
    return wall, row.n_names, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale_probe_r12c", shuffle_partitions=32)
    spark.range(1).count()
    print("| records | distinct_names | wall_s | n_names_seen | SinglePartition |")
    print("|---|---|---|---|---|")
    walls = []
    sps = []
    for n_rec, n_nam in (
        (1_000_000, 50_000),
        (10_000_000, 50_000),
        (10_000_000, 500_000),
    ):
        wall, seen, sp = probe(spark, n_rec, n_nam)
        walls.append(wall)
        sps.append(sp)
        print(f"| {n_rec:,} | {n_nam:,} | {wall:.1f} | {seen:,} | {sp} |")
    assert max(sps) <= sps[0], f"scale-up INTRODUCED SinglePartition: {sps}"
    print(
        f"10x records, fixed vocab: {walls[1] / walls[0]:.1f}x wall; "
        f"10x distinct names at fixed records: {walls[2] / walls[1]:.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
