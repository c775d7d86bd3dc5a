"""Round-16 staged-wave scale probes: 1x/10x evidence for the r16
operators with non-trivial shapes, BEFORE gate registration.

1. ``similarity.mmr_rerank`` — queries scale, candidate lists stay
   bounded (the caller contract): k rounds of uniform query-key joins;
   wall must track the number of queries, never queries x candidates².
2. ``operators/eval_metrics.isotonic_calibration_bins`` — rows scale
   over a FIXED bin domain: the one count shuffle dominates; the
   B³/6 minimax expansion is constant-size.

The remaining wave members ride probed or scan-shaped primitives
(documented in SCALING.md). Fails loudly if scale-up INTRODUCES a
SinglePartition exchange.

Usage: python tools/scale_probe_r16.py  (markdown block for SCALING.md).
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


def probe_mmr(spark, n_queries: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.similarity import mmr_rerank

    m = 8  # bounded candidate list per query (the retrieval top-m)
    cands = spark.range(n_queries * m).select(
        (F.col("id") % n_queries).alias("q"),
        F.col("id").alias("d"),
        F.pmod(F.col("id") * 7919, F.lit(1000)).alias("rel"),
        F.expr(
            "transform(sequence(1, 8), j -> CAST(pmod(id * (j * 104729 + 7),"
            " 255) - 127 AS INT))"
        ).alias("v"),
    )
    t0 = time.time()
    out = mmr_rerank(cands, "q", "d", "rel", "v", 4)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def probe_isotonic(spark, n: int) -> tuple[float, int, int]:
    from dwh_etl_ods_spark_jobs_spark.operators.eval_metrics import (
        isotonic_calibration_bins,
    )

    df = spark.range(n).select(
        F.pmod(F.col("id") * 2003, F.lit(1000001)).alias("score"),
        (F.pmod(F.col("id") * 7919, F.lit(1000)) < F.pmod(
            F.col("id") * 2003, F.lit(1000001)
        ) / 1200).cast("long").alias("lbl"),
    )
    t0 = time.time()
    out = isotonic_calibration_bins(df, "score", "lbl", 10)
    n_rows = out.count()
    return time.time() - t0, n_rows, single_partition_exchanges(out)


def main() -> None:
    spark = get_spark("scale-probe-r16", shuffle_partitions=32)
    spark.range(1).count()
    rows = []
    for name, fn, one in (
        ("mmr_rerank (queries scale, 8-cand lists, k=4)", probe_mmr, 10_000),
        ("isotonic_calibration_bins (rows scale, B=10)", probe_isotonic,
         1_000_000),
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
