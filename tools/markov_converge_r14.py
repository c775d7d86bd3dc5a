"""Measure the Markov value-iteration convergence knob on the battery's
own input (r14 session — the planes-knob discipline: measure the knob,
don't assume it). The battery contract runs ``MK_ITERS`` synchronous
steps on BOTH engines, so cross-engine parity is exact by construction
at ANY iteration count; this probe quantifies how far the committed
readout (the battery's MK_ITERS = 15) sits from the fixpoint — the
honest "is 15 enough for the DECISION" number — by re-running the
battery query at 10/15/20/40/80 steps at sf0.1 and reporting the worst
per-channel attribution delta between consecutive rungs.

Value iteration from below is monotone nondecreasing and the ppm grid
is integer-quantized, so once consecutive rungs agree the readout has
REACHED the fixpoint (not merely slowed): equal outputs at 40 vs 80
mean 40 is exact.

Usage: python tools/markov_converge_r14.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
RUNGS = (10, 15, 20, 40, 80)  # 15 = the battery's committed MK_ITERS


def main() -> None:
    from dwh_etl_ods_spark_jobs_spark.plans import staged_r14

    spark = get_spark("markov-converge-r14")
    spark.range(1).count()

    results = {}
    orig = staged_r14.MK_ITERS
    try:
        for iters in RUNGS:
            staged_r14.MK_ITERS = iters
            rows = {
                r["channel"]: r.asDict()
                for r in staged_r14.q_markov_attr(spark, SF_DIR).collect()
            }
            results[iters] = rows
            base = next(iter(rows.values()))["base_conv_ppm"]
            print(f"iters={iters:3d}  base_conv_ppm={base}  "
                  f"channels={len(rows)}")
    finally:
        staged_r14.MK_ITERS = orig

    prev = None
    for iters in RUNGS:
        if prev is not None:
            deltas = [
                abs(results[iters][ch]["attribution_ppm"]
                    - results[prev][ch]["attribution_ppm"])
                for ch in results[iters]
            ]
            dbase = abs(
                next(iter(results[iters].values()))["base_conv_ppm"]
                - next(iter(results[prev].values()))["base_conv_ppm"]
            )
            print(f"{prev:3d} -> {iters:3d}: max |attribution delta| = "
                  f"{max(deltas)} ppm, base delta = {dbase} ppm")
        prev = iters
    spark.stop()


if __name__ == "__main__":
    main()
