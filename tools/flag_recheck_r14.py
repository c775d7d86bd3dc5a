"""Round-14 flag recheck (VERDICT r13 "What's wrong" #3 / "Next round"
#4): confirm the zorder_locality / funnel_conversion ambient reading
against their R13 floors (the committed quiet-pass
bench_r13_local.json queries_min), not the r12 floors the r13
adjudication used. Isolated min-of-9 per query in a fresh JVM after a
sf0.001 codegen warm-up — the rrf_ab_r13 protocol.

Verdict rule (pre-committed, same as r13): flag only when BOTH
ratio >= 1.5x AND abs delta >= +0.3 s vs the floor; under the min-abs
band the reading is jitter on a sub-second query. If both hold again
on untouched code, treat as REAL and bisect the battery-position /
JVM-state cause.

Usage: python tools/flag_recheck_r14.py   (writes flag_recheck_r14.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"
N_TIMED = 9
R13_FLOORS = {"zorder_locality": 0.352, "funnel_conversion": 0.398}


def main() -> None:
    import __spark_entry__ as entry_mod
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("flag-recheck-r14")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entry_mod.queries()
    per = {}
    for name, floor in R13_FLOORS.items():
        fn = qs[name]
        fn(spark, WARM_DIR).count()  # codegen warm-up, untimed
        samples = []
        for _ in range(N_TIMED):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 4))
        mn = min(samples)
        ratio = round(mn / floor, 2)
        delta = round(mn - floor, 3)
        verdict = (
            "REAL-REGRESSION" if ratio >= 1.5 and delta >= 0.3
            else ("UNDER-MIN-ABS" if ratio >= 1.5 else "CLEAN")
        )
        per[name] = {
            "r13_floor_min": floor,
            "isolated_min_of_9": mn,
            "samples": samples,
            "ratio_vs_r13": ratio,
            "abs_delta_s": delta,
            "verdict": verdict,
        }
        print(name, per[name]["verdict"], mn, "vs", floor)
    out = {
        "context": (
            "r14 confirmation of the r13 zorder/funnel ambient band "
            "(VERDICT r13 #4): isolated min-of-9 vs the committed r13 "
            "quiet-pass floors (bench_r13_local.json queries_min); flag "
            "criterion 1.5x AND +0.3s."
        ),
        "per_query": per,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "flag_recheck_r14.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
