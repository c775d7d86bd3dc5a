"""Bench the not-yet-registered staged battery (plans/staged_r10.py) at
$SPARK_GRAFT_SF_DIR (default sf0.1) — same timing discipline as bench.py
(tiny-SF codegen warm-up per query, median of N runs) but scoped to the
staged set, so each round's inbound queries carry a committed wall before
they hit the driver gate (committed as bench_r{N}_staged_local.json).

Usage: python tools/staged_bench.py [> bench_r9_staged_local.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))

    from dwh_etl_ods_spark_jobs_spark.plans import staged_r10 as staged
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("staged-bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in staged.STAGED_QUERIES.items():
        try:
            fn(spark, warm_dir).count()  # codegen warm-up, untimed
        except Exception:
            pass
        samples = []
        try:
            for _ in range(n_runs):
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            med = statistics.median(samples)
            timings[name] = round(med, 3)
            total += med
        except Exception as e:  # pragma: no cover
            print(f"staged bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
    print(
        json.dumps(
            {
                "metric": "staged_r10_total_query_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "n": n_runs,
                "sf": os.path.basename(sf_dir.rstrip("/")).replace("sf", ""),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
