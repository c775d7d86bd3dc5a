"""Bench a not-yet-registered staged battery at $SPARK_GRAFT_SF_DIR
(default sf0.1) — same timing discipline as bench.py (tiny-SF codegen
warm-up per query, median + min of N runs) but scoped to the staged set,
so each round's inbound queries carry a committed wall before they hit
the driver gate.

The staged module and metric label derive from $SPARK_GRAFT_STAGED_MOD
(default: the newest ``plans/staged_r*.py``), so the artifact name,
metric, and measured module always agree (ADVICE r9: the r9-named
artifact carried an r10 metric). Commit the output as
``bench_r{N}_staged_local.json`` where N is the round whose gate the
staged set targets — i.e. the staged module's own round number.

Usage: python tools/staged_bench.py [> bench_r10_staged_local.json]
"""

from __future__ import annotations

import glob
import importlib
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _newest_staged_module() -> str:
    pkg_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dwh_etl_ods_spark_jobs_spark",
        "plans",
    )
    rounds = []
    for path in glob.glob(os.path.join(pkg_dir, "staged_r*.py")):
        m = re.match(r"staged_r(\d+)\.py$", os.path.basename(path))
        if m:
            rounds.append(int(m.group(1)))
    if not rounds:
        return "staged"
    return f"staged_r{max(rounds)}"


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    mod_name = os.environ.get("SPARK_GRAFT_STAGED_MOD", _newest_staged_module())

    staged = importlib.import_module(
        f"dwh_etl_ods_spark_jobs_spark.plans.{mod_name}"
    )
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("staged-bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    total = 0.0
    total_min = 0.0
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
            mins[name] = round(min(samples), 3)
            total += med
            total_min += min(samples)
        except Exception as e:  # pragma: no cover
            print(f"staged bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
            mins[name] = -1.0
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    print(
        json.dumps(
            {
                "metric": f"{mod_name}_total_query_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "queries_min": mins,
                "value_min": round(total_min, 3),
                "n": n_runs,
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
