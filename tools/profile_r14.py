"""Optimization-round profiler (guide §1: measure first).

For each named query (default: all 186), measures
  - ``plan_s``   — DataFrame construction + analysis + physical planning
                   (time to produce ``explain formatted`` text),
  - ``run_s``    — min/median of N executions via the bench's ``count()``
                   methodology,
  - ``noop_s``   — min of N executions via the noop sink (computes every
                   column; isolates computation from count()'s pruning),
and dumps the formatted plan to ``--plan-dir`` (one file per query) with
Exchange / BatchEvalPython / join-strategy counts summarized in the JSON.

Usage:
    python tools/profile_r14.py [--n 3] [--plan-dir DIR] [--out FILE]
        [--no-noop] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    n_runs = 3
    plan_dir = None
    out_path = None
    do_noop = True
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--n":
            n_runs = int(argv[i + 1]); i += 2
        elif a == "--plan-dir":
            plan_dir = argv[i + 1]; i += 2
        elif a == "--out":
            out_path = argv[i + 1]; i += 2
        elif a == "--no-noop":
            do_noop = False; i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("profile-r14")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entry_mod.queries()
    if names:
        qs = {k: qs[k] for k in names}
    if plan_dir:
        os.makedirs(plan_dir, exist_ok=True)

    warm_dir = "/root/testdata/sf0.001"
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        rec: dict = {}
        try:
            # codegen/JIT warm-up, untimed (bench convention)
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass
            t0 = time.time()
            df = fn(spark, sf_dir)
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            rec["plan_s"] = round(time.time() - t0, 3)
            rec["n_exchange"] = plan_txt.count("Exchange")
            rec["n_python"] = (
                plan_txt.count("BatchEvalPython")
                + plan_txt.count("ArrowEvalPython")
                + plan_txt.count("MapInPandas")
                + plan_txt.count("MapInArrow")
            )
            rec["n_smj"] = plan_txt.count("SortMergeJoin")
            rec["n_bhj"] = plan_txt.count("BroadcastHashJoin")
            rec["n_shj"] = plan_txt.count("ShuffledHashJoin")
            rec["plan_lines"] = plan_txt.count("\n")
            if plan_dir:
                with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                    fh.write(plan_txt)
            samples = []
            for _ in range(n_runs):
                spark.sparkContext.setJobDescription(f"profile:{name}:count")
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            rec["run_min"] = round(min(samples), 3)
            rec["run_med"] = round(statistics.median(samples), 3)
            if do_noop:
                nsamples = []
                for _ in range(n_runs):
                    spark.sparkContext.setJobDescription(f"profile:{name}:noop")
                    t0 = time.time()
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    nsamples.append(time.time() - t0)
                rec["noop_min"] = round(min(nsamples), 3)
            spark.sparkContext.setJobDescription(None)
        except Exception as e:
            rec["err"] = repr(e)[:300]
        results[name] = rec
        sys.stderr.write(f"{name}: {rec}\n")
    payload = json.dumps({"sf_dir": sf_dir, "n": n_runs, "queries": results}, indent=1)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(payload + "\n")
    print(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
