"""Plans-only census (driver-side, no execution): for every battery query
record plan construction time, plan line count, and operator tallies from
``explain("formatted")``. Monsters (thousands of lines, dozens of
Exchanges) mark duplicated-subtree / unpinned-loop bugs worth fixing.

Usage: python tools/plan_census_r14.py [--out FILE] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    if argv and argv[0] == "--out":
        out_path = argv[1]
        argv = argv[2:]
    import __spark_entry__ as entry_mod
    from dwh_etl_ods_spark_jobs_spark.session import get_spark

    spark = get_spark("plan-census")
    qs = entry_mod.queries()
    if argv:
        qs = {k: qs[k] for k in argv}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            rows[name] = {
                "plan_s": round(time.time() - t0, 3),
                "lines": txt.count("\n"),
                "exchange": txt.count("Exchange"),
                "smj": txt.count("SortMergeJoin"),
                "bhj": txt.count("BroadcastHashJoin"),
                "python": txt.count("EvalPython")
                + txt.count("MapInPandas") + txt.count("MapInArrow"),
                "scans": txt.count("Scan parquet"),
            }
        except Exception as e:  # noqa: BLE001
            rows[name] = {"err": repr(e)[:200]}
        sys.stderr.write(f"{name}: {rows[name]}\n")
    payload = json.dumps({"sf_dir": sf_dir, "queries": rows}, indent=1)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(payload + "\n")
    print(payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
