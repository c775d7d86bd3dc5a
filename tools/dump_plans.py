"""Dump ``explain("formatted")`` for named queries to files.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <suffix> <q1> [q2 ...]
Writes <out_dir>/<query>_<suffix>.txt for each query at sf0.1.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    repo_root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo_root)
    import __spark_entry__ as entry_mod  # noqa: E402
    from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

    spark = get_spark("dump-plans")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
