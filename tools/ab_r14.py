"""Generic alternating same-session A/B harness for optimization round 14.

The machine's documented run-to-run band is wide (±25-50% on batch
medians — VERDICT r9 #3, r13 close), so NO before/after claim this round
rests on two benches taken at different times. Every claim is an
ALTERNATING subprocess A/B: tree A and tree B (git worktrees or the live
repo root) run in strict alternation inside one session window, each
subprocess timing min-of-N steady-state executions per query at sf0.1
after a sf0.001 codegen warm-up — the bench.py convention exactly.

Usage:
  python tools/ab_r14.py worker <repo_root> <q1,q2,..> <n_timed>
  python tools/ab_r14.py <rootA> <rootB> <q1,q2,..> [alternations] [n_timed] [out.json]

Verdict rule per query (pre-committed, the rrf_ab_r13 thresholds):
B_min/A_min < 0.9 -> WIN, <= 1.11 -> FLAT (inside single-query jitter),
> 1.11 -> REGRESSION candidate (re-run before believing).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def worker(repo_root: str, queries: list[str], n_timed: int) -> None:
    sys.path.insert(0, repo_root)
    import __spark_entry__ as entry_mod  # noqa: E402
    from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

    spark = get_spark("ab-r14")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in queries:
        fn = qs[name]
        try:
            fn(spark, WARM_DIR).count()  # codegen warm-up, untimed
        except Exception:
            pass
        samples = []
        for _ in range(n_timed):
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = {"samples": samples, "min": min(samples)}
    print("ABJSON:" + json.dumps(out))


def orchestrate(
    root_a: str, root_b: str, queries: list[str],
    alternations: int, n_timed: int, out_path: str | None,
) -> None:
    runs: list[dict] = []
    qarg = ",".join(queries)
    for i in range(alternations):
        for label, root in (("A", root_a), ("B", root_b)):
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", root,
                 qarg, str(n_timed)],
                capture_output=True, text=True, check=True,
            )
            line = [ln for ln in res.stdout.splitlines()
                    if ln.startswith("ABJSON:")][-1]
            rec = {"tree": label, "root": root, "alternation": i,
                   "queries": json.loads(line[len("ABJSON:"):])}
            runs.append(rec)
            mins = {k: v["min"] for k, v in rec["queries"].items()}
            print(f"[{i}] {label}: {mins}", flush=True)
    summary = {}
    for q in queries:
        a_min = min(r["queries"][q]["min"] for r in runs if r["tree"] == "A")
        b_min = min(r["queries"][q]["min"] for r in runs if r["tree"] == "B")
        ratio = round(b_min / a_min, 3) if a_min else None
        summary[q] = {"A_min": a_min, "B_min": b_min, "ratio_B_over_A": ratio}
        print(f"{q}: A={a_min} B={b_min} ratio={ratio}")
    artifact = {
        "sf_dir": SF_DIR, "n_timed_per_run": n_timed,
        "alternations": alternations, "root_a": root_a, "root_b": root_b,
        "summary": summary, "runs": runs,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    if sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3].split(","), int(sys.argv[4]))
    else:
        queries = sys.argv[3].split(",")
        alternations = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        n_timed = int(sys.argv[5]) if len(sys.argv) > 5 else 5
        out = sys.argv[6] if len(sys.argv) > 6 else None
        orchestrate(sys.argv[1], sys.argv[2], queries, alternations, n_timed, out)
