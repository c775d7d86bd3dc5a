"""Isolated A/B for the ``rrf_hybrid_fusion`` bench-drift question
(VERDICT r12 "What's wrong" #3 / "Next round" #3).

Round-12 close flagged the entry 0.86 s (r11 floor) -> 1.31 s min-of-7
(1.53x); the builder's isolated re-measure read 1.11 s but the judge's
read 1.43 s — two independent measurements above the 1.5x criterion,
with NO code change to the plan (`plans/staged_r9.py` untouched since
r11). This script closes the question the only way noise can be closed:
same session, same machine, ALTERNATING subprocess runs of the r11 tree
(a `git worktree` of commit 36e0711, the r11 round-close) and the
current tree, each run timing min-of-9 steady-state executions at sf0.1
after a sf0.001 codegen warm-up — the exact bench.py convention.

Usage:
  python tools/rrf_ab_r13.py worker <repo_root>   # one tree, one JSON line
  python tools/rrf_ab_r13.py <r11_root> <cur_root>  # alternate 3x each,
                                                    # write rrf_ab_r13.json

Verdict rule (pre-committed): compare min-over-all-runs per tree. If
cur_min / r11_min < 1.25 the drift is NOISE (the machine's documented
run-to-run band); >= 1.5 it is REAL and the plan needs work; in between
it is AMBIENT (real wall added by battery growth / JVM heap shape, not
by this query's plan — adjudicated by the per-run spread).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERY = "rrf_hybrid_fusion"
SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"
N_TIMED = 9
N_ALTERNATIONS = 3


def worker(repo_root: str) -> None:
    sys.path.insert(0, repo_root)
    import __spark_entry__ as entry_mod  # noqa: E402
    from dwh_etl_ods_spark_jobs_spark.session import get_spark  # noqa: E402

    spark = get_spark("rrf-ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    fn = entry_mod.queries()[QUERY]
    fn(spark, WARM_DIR).count()  # codegen warm-up, untimed
    samples = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        samples.append(round(time.perf_counter() - t0, 4))
    print(json.dumps({"root": repo_root, "samples": samples,
                      "min": min(samples)}))


def orchestrate(r11_root: str, cur_root: str) -> None:
    runs: list[dict] = []
    for i in range(N_ALTERNATIONS):
        for label, root in (("r11", r11_root), ("cur", cur_root)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", root],
                capture_output=True, text=True, check=True,
            )
            line = out.stdout.strip().splitlines()[-1]
            rec = json.loads(line)
            rec["tree"] = label
            rec["alternation"] = i
            runs.append(rec)
            print(f"[{i}] {label}: min={rec['min']} samples={rec['samples']}")
    r11_min = min(r["min"] for r in runs if r["tree"] == "r11")
    cur_min = min(r["min"] for r in runs if r["tree"] == "cur")
    ratio = round(cur_min / r11_min, 3)
    verdict = ("NOISE" if ratio < 1.25
               else "REAL" if ratio >= 1.5 else "AMBIENT")
    artifact = {
        "query": QUERY,
        "sf_dir": SF_DIR,
        "n_timed_per_run": N_TIMED,
        "n_alternations": N_ALTERNATIONS,
        "r11_min": r11_min,
        "cur_min": cur_min,
        "ratio_cur_over_r11": ratio,
        "verdict": verdict,
        "runs": runs,
        "context": ("VERDICT r12 #3: r12 round-close batch read 1.31 s "
                    "min-of-7 vs the 0.86 s r11 floor (1.53x); builder "
                    "isolated 1.11 s, judge isolated 1.43 s; code "
                    "untouched since r11 — this alternating same-session "
                    "A/B adjudicates noise vs real."),
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "rrf_ab_r13.json")
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"\nverdict: {verdict}  r11_min={r11_min}  cur_min={cur_min}  "
          f"ratio={ratio}\nwrote {out_path}")


if __name__ == "__main__":
    if sys.argv[1] == "worker":
        worker(sys.argv[2])
    else:
        orchestrate(sys.argv[1], sys.argv[2])
