"""Freeze the reference-workload bench anchor (VERDICT r10 #5).

The query battery grows/rotates every round, so total-wall comparisons
against it need per-round decomposition. The 51-job catalog bench IS the
reference-shaped workload (every JobSpec through run_incremental_load at
1M rows/job, parallel 8 — the measured scheduler knee), so its walls are
the stable ~2x-criterion anchor.

Runs ``tools/catalog_bench.py 1000000 --parallel 8`` N times (default 5),
each in a fresh JVM (independent samples), and writes
``BASELINE_CATALOG.json`` at the repo root with per-job min+median and
the total min/median. Round-close check:

    python tools/bench_compare.py BASELINE_CATALOG.json <fresh-run.json>

(bench_compare understands both this anchor's ``per_job_min`` and the
raw catalog artifacts' ``per_job_sec``.)

Usage:
    python tools/freeze_catalog_baseline.py [n_runs]           # freeze anchor
    python tools/freeze_catalog_baseline.py --check [n_runs]   # round-close

``--check`` (default n_runs=3) does NOT overwrite the anchor: it builds
a min-of-N artifact in /tmp, fails if the TOTAL wall regressed beyond
1.3x, then runs ``tools/bench_compare.py`` against the committed
``BASELINE_CATALOG.json`` at 2.0x/+1.0 s per job. Per-job walls under
8-way FAIR concurrency measure pool contention as much as code (min-of-3
vs min-of-5 still swaps which job lands next to the heavy ones — observed
~1.56x swings on code-identical runs), so the per-job bar is the ~2x
criterion itself and the stable signal is the total. Exit code 1 = total
or a job regressed.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    argv = sys.argv[1:]
    check = "--check" in argv
    if check:
        argv.remove("--check")
    n_runs = int(argv[0]) if argv else (3 if check else 5)
    runs: list[dict] = []
    for i in range(n_runs):
        out = os.path.join(tempfile.gettempdir(), f"catalog_bench_run{i}.json")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "catalog_bench.py"),
             "1000000", out, "--parallel", "8"],
            check=True,
            cwd=REPO,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(out) as fh:
            runs.append(json.load(fh))
        print(f"run {i + 1}/{n_runs}: total {runs[-1]['total_sec']}s")
    jobs = sorted(runs[0]["per_job_sec"])
    per_min = {j: round(min(r["per_job_sec"][j] for r in runs), 2) for j in jobs}
    per_med = {
        j: round(statistics.median(r["per_job_sec"][j] for r in runs), 2)
        for j in jobs
    }
    totals = [r["total_sec"] for r in runs]
    if check:
        fresh = {
            "metric": "catalog_51jobs_1m_par8_check",
            "n_runs": n_runs,
            "total_sec_min": round(min(totals), 1),
            "queries_min": per_min,
            "queries": per_med,
        }
        fresh_path = os.path.join(
            tempfile.gettempdir(), "catalog_check_minofn.json"
        )
        with open(fresh_path, "w") as fh:
            json.dump(fresh, fh, indent=1)
        with open(os.path.join(REPO, "BASELINE_CATALOG.json")) as fh:
            anchor_total = json.load(fh)["total_sec_min"]
        ratio = fresh["total_sec_min"] / anchor_total
        print(f"fresh min-of-{n_runs}: total {fresh['total_sec_min']}s vs "
              f"anchor {anchor_total}s ({ratio:.2f}x); per-job compare at "
              f"2.0x/+1.0s (concurrent per-job walls carry pool contention)")
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "bench_compare.py"),
             os.path.join(REPO, "BASELINE_CATALOG.json"), fresh_path,
             "--threshold", "2.0", "--min-abs", "1.0"]
        )
        if ratio > 1.3:
            print(f"TOTAL REGRESSION: {ratio:.2f}x > 1.3x")
            return 1
        return rc
    anchor = {
        "metric": "catalog_51jobs_1m_par8",
        "n_runs": n_runs,
        "n_rows_per_job": 1_000_000,
        "parallel": 8,
        "total_sec_min": round(min(totals), 1),
        "total_sec_median": round(statistics.median(totals), 1),
        "total_sec_all": totals,
        "per_job_min": per_min,
        "per_job_median": per_med,
        # bench_compare.py consumes queries_min/queries like any bench
        # artifact, so the anchor is directly comparable to a fresh run.
        "queries_min": per_min,
        "queries": per_med,
    }
    out_path = os.path.join(REPO, "BASELINE_CATALOG.json")
    with open(out_path, "w") as fh:
        json.dump(anchor, fh, indent=1)
    print(f"wrote {out_path}: total min {anchor['total_sec_min']}s / "
          f"median {anchor['total_sec_median']}s over {n_runs} runs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
