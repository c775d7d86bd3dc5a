"""Round-over-round bench regression detector.

Compares two bench artifacts (bench.py / staged_bench.py JSON) on the
noise-robust statistic — ``queries_min`` (min-of-N) where both sides
have it, medians otherwise — and reports per-query ratios, because the
r9 episode proved medians-of-3 on this VM cannot distinguish a 1.5×
regression from scheduler noise (SCALING.md §Round-close bench harness
fix).

Exit code 1 if any comparable query regresses beyond ``--threshold``
(default 1.5×) AND slows by more than ``--min-abs`` seconds (default
0.3 s — sub-second queries jitter in absolute terms regardless of
code), so CI-style use is one line:

    python tools/bench_compare.py bench_r9_local.json bench_r10_local.json

New/removed queries are listed but never fail the check.
"""

from __future__ import annotations

import argparse
import json
import sys


def _series(artifact: dict) -> dict[str, float]:
    qmin = artifact.get("queries_min")
    base = (
        qmin
        if qmin
        # raw tools/catalog_bench.py artifacts carry per_job_sec — lets a
        # fresh catalog run compare straight against BASELINE_CATALOG.json
        else artifact.get("queries") or artifact.get("per_job_sec") or {}
    )
    return {k: v for k, v in base.items() if isinstance(v, (int, float)) and v >= 0}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-abs", type=float, default=0.3)
    args = ap.parse_args()

    with open(args.old) as fh:
        old = json.load(fh)
    with open(args.new) as fh:
        new = json.load(fh)
    so, sn = _series(old), _series(new)
    stat = "min" if (old.get("queries_min") and new.get("queries_min")) else "median"

    common = sorted(set(so) & set(sn))
    added = sorted(set(sn) - set(so))
    removed = sorted(set(so) - set(sn))
    regressions = []
    print(f"# stat={stat}  comparable={len(common)}  "
          f"added={len(added)}  removed={len(removed)}")
    print(f"# comparable totals: old={sum(so[q] for q in common):.1f}s "
          f"new={sum(sn[q] for q in common):.1f}s")
    for q in common:
        o, n = so[q], sn[q]
        if o <= 0:
            continue
        ratio = n / o
        if ratio >= args.threshold and (n - o) >= args.min_abs:
            regressions.append((ratio, q, o, n))
    for ratio, q, o, n in sorted(regressions, reverse=True):
        print(f"REGRESSION {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    improved = sorted(
        ((sn[q] / so[q], q, so[q], sn[q]) for q in common
         if so[q] > 0 and sn[q] / so[q] <= 1 / args.threshold
         and (so[q] - sn[q]) >= args.min_abs)
    )
    for ratio, q, o, n in improved:
        print(f"improved   {q}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    if regressions:
        print(f"{len(regressions)} regression(s) beyond "
              f"{args.threshold}x/+{args.min_abs}s")
        return 1
    print("no regressions beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
